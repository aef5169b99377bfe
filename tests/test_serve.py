"""StylizeServer: micro-batching serving path (ROADMAP 6; no reference analog)."""

import threading

import numpy as np
import pytest

import jax

from artist_style_transfer_tpu.infer.serve import StylizeServer
from artist_style_transfer_tpu.infer.stylize import stylize
from artist_style_transfer_tpu.models.transformer import init_transformer_params

import jax.numpy as jnp


@pytest.fixture(scope="module")
def params():
    return init_transformer_params(jax.random.key(0))


def _img(rng, h, w):
    return (rng.random((h, w, 3)) * 255).astype(np.uint8)


def test_server_matches_direct_stylize(params):
    rng = np.random.default_rng(0)
    imgs = [_img(rng, 32, 32) for _ in range(5)]
    srv = StylizeServer(params, max_batch=4, max_wait_ms=20.0)
    try:
        futs = [srv.submit(im) for im in imgs]
        outs = [f.result(timeout=120) for f in futs]
    finally:
        srv.close()
    direct = np.asarray(stylize(params, jnp.asarray(np.stack(imgs))))
    for got, want in zip(outs, direct):
        assert got.dtype == np.uint8
        np.testing.assert_array_equal(got, want)


def test_server_batches_concurrent_requests(params):
    rng = np.random.default_rng(1)
    srv = StylizeServer(params, max_batch=8, max_wait_ms=250.0)
    try:
        # warm the compile so the batcher window isn't spent compiling
        srv.submit(_img(rng, 16, 16)).result(timeout=120)
        n0 = srv.stats["batches"]
        futs = [srv.submit(_img(rng, 16, 16)) for _ in range(8)]
        for f in futs:
            f.result(timeout=120)
        # 8 same-shape requests queued together must coalesce into one batch
        assert srv.stats["batches"] == n0 + 1
    finally:
        srv.close()


def test_custom_apply_fn_coalesces():
    """``apply_fn`` overrides the model call (what the HTTP /v1/classify
    endpoint rides): outputs route per-image, and same-shape traffic
    coalesces into shared batches exactly like the stylize path."""
    calls = []

    def apply_fn(p, images):
        x = np.asarray(images, np.float32)
        calls.append(x.shape[0])
        return x.sum(axis=(1, 2, 3))  # per-image scalar "prediction"

    srv = StylizeServer(
        params=object(), max_batch=8, max_wait_ms=250.0, apply_fn=apply_fn
    )
    try:
        rng = np.random.default_rng(7)
        imgs = [_img(rng, 16, 16) for _ in range(9)]
        first = srv.submit(imgs[0]).result(timeout=60)
        np.testing.assert_allclose(first, imgs[0].astype(np.float32).sum(), rtol=1e-6)
        futs = [srv.submit(im) for im in imgs[1:]]
        for im, f in zip(imgs[1:], futs):
            np.testing.assert_allclose(
                f.result(timeout=60), im.astype(np.float32).sum(), rtol=1e-6
            )
        assert calls[0] == 1 and sum(calls) == 9
        # the 8 requests queued inside the batching window coalesced
        assert len(calls) == 2
    finally:
        srv.close()


def test_server_mixed_shapes(params):
    rng = np.random.default_rng(2)
    srv = StylizeServer(params, max_batch=4, max_wait_ms=10.0)
    try:
        a = [srv.submit(_img(rng, 16, 16)) for _ in range(3)]
        b = [srv.submit(_img(rng, 24, 16)) for _ in range(3)]
        outs_a = [f.result(timeout=240) for f in a]
        outs_b = [f.result(timeout=240) for f in b]
    finally:
        srv.close()
    assert all(o.shape == (16, 16, 3) for o in outs_a)
    assert all(o.shape == (24, 16, 3) for o in outs_b)


def test_server_submit_after_close_raises(params):
    srv = StylizeServer(params)
    srv.close()
    with pytest.raises(RuntimeError):
        srv.submit(np.zeros((16, 16, 3), np.uint8))


def test_server_rejects_bad_shape(params):
    srv = StylizeServer(params)
    try:
        with pytest.raises(ValueError):
            srv.submit(np.zeros((16, 16), np.uint8))
    finally:
        srv.close()


def test_server_threaded_submitters(params):
    rng = np.random.default_rng(3)
    srv = StylizeServer(params, max_batch=4, max_wait_ms=5.0)
    results = []
    lock = threading.Lock()

    def client(seed):
        r = np.random.default_rng(seed)
        f = srv.submit(_img(r, 16, 16))
        out = f.result(timeout=240)
        with lock:
            results.append(out)

    try:
        threads = [threading.Thread(target=client, args=(s,)) for s in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        srv.close()
    assert len(results) == 6
    assert all(o.shape == (16, 16, 3) for o in results)


# --- Multi-tenant registry (ROADMAP 7) -----------------------------------


def test_registry_register_get_reload(tmp_path, params):
    from artist_style_transfer_tpu.infer.serve import ModelRegistry
    from artist_style_transfer_tpu.train.checkpoint import save_params_npz

    reg = ModelRegistry()
    reg.register("a", params=params)
    assert "a" in reg and reg.names() == ["a"]
    assert reg.get("a") is params

    # file-backed registration + mtime hot-reload
    p1 = init_transformer_params(jax.random.key(1))
    path = str(tmp_path / "m.npz")
    save_params_npz(path, p1)
    reg.register("b", path=path)
    w0 = np.asarray(reg.get("b")["encoder"][0]["w"])
    np.testing.assert_array_equal(w0, np.asarray(p1["encoder"][0]["w"]))

    assert reg.reload("b") is False  # unchanged file -> no swap
    p2 = init_transformer_params(jax.random.key(2))
    save_params_npz(path, p2)
    import os

    os.utime(path, (os.stat(path).st_atime, os.stat(path).st_mtime + 2))
    assert reg.reload("b") is True
    np.testing.assert_array_equal(
        np.asarray(reg.get("b")["encoder"][0]["w"]),
        np.asarray(p2["encoder"][0]["w"]),
    )

    reg.unregister("b")
    with pytest.raises(KeyError):
        reg.get("b")


def test_registry_pth_roundtrip(tmp_path, params):
    """Registry reads the reference .pth checkpoint layout (train_cnn.py:383-390)."""
    from artist_style_transfer_tpu.infer.serve import ModelRegistry
    from artist_style_transfer_tpu.train.checkpoint import export_pth

    path = str(tmp_path / "transfer_17-25_2.pth")
    export_pth(path, params)
    reg = ModelRegistry()
    reg.register("renoir/random", path=path)
    got = reg.get("renoir/random")
    np.testing.assert_allclose(
        np.asarray(got["encoder"][0]["w"]),
        np.asarray(params["encoder"][0]["w"]),
        rtol=1e-6,
    )


def test_multitenant_server_routes_and_hot_reloads(tmp_path, params):
    from artist_style_transfer_tpu.infer.serve import ModelRegistry
    from artist_style_transfer_tpu.train.checkpoint import save_params_npz

    rng = np.random.default_rng(3)
    img = _img(rng, 16, 16)
    p_b = init_transformer_params(jax.random.key(7))
    path = str(tmp_path / "b.npz")
    save_params_npz(path, p_b)

    reg = ModelRegistry(auto_reload=True)
    reg.register("a", params=params)
    reg.register("b", path=path)
    srv = StylizeServer(registry=reg, max_batch=4, max_wait_ms=10.0)
    try:
        out_a = srv.submit(img, model="a").result(timeout=240)
        out_b = srv.submit(img, model="b").result(timeout=240)
        np.testing.assert_array_equal(
            out_a, np.asarray(stylize(params, jnp.asarray(img[None])))[0]
        )
        np.testing.assert_array_equal(
            out_b, np.asarray(stylize(p_b, jnp.asarray(img[None])))[0]
        )

        # hot-swap model b's weights on disk; auto_reload picks them up
        p_b2 = init_transformer_params(jax.random.key(8))
        save_params_npz(path, p_b2)
        import os

        os.utime(path, (os.stat(path).st_atime, os.stat(path).st_mtime + 2))
        out_b2 = srv.submit(img, model="b").result(timeout=240)
        np.testing.assert_array_equal(
            out_b2, np.asarray(stylize(p_b2, jnp.asarray(img[None])))[0]
        )

        with pytest.raises(KeyError):
            srv.submit(img, model="missing")
        with pytest.raises(ValueError):
            srv.submit(img)  # model= required in multi-tenant mode
    finally:
        srv.close()


def test_cancelled_future_does_not_kill_worker(params):
    """A caller cancelling its queued future must not wedge the batcher."""
    rng = np.random.default_rng(9)
    srv = StylizeServer(params, max_batch=4, max_wait_ms=50.0)
    try:
        # warm the compile so cancellation timing is deterministic
        srv.submit(_img(rng, 16, 16)).result(timeout=240)
        fut = srv.submit(_img(rng, 16, 16))
        assert fut.cancel()  # still queued -> cancellable
        # the worker must survive resolving that batch and keep serving
        out = srv.submit(_img(rng, 16, 16)).result(timeout=240)
        assert out.shape == (16, 16, 3)
        assert fut.cancelled()
    finally:
        srv.close()


def test_registry_reload_keeps_weights_on_transient_error(tmp_path):
    """A half-written/missing checkpoint must not take down live serving."""
    import os

    from artist_style_transfer_tpu.infer.serve import ModelRegistry
    from artist_style_transfer_tpu.train.checkpoint import save_params_npz

    p1 = init_transformer_params(jax.random.key(11))
    path = str(tmp_path / "m.npz")
    save_params_npz(path, p1)
    reg = ModelRegistry(auto_reload=True)
    reg.register("a", path=path)

    os.remove(path)  # simulate the gap in a non-atomic rewrite
    got = reg.get("a")  # auto-reload path must swallow the stat failure
    np.testing.assert_array_equal(
        np.asarray(got["encoder"][0]["w"]), np.asarray(p1["encoder"][0]["w"])
    )
    with open(path, "wb") as f:
        f.write(b"not a real npz")  # half-written file
    assert reg.reload("a", force=True) is False
    np.testing.assert_array_equal(
        np.asarray(reg.get("a")["encoder"][0]["w"]),
        np.asarray(p1["encoder"][0]["w"]),
    )

    # a valid rewrite is picked up again afterwards
    p2 = init_transformer_params(jax.random.key(12))
    save_params_npz(path, p2)
    assert reg.reload("a", force=True) is True
    np.testing.assert_array_equal(
        np.asarray(reg.get("a")["encoder"][0]["w"]),
        np.asarray(p2["encoder"][0]["w"]),
    )


def test_server_ctor_validation(params):
    from artist_style_transfer_tpu.infer.serve import ModelRegistry

    with pytest.raises(ValueError):
        StylizeServer()  # neither params nor registry
    with pytest.raises(ValueError):
        StylizeServer(params, registry=ModelRegistry())  # both
    srv = StylizeServer(params)
    try:
        with pytest.raises(ValueError):
            srv.submit(np.zeros((8, 8, 3), np.uint8), model="a")
    finally:
        srv.close()


def test_quantized_registry_serving(params):
    """quantize=True registries serve through the int8 path (stylize_int8)."""
    from artist_style_transfer_tpu.infer.serve import ModelRegistry, _is_quantized
    from artist_style_transfer_tpu.infer.stylize import stylize_int8

    reg = ModelRegistry(quantize=True)
    reg.register("a", params=params)
    qp = reg.get("a")
    assert _is_quantized(qp) and not _is_quantized(params)

    rng = np.random.default_rng(3)
    imgs = [_img(rng, 32, 32) for _ in range(3)]
    srv = StylizeServer(registry=reg, max_batch=4, max_wait_ms=20.0)
    try:
        outs = [srv.submit(im, model="a").result(timeout=120) for im in imgs]
    finally:
        srv.close()
    direct = np.asarray(stylize_int8(qp, jnp.asarray(np.stack(imgs))))
    for got, want in zip(outs, direct):
        assert got.dtype == np.uint8
        np.testing.assert_array_equal(got, want)


def test_quantized_single_tenant_server(params):
    """Pre-quantized params work directly in a single-tenant server."""
    from artist_style_transfer_tpu.models.transformer_q import quantize_transformer

    calib = jnp.asarray(
        np.random.default_rng(1).random((2, 64, 64, 3)) * 255, jnp.float32
    )
    qp = quantize_transformer(params, calib)
    rng = np.random.default_rng(4)
    im = _img(rng, 32, 32)
    srv = StylizeServer(qp, max_batch=2, max_wait_ms=5.0)
    try:
        out = srv.submit(im).result(timeout=120)
    finally:
        srv.close()
    assert out.shape == im.shape and out.dtype == np.uint8
