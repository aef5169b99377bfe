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
