"""HTTP serving front-end: stylize/models/reload endpoints over a live socket.

The reference has no serving component (inference.py is a run-once
script); these tests cover the framework's own serving stack end to end:
ThreadingHTTPServer -> StylizeServer micro-batcher -> jitted stylize.
"""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")

from artist_style_transfer_tpu.infer.http_server import discover_models, make_http_server
from artist_style_transfer_tpu.infer.serve import ModelRegistry, StylizeServer
from artist_style_transfer_tpu.infer.stylize import stylize
from artist_style_transfer_tpu.models.transformer import init_transformer_params


@pytest.fixture(scope="module")
def served():
    """(base_url, params_a, params_b) for a live two-model server."""
    p_a = init_transformer_params(jax.random.key(0))
    p_b = init_transformer_params(jax.random.key(1))
    registry = ModelRegistry()
    registry.register("renoir/random", params=p_a)
    registry.register("monet/cycle", params=p_b)
    server = StylizeServer(registry=registry, max_batch=4, max_wait_ms=5.0)
    httpd = make_http_server(registry, server, host="127.0.0.1", port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{httpd.server_port}", p_a, p_b
    finally:
        httpd.shutdown()
        server.close()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, r.read()


def _post(url, data=b"", headers=None):
    req = urllib.request.Request(url, data=data, headers=headers or {}, method="POST")
    with urllib.request.urlopen(req, timeout=240) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_healthz_statsz_models(served):
    base, _, _ = served
    status, body = _get(base + "/healthz")
    assert status == 200 and json.loads(body) == {"status": "ok"}
    status, body = _get(base + "/statsz")
    assert status == 200 and set(json.loads(body)) == {"batches", "images"}
    status, body = _get(base + "/v1/models")
    assert status == 200
    assert json.loads(body)["models"] == ["monet/cycle", "renoir/random"]


def test_stylize_roundtrip_matches_direct(served):
    base, p_a, _ = served
    rng = np.random.default_rng(0)
    img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    ok, png = cv2.imencode(".png", img)
    assert ok
    status, ctype, body = _post(
        base + "/v1/stylize?model=renoir/random&format=png", data=png.tobytes()
    )
    assert status == 200 and ctype == "image/png"
    got = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
    want = np.asarray(stylize(p_a, jnp.asarray(img[None])))[0]
    # PNG is lossless both ways -> exact equality with the direct jitted path
    np.testing.assert_array_equal(got, want)


def test_stylize_routes_by_model(served):
    base, p_a, p_b = served
    rng = np.random.default_rng(1)
    img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    png = cv2.imencode(".png", img)[1].tobytes()
    _, _, body_b = _post(base + "/v1/stylize?model=monet/cycle&format=png", data=png)
    got_b = cv2.imdecode(np.frombuffer(body_b, np.uint8), cv2.IMREAD_COLOR)
    want_b = np.asarray(stylize(p_b, jnp.asarray(img[None])))[0]
    np.testing.assert_array_equal(got_b, want_b)


def test_stylize_jpeg_default_format(served):
    base, _, _ = served
    img = np.full((16, 16, 3), 128, np.uint8)
    png = cv2.imencode(".png", img)[1].tobytes()
    status, ctype, body = _post(base + "/v1/stylize?model=renoir/random", data=png)
    assert status == 200 and ctype == "image/jpeg"
    assert cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR).shape == img.shape


def test_stylize_post_filters(served):
    base, p_a, _ = served
    rng = np.random.default_rng(2)
    img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
    png = cv2.imencode(".png", img)[1].tobytes()
    status, _, body = _post(
        base + "/v1/stylize?model=renoir/random&format=png&blur=1.0&sharpen=50",
        data=png,
    )
    assert status == 200
    from artist_style_transfer_tpu.infer.stylize import gaussian_blur, sharpen

    got = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
    want = np.asarray(stylize(p_a, jnp.asarray(img[None])))[0]
    want = sharpen(gaussian_blur(want, sigma=1.0), sharpen_val=50.0)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_classify_endpoint():
    """POST /v1/classify: int8 ResNet-50 artist prediction. A decisive
    classifier (boosted fc2 bias) must return the boosted class; without
    --classifier-path the endpoint reports 503."""
    from artist_style_transfer_tpu.models.resnet import ARTISTS_19, init_classifier_params

    p_a = init_transformer_params(jax.random.key(0))
    clf = init_classifier_params(jax.random.key(3))
    clf["head"]["fc2"]["b"] = clf["head"]["fc2"]["b"].at[5].add(100.0)
    registry = ModelRegistry()
    registry.register("renoir/random", params=p_a)
    server = StylizeServer(registry=registry, max_batch=2, max_wait_ms=2.0)
    httpd = make_http_server(
        registry, server, host="127.0.0.1", port=0, classifier_params=clf
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_port}"
    try:
        rng = np.random.default_rng(0)
        img = (rng.random((300, 280, 3)) * 255).astype(np.uint8)
        body = cv2.imencode(".png", img)[1].tobytes()
        status, ctype, resp = _post(base + "/v1/classify", data=body)
        assert status == 200 and "json" in ctype
        out = json.loads(resp)
        assert out["index"] == 5 and out["artist"] == ARTISTS_19[5]
        assert len(out["top3"]) == 3 and out["top3"][0][0] == ARTISTS_19[5]
        # small input upscales to the 256 crop
        small = cv2.imencode(".png", img[:64, :64])[1].tobytes()
        status2, _, resp2 = _post(base + "/v1/classify", data=small)
        assert status2 == 200 and json.loads(resp2)["index"] == 5
        # malformed body
        try:
            status3, _, _ = _post(base + "/v1/classify", data=b"not an image")
        except urllib.error.HTTPError as e:
            status3 = e.code
        assert status3 == 400

        # Concurrent classify requests ride the classify micro-batcher
        # (deterministic coalescing itself is proven at the serve level,
        # test_serve.py::test_custom_apply_fn_coalesces): all succeed and
        # the batcher accounted for every image.
        n = 4
        results = [None] * n

        def fire(i):
            results[i] = _post(base + "/v1/classify", data=body)

        threads = [threading.Thread(target=fire, args=(i,)) for i in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(r[0] == 200 and json.loads(r[2])["index"] == 5 for r in results)
        clf_server = httpd.RequestHandlerClass.server_ctx["clf_state"]["server"]
        assert clf_server.stats["images"] == 2 + n  # 2 warm-up singles + n
        # the classify batcher's counters surface on /statsz once started
        _, stats_body = _get(base + "/statsz")
        assert json.loads(stats_body)["classify"]["images"] == 2 + n
    finally:
        httpd.shutdown()
        server.close()
        from artist_style_transfer_tpu.infer.http_server import close_classify_server

        close_classify_server(httpd)


def _fake_probs(p, x):
    out = np.zeros((x.shape[0], 19), np.float32)
    out[:, 5] = 1.0
    return out


@pytest.fixture
def classify_httpd(monkeypatch):
    """A live server whose classify build is replaced by a monkeypatched
    fake (optionally slowed via the returned dict) — isolates the
    cold-start locking behavior from the real quantize+compile cost."""
    from artist_style_transfer_tpu.infer import http_server as hs

    cfg = {"delay_s": 0.0, "builds": 0}

    def fake_build(ctx):
        import time

        if cfg["delay_s"]:
            time.sleep(cfg["delay_s"])
        cfg["builds"] += 1
        return StylizeServer(
            params={"fake": True}, max_batch=4, max_wait_ms=2.0, apply_fn=_fake_probs
        )

    monkeypatch.setattr(hs._Handler, "_build_classify_server", staticmethod(fake_build))
    registry = ModelRegistry()
    registry.register("a", params=init_transformer_params(jax.random.key(0)))
    server = StylizeServer(registry=registry, max_batch=2, max_wait_ms=2.0)
    httpd = make_http_server(
        registry, server, host="127.0.0.1", port=0, classifier_params={"dummy": True}
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{httpd.server_port}", httpd, cfg
    finally:
        httpd.shutdown()
        server.close()
        from artist_style_transfer_tpu.infer.http_server import close_classify_server

        close_classify_server(httpd)


def test_classify_cold_start_not_serialized(classify_httpd):
    """Concurrent FIRST classify requests must neither serialize behind the
    cold-start build (the real quantize+compile takes minutes on a relayed
    backend) nor each run their own build: the build is SINGLE-FLIGHT
    (one request builds outside clf_state['lock']; the others wait on the
    event and use the published batcher)."""
    import time

    base, httpd, cfg = classify_httpd
    DELAY = cfg["delay_s"] = 1.0
    body = cv2.imencode(".png", np.zeros((256, 256, 3), np.uint8))[1].tobytes()
    n = 3
    results = [None] * n

    def fire(i):
        results[i] = _post(base + "/v1/classify", data=body)

    t0 = time.monotonic()
    threads = [threading.Thread(target=fire, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.monotonic() - t0
    assert all(r[0] == 200 for r in results)
    assert all(json.loads(r[2])["index"] == 5 for r in results)
    # Structural: exactly ONE build ran (single-flight — no duplicate
    # device work), and nothing serialized behind it (n sequential builds
    # would take >= n*DELAY).
    state = httpd.RequestHandlerClass.server_ctx["clf_state"]
    assert state["server"] is not None and cfg["builds"] == 1
    assert elapsed < 2 * DELAY, f"cold starts serialized: {elapsed:.2f}s"


def test_classify_closed_batcher_maps_503(classify_httpd):
    """A request racing close_classify_server() past the closed-gate calls
    submit() on a closed batcher — that must surface as 503 (shutdown),
    not a 500 'RuntimeError: server is closed' (round-4 advisor)."""
    base, httpd, _ = classify_httpd
    body = cv2.imencode(".png", np.zeros((256, 256, 3), np.uint8))[1].tobytes()
    status, _, _ = _post(base + "/v1/classify", data=body)
    assert status == 200
    # Simulate the race window: the batcher closes but 'closed' is not yet
    # observed by the request thread's gate.
    httpd.RequestHandlerClass.server_ctx["clf_state"]["server"].close()
    try:
        status2, _, _ = _post(base + "/v1/classify", data=body)
    except urllib.error.HTTPError as e:
        status2 = e.code
    assert status2 == 503


def test_classify_unconfigured_503(served):
    base, _, _ = served
    body = cv2.imencode(".png", np.zeros((256, 256, 3), np.uint8))[1].tobytes()
    try:
        status, _, _ = _post(base + "/v1/classify", data=body)
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 503


def test_errors(served):
    base, _, _ = served
    img_png = cv2.imencode(".png", np.zeros((8, 8, 3), np.uint8))[1].tobytes()
    cases = [
        ("POST", "/v1/stylize?model=missing/model", img_png, 404),
        ("POST", "/v1/stylize", img_png, 400),  # two models -> model= required
        ("POST", "/v1/stylize?model=renoir/random", b"", 400),  # empty body
        ("POST", "/v1/stylize?model=renoir/random", b"not an image", 400),
        ("POST", "/v1/stylize?model=renoir/random&format=gif", img_png, 400),
        ("POST", "/v1/stylize?model=renoir/random&blur=nan3x", img_png, 400),
        ("POST", "/v1/models/missing/reload", b"", 404),
        ("GET", "/nope", None, 404),
    ]
    for method, path, data, want in cases:
        try:
            if method == "GET":
                status, _ = _get(base + path)
            else:
                status, _, _ = _post(base + path, data=data)
        except urllib.error.HTTPError as e:
            status = e.code
        assert status == want, (path, status)


def test_oversized_body_rejected_before_read(served):
    """Content-Length above the cap -> 413 without reading the body."""
    import http.client

    base, _, _ = served
    host = base.split("//")[1]
    conn = http.client.HTTPConnection(host, timeout=60)
    try:
        conn.putrequest("POST", "/v1/stylize?model=renoir/random")
        conn.putheader("Content-Length", str(65 << 20))  # claims 65 MiB
        conn.endheaders()
        conn.send(b"tiny")  # never sends the rest
        resp = conn.getresponse()
        assert resp.status == 413
    finally:
        conn.close()


def test_reload_endpoint_and_hot_swap(tmp_path):
    from artist_style_transfer_tpu.train.checkpoint import save_params_npz

    p1 = init_transformer_params(jax.random.key(5))
    p2 = init_transformer_params(jax.random.key(6))
    path = str(tmp_path / "m.npz")
    save_params_npz(path, p1)

    registry = ModelRegistry()
    registry.register("a", path=path)
    server = StylizeServer(registry=registry, max_batch=2, max_wait_ms=2.0)
    httpd = make_http_server(registry, server, host="127.0.0.1", port=0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_port}"
    try:
        img = np.full((8, 8, 3), 64, np.uint8)
        png = cv2.imencode(".png", img)[1].tobytes()
        # single registered model -> model= may be omitted
        _, _, body1 = _post(base + "/v1/stylize?format=png", data=png)
        got1 = cv2.imdecode(np.frombuffer(body1, np.uint8), cv2.IMREAD_COLOR)
        np.testing.assert_array_equal(
            got1, np.asarray(stylize(p1, jnp.asarray(img[None])))[0]
        )

        save_params_npz(path, p2)
        status, _, body = _post(base + "/v1/models/a/reload")
        assert status == 200 and json.loads(body)["reloaded"] is True

        _, _, body2 = _post(base + "/v1/stylize?format=png", data=png)
        got2 = cv2.imdecode(np.frombuffer(body2, np.uint8), cv2.IMREAD_COLOR)
        np.testing.assert_array_equal(
            got2, np.asarray(stylize(p2, jnp.asarray(img[None])))[0]
        )
    finally:
        httpd.shutdown()
        server.close()


def test_discover_models(tmp_path):
    """Reference model-tree discovery (train_cnn.py:173-178 naming)."""
    d = tmp_path / "models"
    (d / "Renoir" / "random").mkdir(parents=True)
    (d / "Renoir" / "cycle").mkdir(parents=True)
    (d / "Monet").mkdir()  # artist dir without method subdirs -> ignored
    (d / "Renoir" / "random" / "transfer_17-25_10.pth").write_bytes(b"")
    (d / "Renoir" / "random" / "transfer_17-25_200.pth").write_bytes(b"")
    (d / "Renoir" / "random" / "transfer2_17-25_50.pth").write_bytes(b"")
    (d / "Renoir" / "random" / "style.jpg").write_bytes(b"")
    (d / "Renoir" / "cycle" / "transfer_17-25_30.npz").write_bytes(b"")
    # same-epoch tie (training CLI exports both): native .npz preferred
    (d / "Renoir" / "cycle" / "transfer_17-25_30.pth").write_bytes(b"")
    got = discover_models(str(d))
    assert got == {
        "Renoir/random": str(d / "Renoir" / "random" / "transfer_17-25_200.pth"),
        "Renoir/cycle": str(d / "Renoir" / "cycle" / "transfer_17-25_30.npz"),
    }
    assert discover_models(str(tmp_path / "missing")) == {}
