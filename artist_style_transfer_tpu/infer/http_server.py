"""HTTP front-end for the stylization serving stack (ROADMAP: serving).

The reference has no serving story at all — ``inference.py`` is an
edit-constants-and-run script (inference.py:24-52). This module puts a
network face on :class:`~artist_style_transfer_tpu.infer.serve.StylizeServer`
+ :class:`~artist_style_transfer_tpu.infer.serve.ModelRegistry`:

- ``GET  /healthz``                  liveness probe
- ``GET  /statsz``                   batcher counters (batches, images;
  plus a ``classify`` sub-object once that batcher has started)
- ``GET  /v1/models``                registered model names (JSON)
- ``POST /v1/models/<name>/reload``  force a checkpoint re-read
- ``POST /v1/stylize?model=<name>``  body = JPEG/PNG bytes; response =
  stylized image. Query knobs: ``format=jpg|png`` (default jpg),
  ``blur=<sigma>`` / ``sharpen=<amount>`` mirroring the reference's
  post-filters (inference.py:38-44, 119-125).
- ``POST /v1/classify``              body = image bytes; response = JSON
  artist prediction from the 19-class ResNet-50 (the reference's
  quantitative-eval classifier, inference.py:153-166) on the int8 MXU
  fast path (models/resnet_q.py). Input takes the eval transform
  generalized to arbitrary sizes: shorter side scaled to 256, center
  crop 256 (inference.py:56-59). Requires ``--classifier-path``.
  Concurrent requests coalesce into MXU batches through the same
  micro-batcher as stylize (every transformed input is a 256x256 crop,
  so all classify traffic shares one batch shape).

Design notes (TPU serving shape):

- stdlib ``ThreadingHTTPServer``: each connection is a thread that blocks
  on its request's ``Future`` — the *device* work is still coalesced into
  MXU-sized batches by ``StylizeServer``'s single worker, so concurrency
  scales with the batcher, not with Python threads doing math.
- image decode/encode stays on the host (cv2), exactly like the data
  pipeline; bytes move device-ward as uint8.
- model files use the reference checkpoint tree
  ``models/<artist>/<method>/transfer[2]_<cw>-<sw>_<epoch>.pth``
  (train_cnn.py:173-178): :func:`discover_models` registers the newest
  checkpoint per ``<artist>/<method>`` under that name.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from artist_style_transfer_tpu.infer.serve import ModelRegistry, StylizeServer

_CKPT_RE = re.compile(r"^transfer2?_.*_(\d+)\.(pth|npz)$")


def _cv2():
    try:
        import cv2
    except Exception as e:  # pragma: no cover - environment-dependent
        raise RuntimeError("OpenCV is required for HTTP image decode/encode") from e
    return cv2


def discover_models(models_dir: str) -> dict[str, str]:
    """Map ``<artist>/<method>`` -> newest checkpoint path under ``models_dir``.

    Mirrors the reference's model tree (train_cnn.py:173-178,
    inference.py:27-31): per ``<artist>/<method>`` directory the
    ``transfer[2]_<cw>-<sw>_<epoch>.pth`` file with the highest epoch wins
    (``.npz`` exports are accepted too).
    """
    found: dict[str, str] = {}
    if not os.path.isdir(models_dir):
        return found
    for artist in sorted(os.listdir(models_dir)):
        adir = os.path.join(models_dir, artist)
        if not os.path.isdir(adir):
            continue
        for method in sorted(os.listdir(adir)):
            mdir = os.path.join(adir, method)
            if not os.path.isdir(mdir):
                continue
            # Highest epoch wins; on a tie (the training CLI exports both
            # .pth and .npz at the final epoch) prefer the framework-native
            # .npz. Sorted scan keeps the choice deterministic.
            best: tuple[int, int, str] | None = None
            for fname in sorted(os.listdir(mdir)):
                m = _CKPT_RE.match(fname)
                if m:
                    key = (int(m.group(1)), 1 if m.group(2) == "npz" else 0)
                    if best is None or key > best[:2]:
                        best = (*key, os.path.join(mdir, fname))
            if best is not None:
                found[f"{artist}/{method}"] = best[2]
    return found


class _Handler(BaseHTTPRequestHandler):
    # set by make_http_server():
    server_ctx: dict = {}

    # quiet request logging (structured logging happens at the app level)
    def log_message(self, fmt, *args):  # noqa: D102
        pass

    # ------------------------------------------------------------------
    def _json(self, code: int, obj) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _error(self, code: int, message: str) -> None:
        self._json(code, {"error": message})

    # ------------------------------------------------------------------
    def do_GET(self):  # noqa: N802 (stdlib API)
        ctx = self.server_ctx
        path = urlparse(self.path).path
        if path == "/healthz":
            self._json(200, {"status": "ok"})
        elif path == "/statsz":
            stats = dict(ctx["server"].stats)
            # Lock-free read: the reference assignment is atomic, and taking
            # clf_state['lock'] here would block monitoring for the entire
            # classifier cold start (quantize + jit compiles run under it).
            clf_srv = ctx["clf_state"]["server"]
            if clf_srv is not None:
                stats["classify"] = dict(clf_srv.stats)
            self._json(200, stats)
        elif path == "/v1/models":
            self._json(200, {"models": ctx["registry"].names()})
        else:
            self._error(404, f"unknown path {path}")

    @staticmethod
    def _build_classify_server(ctx) -> StylizeServer:
        """Quantize the classifier and wrap it in its micro-batcher.

        Called OUTSIDE ``clf_state['lock']`` (double-checked init): the
        first compile can take minutes on a relayed backend, and holding
        the lock through it would serialize every concurrent classify
        request behind the cold start (then time them out at
        ``timeout_s``). Losing racers discard their spare batcher."""
        import jax
        import jax.numpy as jnp

        from artist_style_transfer_tpu.models.resnet_q import (
            classifier_apply_int8,
            quantize_classifier,
        )
        from artist_style_transfer_tpu.ops.image import (
            bgr_to_rgb,
            torchvision_normalize,
        )

        qp = quantize_classifier(ctx["classifier_params"])

        @jax.jit
        def probs(qp, x_bgr255):
            rgb01 = bgr_to_rgb(x_bgr255.astype(jnp.float32)) / 255.0
            logits = classifier_apply_int8(qp, torchvision_normalize(rgb01))
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        # Classification rides the same micro-batcher as stylize
        # (serve.StylizeServer with a custom apply_fn): every request is a
        # 256x256 uint8 crop after the eval transform, so ALL concurrent
        # classify traffic coalesces into single int8-MXU batches instead
        # of batch-1 dispatches per connection thread.
        return StylizeServer(
            params=qp,
            max_batch=ctx["clf_max_batch"],
            max_wait_ms=ctx["clf_max_wait_ms"],
            apply_fn=lambda p, x: np.asarray(probs(p, x)),
        )

    def _classify(self, parsed):
        """POST /v1/classify — artist prediction on the int8 classifier."""
        ctx = self.server_ctx
        if ctx.get("classifier_params") is None:
            return self._error(
                503, "no classifier configured (start with --classifier-path)"
            )
        length = int(self.headers.get("Content-Length") or 0)
        if length <= 0:
            return self._error(400, "empty request body (expected image bytes)")
        if length > ctx["max_body_bytes"]:
            return self._error(
                413, f"request body too large ({length} > {ctx['max_body_bytes']} bytes)"
            )
        data = self.rfile.read(length)
        cv2 = _cv2()
        img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            return self._error(400, "could not decode image body")

        state = ctx["clf_state"]
        srv = state["server"]
        if srv is None:
            # Single-flight cold start: exactly ONE request runs the slow
            # quantize+compile build (outside the lock — holding it would
            # serialize every request behind minutes of compile); the
            # others wait on the event. Without the single-flight guard, N
            # concurrent cold requests would run N simultaneous builds
            # against the one relayed chip.
            do_build = False
            with state["lock"]:
                if state.get("closed"):
                    return self._error(503, "server is shutting down")
                evt = state.get("building")
                if state["server"] is None and evt is None:
                    evt = state["building"] = threading.Event()
                    do_build = True
            if do_build:
                built = err = None
                try:
                    built = self._build_classify_server(ctx)  # slow; lock NOT held
                except Exception as e:  # report as 500, not a dead socket
                    err = e
                finally:
                    with state["lock"]:
                        if (
                            built is not None
                            and not state.get("closed")
                            and state["server"] is None
                        ):
                            state["server"] = built  # publish
                            built = None
                        state["building"] = None
                        closed = state.get("closed", False)
                        srv = state["server"]
                    evt.set()  # wake waiters whether we published or failed
                if built is not None:  # closing: discard the spare batcher
                    built.close(timeout=0)
                if err is not None:
                    return self._error(
                        500, f"classifier init failed: {type(err).__name__}: {err}"
                    )
                if closed or srv is None:
                    return self._error(503, "server is shutting down")
            else:
                if evt is not None and not evt.wait(timeout=ctx["timeout_s"]):
                    return self._error(503, "classifier is still initializing")
                with state["lock"]:
                    closed = state.get("closed", False)
                    srv = state["server"]
                if closed or srv is None:
                    return self._error(
                        503,
                        "server is shutting down"
                        if closed
                        else "classifier initialization failed; retry",
                    )
        # Eval transform generalized to arbitrary sizes: shorter side to
        # 256, center crop 256 (reference CenterCrop(256), inference.py:56-59).
        h, w = img.shape[:2]
        if min(h, w) != 256:
            s = 256.0 / min(h, w)
            img = cv2.resize(img, (max(256, round(w * s)), max(256, round(h * s))))
            h, w = img.shape[:2]
        y0, x0 = (h - 256) // 2, (w - 256) // 2
        crop = np.ascontiguousarray(img[y0 : y0 + 256, x0 : x0 + 256], np.uint8)
        try:
            fut = srv.submit(crop)
        except RuntimeError:
            # submit() raises RuntimeError iff the batcher is closed — a
            # request racing close_classify_server() past the gate above
            # lands here; that is a shutdown condition, not a server error.
            return self._error(503, "server is shutting down")
        try:
            p = fut.result(timeout=ctx["timeout_s"])
        except Exception as e:
            return self._error(500, f"classify failed: {type(e).__name__}: {e}")
        from artist_style_transfer_tpu.models.resnet import ARTISTS_19

        order = np.argsort(p)[::-1][:3]
        names = list(ARTISTS_19) if len(p) == len(ARTISTS_19) else [
            str(i) for i in range(len(p))
        ]
        return self._json(
            200,
            {
                "artist": names[int(order[0])],
                "index": int(order[0]),
                "top3": [[names[int(i)], float(p[i])] for i in order],
            },
        )

    def do_POST(self):  # noqa: N802 (stdlib API)
        ctx = self.server_ctx
        parsed = urlparse(self.path)
        path = parsed.path
        reload_m = re.match(r"^/v1/models/(.+)/reload$", path)
        if reload_m:
            name = reload_m.group(1)
            registry: ModelRegistry = ctx["registry"]
            if name not in registry:
                return self._error(404, f"model {name!r} is not registered")
            try:
                swapped = registry.reload(name, force=True)
            except Exception as e:
                return self._error(500, f"reload failed: {e}")
            return self._json(200, {"model": name, "reloaded": bool(swapped)})
        if path == "/v1/classify":
            return self._classify(parsed)
        if path != "/v1/stylize":
            return self._error(404, f"unknown path {path}")

        q = parse_qs(parsed.query)
        name = q.get("model", [None])[0]
        registry: ModelRegistry = ctx["registry"]
        if name is None:
            names = registry.names()
            if len(names) != 1:
                return self._error(
                    400, "model= query parameter required (multiple models registered)"
                )
            name = names[0]
        if name not in registry:
            return self._error(404, f"model {name!r} is not registered")

        # Validate every query knob BEFORE decoding/submitting — a malformed
        # request must not consume a device-batch slot.
        try:
            blur = float(q.get("blur", [0.0])[0])
            sharpen_amt = float(q.get("sharpen", [0.0])[0])
        except ValueError:
            return self._error(400, "blur/sharpen must be numeric")
        fmt = q.get("format", ["jpg"])[0].lower()
        if fmt not in ("jpg", "jpeg", "png"):
            return self._error(400, f"unsupported format {fmt!r}")

        length = int(self.headers.get("Content-Length") or 0)
        if length <= 0:
            return self._error(400, "empty request body (expected image bytes)")
        if length > ctx["max_body_bytes"]:
            return self._error(
                413, f"request body too large ({length} > {ctx['max_body_bytes']} bytes)"
            )
        data = self.rfile.read(length)
        cv2 = _cv2()
        img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            return self._error(400, "could not decode image body")

        try:
            out = ctx["server"].submit(img.astype(np.uint8), model=name).result(
                timeout=ctx["timeout_s"]
            )
        except Exception as e:
            # TimeoutError stringifies empty — always name the type. A
            # timeout usually means a cold-start XLA compile at a new image
            # shape outlived --request-timeout-s; the device batch still
            # completes and warms the cache, so a retry succeeds fast.
            return self._error(500, f"stylize failed: {type(e).__name__}: {e}")

        # Post-filters mirror the reference's BLUR/SHARPEN knobs
        # (inference.py:38-44, 119-125), applied host-side on the result.
        if blur > 0 or sharpen_amt > 0:
            from artist_style_transfer_tpu.infer.stylize import gaussian_blur, sharpen

            if blur > 0:
                out = gaussian_blur(out, sigma=blur)
            if sharpen_amt > 0:
                out = sharpen(out, sharpen_val=sharpen_amt)

        ext = ".png" if fmt == "png" else ".jpg"
        ok, buf = cv2.imencode(ext, out)
        if not ok:
            return self._error(500, "image encode failed")
        body = buf.tobytes()
        self.send_response(200)
        self.send_header(
            "Content-Type", "image/png" if fmt == "png" else "image/jpeg"
        )
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def make_http_server(
    registry: ModelRegistry,
    server: StylizeServer,
    host: str = "127.0.0.1",
    port: int = 0,
    request_timeout_s: float = 120.0,
    max_body_bytes: int = 64 << 20,
    classifier_params=None,
    classify_max_batch: int = 8,
    classify_max_wait_ms: float = 3.0,
) -> ThreadingHTTPServer:
    """Build a ``ThreadingHTTPServer`` bound to ``host:port`` (0 = ephemeral).

    The caller owns the lifecycle: ``serve_forever()`` (or a thread running
    it) and ``shutdown()``; the ``StylizeServer`` is closed separately.
    ``classifier_params`` (a :mod:`models.resnet` pytree) enables the
    ``/v1/classify`` endpoint; it is quantized to the int8 fast path and
    wrapped in its own micro-batcher (``classify_max_batch`` /
    ``classify_max_wait_ms``) on first use — close it via
    :func:`close_classify_server`.
    """
    handler = type(
        "BoundHandler",
        (_Handler,),
        {
            "server_ctx": {
                "registry": registry,
                "server": server,
                "timeout_s": request_timeout_s,
                "max_body_bytes": int(max_body_bytes),
                "classifier_params": classifier_params,
                "clf_max_batch": int(classify_max_batch),
                "clf_max_wait_ms": float(classify_max_wait_ms),
                "clf_state": {
                    "lock": threading.Lock(),
                    "server": None,
                    "building": None,  # Event while one request runs the build
                },
            }
        },
    )
    return ThreadingHTTPServer((host, port), handler)


def close_classify_server(httpd: ThreadingHTTPServer, timeout: float | None = 10.0) -> None:
    """Close the lazily-created classify micro-batcher, if it ever started.

    Also marks the state closed under the lock, so a request thread racing
    past ``httpd.shutdown()`` cannot create a fresh batcher afterwards (it
    gets a 503 instead) — no worker thread leaks."""
    state = httpd.RequestHandlerClass.server_ctx["clf_state"]
    with state["lock"]:
        state["closed"] = True
        srv = state["server"]
    if srv is not None:
        srv.close(timeout)


def main(argv=None) -> None:
    from artist_style_transfer_tpu.utils.cache import enable_compilation_cache

    parser = argparse.ArgumentParser(
        description="Multi-tenant TPU stylization HTTP server"
    )
    parser.add_argument(
        "--models-dir",
        default=None,
        help="reference-layout model tree models/<artist>/<method>/*.pth "
        "(train_cnn.py:173-178); newest epoch per method is registered",
    )
    parser.add_argument(
        "--model",
        action="append",
        default=[],
        metavar="NAME=PATH",
        help="register one checkpoint under NAME (repeatable)",
    )
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max-batch", type=int, default=8)
    parser.add_argument("--max-wait-ms", type=float, default=3.0)
    parser.add_argument(
        "--request-timeout-s",
        type=float,
        default=600.0,
        help="per-request wait on the device batch; must cover a cold-start "
        "XLA compile at a new image shape (minutes on a relayed backend)",
    )
    parser.add_argument(
        "--auto-reload",
        action="store_true",
        help="re-stat checkpoint files on every request and hot-swap on change",
    )
    parser.add_argument(
        "--quantize",
        action="store_true",
        help="serve int8-MXU quantized models (~1.4x throughput, ~64 dB PSNR "
        "vs the f32 parity path — models/transformer_q.py)",
    )
    parser.add_argument(
        "--classifier-path",
        default=None,
        help="ResNet-50 artist classifier checkpoint (models/best-2.pth) — "
        "enables POST /v1/classify on the int8 fast path",
    )
    args = parser.parse_args(argv)

    enable_compilation_cache()
    registry = ModelRegistry(auto_reload=args.auto_reload, quantize=args.quantize)
    if args.models_dir:
        for name, path in discover_models(args.models_dir).items():
            registry.register(name, path=path)
            print(f"registered {name} <- {path}")
    for spec in args.model:
        name, _, path = spec.partition("=")
        if not path:
            parser.error(f"--model expects NAME=PATH, got {spec!r}")
        registry.register(name, path=path)
        print(f"registered {name} <- {path}")
    if not registry.names():
        parser.error("no models registered (use --models-dir or --model)")

    clf_params = None
    if args.classifier_path:
        from artist_style_transfer_tpu.utils.torch_import import (
            classifier_params_from_torch,
            load_torch_state_dict,
        )

        clf_params = classifier_params_from_torch(
            load_torch_state_dict(args.classifier_path)
        )
        print(f"classifier loaded <- {args.classifier_path}")

    server = StylizeServer(
        registry=registry, max_batch=args.max_batch, max_wait_ms=args.max_wait_ms
    )
    httpd = make_http_server(
        registry,
        server,
        host=args.host,
        port=args.port,
        request_timeout_s=args.request_timeout_s,
        classifier_params=clf_params,
    )
    print(f"serving {len(registry.names())} model(s) on {args.host}:{httpd.server_port}")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        server.close()
        close_classify_server(httpd)


if __name__ == "__main__":
    main()
