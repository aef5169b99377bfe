"""Int8-quantized inference path (models/transformer_q.py).

Quality is asserted against the committed oracle-trained golden net on a
real image: the int8 path must clear the BASELINE parity bar (>35 dB vs
the f64-torch golden output) by a wide margin, and stay close to the f32
'highest' parity forward. The reference has no quantized path — this is
the framework's serving fast path (2x MXU macs/cycle, half the activation
HBM bytes; see the module docstring for why IN makes it benign).
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from artist_style_transfer_tpu.models.transformer_q import (  # noqa: E402
    calibrate_transformer,
    quantize_transformer,
    transformer_apply_int8,
)
from artist_style_transfer_tpu.ops.precision import precision  # noqa: E402

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def psnr(a, b) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    return float(10.0 * np.log10(255.0**2 / mse)) if mse > 0 else np.inf


@pytest.fixture(scope="module")
def golden_setup():
    from artist_style_transfer_tpu.infer.stylize import load_transfer_params

    content = cv2.imread(os.path.join(GOLDENS, "content_landscape_256.png"))
    assert content is not None
    params = load_transfer_params(os.path.join(GOLDENS, "golden_transfer.pth"))
    x = jnp.asarray(content[None].astype(np.float32))
    # deterministic random calibration content — deliberately NOT the test
    # image, to prove static scales generalize (IN re-centers every layer)
    calib = jnp.asarray(
        np.random.default_rng(7).random((2, 128, 128, 3)) * 255, jnp.float32
    )
    with precision("highest"):
        ref = np.clip(
            np.asarray(jax.jit(_parity_forward)(params, x))[0], 0, 255
        ).astype(np.uint8)
    qp = quantize_transformer(params, calib)
    return params, qp, x, ref, content


def _parity_forward(params, x):
    from artist_style_transfer_tpu.models.transformer import transformer_apply

    return transformer_apply(params, x)


def test_int8_psnr_vs_parity_forward(golden_setup):
    _, qp, x, ref, _ = golden_setup
    out = np.clip(
        np.asarray(jax.jit(transformer_apply_int8)(qp, x)).astype(np.float32)[0],
        0,
        255,
    ).astype(np.uint8)
    p = psnr(out, ref)
    assert p > 45.0, f"int8 vs f32 parity: {p:.2f} dB"


def test_int8_bf16_accum_close_to_int32(golden_setup):
    _, qp, x, ref, _ = golden_setup
    out = np.clip(
        np.asarray(
            jax.jit(lambda q, x: transformer_apply_int8(q, x, accum=jnp.bfloat16))(
                qp, x
            )
        ).astype(np.float32)[0],
        0,
        255,
    ).astype(np.uint8)
    p = psnr(out, ref)
    # bf16 conv-accumulator materialization costs ~0.1 dB (measured)
    assert p > 45.0, f"int8/bf16-accum vs f32 parity: {p:.2f} dB"


def test_int8_clears_golden_parity_bar(golden_setup):
    """The quantized path itself passes the BASELINE >35 dB bar vs the
    committed f64-torch golden output (tests/goldens/golden_stylized.png)."""
    _, qp, x, _, _ = golden_setup
    golden = cv2.imread(os.path.join(GOLDENS, "golden_stylized.png"))
    out = np.clip(
        np.asarray(jax.jit(transformer_apply_int8)(qp, x)).astype(np.float32)[0],
        0,
        255,
    ).astype(np.uint8)
    p = psnr(out, golden)
    assert p > 35.0, f"int8 vs f64 golden: {p:.2f} dB"


def test_quantize_accepts_scales_or_images(golden_setup):
    params, qp, _, _, _ = golden_setup
    calib = jnp.asarray(
        np.random.default_rng(7).random((2, 128, 128, 3)) * 255, jnp.float32
    )
    scales = calibrate_transformer(params, calib)
    qp2 = quantize_transformer(params, scales)
    for a, b in zip(jax.tree.leaves(qp), jax.tree.leaves(qp2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_quantized_pytree_dtypes(golden_setup):
    _, qp, _, _, _ = golden_setup
    # interior convs: int8 weights, f32 affine + scale; endpoints bf16
    for blk in qp["encoder"] + qp["decoder"]:
        assert blk["wq"].dtype == jnp.int8
        assert blk["sin"].dtype == jnp.float32
    for r in qp["residual"]:
        assert r["conv1"]["wq"].dtype == jnp.int8
        assert r["conv2"]["wq"].dtype == jnp.int8
    assert qp["stem"]["w"].dtype == jnp.bfloat16
    assert qp["output"]["w"].dtype == jnp.bfloat16


def test_output_shape_and_dtype(golden_setup):
    _, qp, _, _, _ = golden_setup
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 96, 3)) * 255, jnp.float32)
    out = jax.jit(transformer_apply_int8)(qp, x)
    assert out.shape == (2, 64, 96, 3)
    assert out.dtype == jnp.bfloat16
