"""Multi-chip data parallelism tests on the 8-device virtual CPU mesh.

The key property (SURVEY §4): the sharded train step is *semantically
identical* to the single-device one — same permutation, same batches, same
loss trajectory — with XLA inserting the gradient all-reduce.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from artist_style_transfer_tpu.models import init_transformer_params
from artist_style_transfer_tpu.models.vgg import init_vgg16_params
from artist_style_transfer_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
)
from artist_style_transfer_tpu.train.loop import (
    epoch_permutation,
    make_optimizer,
    make_step_fns,
    precompute_content_relu2_2,
)
from artist_style_transfer_tpu.train.styles import build_style_targets

H = W = 32
N = 16
B = 8


def _setup():
    rng = np.random.default_rng(0)
    content = jnp.asarray((rng.random((N, H, W, 3)) * 255).astype(np.float32))
    paintings = (rng.random((2, H, W, 3)) * 255).astype(np.float32)
    params = init_transformer_params(jax.random.key(0))
    vgg_params = init_vgg16_params(jax.random.key(1))
    targets = build_style_targets("cycle", vgg_params, "X", paintings=paintings, batch_size=B)
    return content, params, vgg_params, targets


def _run_epochs(mesh, content, params, vgg_params, targets, n_epochs=2):
    # epoch_fn donates params/opt_state buffers — work on copies
    params = jax.tree.map(jnp.copy, params)
    tx = make_optimizer(1e-3, 1e-4, 4, 2, N // B)
    fns = make_step_fns(
        "cycle", vgg_params, None, targets,
        content_weight=17.0, style_weight=25.0, batch_size=B, num_content=N,
        tx=tx, mesh=mesh, use_pallas=False,
    )
    if mesh is not None:
        content = jax.device_put(content, batch_sharding(mesh))
        params = jax.device_put(params, replicated_sharding(mesh))
    opt_state = tx.init(params)
    r22 = precompute_content_relu2_2(vgg_params, content)
    all_losses = []
    for epoch in range(n_epochs):
        perm = epoch_permutation(0, epoch, N)
        params, opt_state, losses = fns.epoch_fn(
            params, opt_state, content, r22, targets.grams, None,
            perm, jnp.int32(epoch * (N // B)),
        )
        all_losses.append(np.asarray(losses))
    return params, np.stack(all_losses)


def test_dp_masks_match_single_device():
    assert jax.device_count() >= 8, "conftest should provide 8 virtual devices"


@pytest.mark.slow
def test_dp_trajectory_matches_single_device():
    content, params, vgg_params, targets = _setup()

    p1, l1 = _run_epochs(None, content, params, vgg_params, targets)
    mesh = make_mesh(shape=(8,))
    p8, l8 = _run_epochs(mesh, content, params, vgg_params, targets)

    np.testing.assert_allclose(l8, l1, rtol=1e-4)
    # Params: Adam normalizes near-zero grads, so reduction-order noise can
    # flip individual update directions (each update is +-lr); bound the
    # aggregate drift (RMS) and the worst case by a few update magnitudes
    # rather than demanding bitwise equality.
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
        assert np.sqrt(np.mean(d * d)) < 1e-3, "RMS param drift too large"
        assert np.abs(d).max() < 4e-3 * 4, "max param drift exceeds update scale"


def test_dp_batch_is_actually_sharded():
    """The compiled DP step's batch intermediates carry the 'data' sharding."""
    mesh = make_mesh(shape=(8,))
    x = jnp.zeros((8, 4, 4, 3))
    y = jax.device_put(x, batch_sharding(mesh))
    assert len(y.sharding.device_set) == 8


def test_mesh_shapes():
    m = make_mesh(shape=(4,))
    assert m.devices.shape == (4,)
    m2 = make_mesh(shape=(4, 2), axis_names=("data", "model"))
    assert m2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(shape=(64,))


def test_stylize_spatial_matches_single_device():
    """H-sharded single-image stylization (infer.stylize.stylize_spatial):
    GSPMD halo exchanges + IN-stat all-reduces must reproduce the
    single-device result up to reduction-order noise."""
    from artist_style_transfer_tpu.infer.stylize import stylize, stylize_spatial

    params = init_transformer_params(jax.random.key(0))
    rng = np.random.default_rng(5)
    img = (rng.random((64, 48, 3)) * 255).astype(np.float32)
    mesh = make_mesh(shape=(4,))

    out_sp = np.asarray(stylize_spatial(params, img, mesh, clip=False))
    ref = np.asarray(stylize(params, jnp.asarray(img)[None], clip=False))[0]
    assert out_sp.shape == ref.shape
    np.testing.assert_allclose(out_sp, ref, rtol=1e-5, atol=5e-3)

    # uint8 clipped path, batched input rank preserved
    out_u8 = np.asarray(stylize_spatial(params, img[None], mesh))
    assert out_u8.shape[0] == 1 and out_u8.dtype == np.uint8


def test_stylize_spatial_int8_matches_single_device():
    """Int8 H-sharded stylization: the static activation scales make every
    shard quantize identically, so the sharded int8 result matches the
    single-device int8 path up to reduction-order noise."""
    from artist_style_transfer_tpu.infer.stylize import (
        stylize_int8,
        stylize_spatial_int8,
    )
    from artist_style_transfer_tpu.models.transformer_q import quantize_transformer
    from artist_style_transfer_tpu.ops.precision import precision

    params = init_transformer_params(jax.random.key(0))
    rng = np.random.default_rng(6)
    calib = jnp.asarray(rng.random((2, 64, 48, 3)) * 255, jnp.float32)
    img = (rng.random((64, 48, 3)) * 255).astype(np.float32)
    mesh = make_mesh(shape=(4,))

    with precision("default"):
        qp = quantize_transformer(params, calib)
        out_sp = np.asarray(
            stylize_spatial_int8(qp, img, mesh, clip=False), np.float32
        )
        ref = np.asarray(
            stylize_int8(qp, jnp.asarray(img)[None], clip=False), np.float32
        )[0]
    assert out_sp.shape == ref.shape
    # bf16 IN arithmetic under different reduction orders: tolerance is in
    # pixel units on a [0,255]-scale output
    np.testing.assert_allclose(out_sp, ref, atol=1.5)
    assert float(np.mean(np.abs(out_sp - ref))) < 0.2

    out_u8 = np.asarray(stylize_spatial_int8(qp, img[None], mesh))
    assert out_u8.shape[0] == 1 and out_u8.dtype == np.uint8


def test_spatial_mesh_training_rejected():
    """Spatial ('space'>1) meshes are inference-only ON CPU: XLA:CPU GSPMD
    miscompiles halo'd conv WEIGHT gradients when the H dim is sharded
    (dw off ~3x; forward and dgrad exact — diagnosed round 2). The guard
    is keyed to the backend: CPU meshes are refused outright with the
    diagnosis; other backends run spatial_wgrad_selfcheck once and enable
    training iff the repro's gradients match (no source edit needed on
    real multi-chip TPU hardware)."""
    content, params, vgg_params, targets = _setup()
    mesh = make_mesh(shape=(4, 2), axis_names=("data", "space"))
    tx = make_optimizer(1e-3, 1e-4, 4, 2, N // B)
    with pytest.raises(NotImplementedError, match="CPU backend"):
        make_step_fns(
            "cycle", vgg_params, None, targets,
            content_weight=17.0, style_weight=25.0, batch_size=B,
            num_content=N, tx=tx, mesh=mesh, use_pallas=False,
        )


def test_spatial_wgrad_selfcheck_detects_the_miscompile():
    """The minimal repro the TPU-side gate runs must actually DETECT the
    diagnosed bug: on this CPU mesh the sharded weight gradient comes back
    ~3x wrong, far above the gate's tolerance. (If a future jax release
    fixes XLA:CPU GSPMD, this test and the CPU refusal should both be
    revisited together.)"""
    from artist_style_transfer_tpu.train.loop import (
        _SPATIAL_WGRAD_TOL,
        spatial_wgrad_selfcheck,
    )

    mesh = make_mesh(shape=(4, 2), axis_names=("data", "space"))
    err = spatial_wgrad_selfcheck(mesh)
    assert err > _SPATIAL_WGRAD_TOL, err  # the gate would refuse this backend
    assert 2.0 < err < 4.0, err  # the diagnosed ~3x signature


def test_spatial_mesh_forward_loss_matches():
    """Forward-only spatial sharding is exact: the training LOSS under a
    DP x spatial batch sharding matches single-device (only the weight
    gradient is affected by the CPU partitioner bug above)."""
    from artist_style_transfer_tpu.parallel.mesh import batch_sharding as bsh

    content, params, vgg_params, targets = _setup()
    tx = make_optimizer(1e-3, 1e-4, 4, 2, N // B)
    fns = make_step_fns(
        "cycle", vgg_params, None, targets,
        content_weight=17.0, style_weight=25.0, batch_size=B,
        num_content=N, tx=tx, mesh=None, use_pallas=False,
    )
    r22 = precompute_content_relu2_2(vgg_params, content)
    loss_fn = jax.jit(
        lambda p, b, r: fns.loss_fn(p, b, r, targets.grams, None, 0)[0]
    )
    ref = float(loss_fn(params, content[:B], r22[:B]))
    mesh = make_mesh(shape=(4, 2), axis_names=("data", "space"))
    got = float(
        loss_fn(
            params,
            jax.device_put(content[:B], bsh(mesh)),
            jax.device_put(r22[:B], bsh(mesh)),
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5)
