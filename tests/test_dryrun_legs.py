"""Insurance coverage for the budget-gated ``dryrun_multichip`` legs.

The driver runs ``__graft_entry__.dryrun_multichip(8)`` under a wall-clock
timeout on a 1-core box; legs past its internal elapsed-time budget are
skipped there. Each test here runs the EXACT composition of one budget-gated
leg (same ``_dryrun_*`` helper, same arguments, same 8-device mesh), so a
leg cut from the dryrun loses no coverage (VERDICT r03 next-step #7).

The four never-cut legs (cycle, classifier, eval, spatial — first in the
dryrun's ordering, combined estimate well under any sane budget) are
additionally covered by tests/test_parallel.py (DP trajectory parity) and
tests/test_inference.py (sharded eval / spatial stylize parity).
"""

import pytest

import jax

import __graft_entry__ as ge
from artist_style_transfer_tpu.ops.precision import precision
from artist_style_transfer_tpu.parallel.mesh import make_mesh

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= N_DEV, jax.devices()
    return make_mesh(shape=(N_DEV,), devices=jax.devices()[:N_DEV])


@pytest.mark.slow
def test_leg_cycle_bf16_shard_mapped_fold(mesh):
    import numpy as np

    with precision("default"):
        losses = ge._dryrun_train_mode(
            "cycle", mesh, N_DEV, compute_dtype="bfloat16", fold_batch=True
        )
    assert np.all(np.isfinite(losses))


@pytest.mark.slow
def test_leg_cycle_int8_loss_deep(mesh):
    import numpy as np

    losses = ge._dryrun_train_mode(
        "cycle", mesh, N_DEV, compute_dtype="bfloat16", quantize_loss="deep"
    )
    assert np.all(np.isfinite(losses))


@pytest.mark.slow
def test_leg_cycle_qat(mesh):
    import numpy as np

    losses = ge._dryrun_train_mode(
        "cycle", mesh, N_DEV, compute_dtype="bfloat16", qat=True
    )
    assert np.all(np.isfinite(losses))


@pytest.mark.slow
def test_leg_classifier_bf16_int8_loss(mesh):
    import numpy as np

    losses = ge._dryrun_train_mode(
        "classifier", mesh, N_DEV, compute_dtype="bfloat16", quantize_loss="deep"
    )
    assert np.all(np.isfinite(losses))


@pytest.mark.slow
def test_leg_eval_int8(mesh):
    # Same tiny static shapes as the dryrun leg (round 5: 64 px, crop 64 —
    # the GSPMD int8 machinery is shape-independent and the eval-sized
    # compile made this the one budget-cut leg in round 4).
    with precision("default"):
        acc = ge._dryrun_eval(mesh, N_DEV, quantize=True, size=64, crop_size=64)
    assert 0.0 <= acc <= 100.0


@pytest.mark.slow
def test_leg_spatial_stylize_int8(mesh):
    with precision("default"):
        err = ge._dryrun_spatial(mesh, N_DEV, quantize=True)
    assert err < 0.5
