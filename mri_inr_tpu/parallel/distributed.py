"""Multi-host (pod-slice) runtime helpers.

The reference runs single-process and delegates restarts to SLURM
(``practical_slurm_launcher.sh``, ``src/util/slurm_restart.py``). The
TPU-native equivalent is: ``jax.distributed.initialize`` bootstraps all
hosts over DCN (on Cloud TPU VMs the coordinator/process ids come from the
TPU metadata, so no arguments are needed), every host runs the same
program, arrays shard over the global mesh, and only the primary host
writes artifacts. ``scripts/pod_launch.sh`` starts the same command on
every worker.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bootstrap multi-host JAX. No-ops when single-process (the common
    1-chip / CPU-test case) or when already initialized.

    On Cloud TPU pod slices call with no arguments; for manual clusters pass
    coordinator_address ("ip:port"), num_processes and process_id — or set
    ``MRI_INR_COORDINATOR`` / ``MRI_INR_NUM_PROCESSES`` /
    ``MRI_INR_PROCESS_ID`` (used by ``scripts/drive_multiprocess.py`` to
    drive the unchanged CLIs as a 2-process CPU cluster).
    """
    global _initialized
    if _initialized:
        return
    if coordinator_address is None:
        coordinator_address = os.environ.get("MRI_INR_COORDINATOR")
        if coordinator_address:
            missing = [
                v
                for v in ("MRI_INR_NUM_PROCESSES", "MRI_INR_PROCESS_ID")
                if v not in os.environ
            ]
            if missing:
                raise ValueError(
                    "MRI_INR_COORDINATOR is set but "
                    f"{' and '.join(missing)} "
                    "is not — the three variables must be set together"
                )
            num_processes = int(os.environ["MRI_INR_NUM_PROCESSES"])
            process_id = int(os.environ["MRI_INR_PROCESS_ID"])
    if num_processes is None and coordinator_address is None:
        # Single-host unless the TPU runtime says otherwise; initialize()
        # with no args works on TPU pods and raises elsewhere.
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            return
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    _initialized = True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the host that should write checkpoints/artifacts."""
    return jax.process_index() == 0


def sync_hosts(name: str = "sync") -> None:
    """Barrier across hosts (no-op single-host)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def all_gather_host_values(values):
    """Gather a small pytree of host-local scalars/arrays from every process
    (e.g. per-host metric lists in the eval sweep). Single-host: identity
    list."""
    if jax.process_count() == 1:
        return [values]
    from jax.experimental import multihost_utils

    return list(multihost_utils.process_allgather(values, tiled=False))
