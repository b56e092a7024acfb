"""Orbax checkpointing with the reference's auto-resume discovery contract.

Reference behavior (studied, not copied): checkpoints land under
``{output_dir}/{name}_{timestamp}/models/`` with the epoch encoded in the
filename; on ``continue_training`` the newest run dir and the
highest-epoch model/optimizer pair are located by regex and training
resumes at ``epoch + 1`` (``src/util/slurm_restart.py:9-89``,
``train_mod_siren.py:32-56``).

Here: one Orbax train-state checkpoint (params + opt state + step) per
save, under ``{output_dir}/{name}_{timestamp}/checkpoints/step_{N:08d}``;
discovery keeps the same newest-run-dir / highest-step semantics.
Multi-host: every process restores the same step; only process 0 writes
artifacts (orbax handles distributed arrays natively).
"""

from __future__ import annotations

import datetime
import pathlib
import re

import jax
import orbax.checkpoint as ocp

RUN_DIR_RE = r"^(?P<name>.+)_(?P<ts>\d{4}-\d{2}-\d{2}_\d{2}-\d{2}-\d{2})$"
STEP_DIR_RE = r"^step_(?P<step>\d+)$"


def new_run_dir(output_dir: str | pathlib.Path, name: str, timestamp: str | None = None) -> pathlib.Path:
    ts = timestamp or datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
    run_dir = pathlib.Path(output_dir) / f"{name}_{ts}"
    run_dir.mkdir(parents=True, exist_ok=True)
    return run_dir


def find_latest_run_dir(
    output_dir: str | pathlib.Path, name: str
) -> pathlib.Path | None:
    """Newest ``{name}_{timestamp}`` run directory (lexicographic timestamp
    sort, same result as the reference's)."""
    output_dir = pathlib.Path(output_dir)
    if not output_dir.is_dir():
        return None
    candidates = []
    for p in output_dir.iterdir():
        m = re.match(RUN_DIR_RE, p.name)
        if p.is_dir() and m and m.group("name") == name:
            candidates.append((m.group("ts"), p))
    if not candidates:
        return None
    return max(candidates)[1]


def find_latest_step(run_dir: str | pathlib.Path) -> int | None:
    ckpt_dir = pathlib.Path(run_dir) / "checkpoints"
    if not ckpt_dir.is_dir():
        return None
    steps = [
        int(m.group("step"))
        for p in ckpt_dir.iterdir()
        if (m := re.match(STEP_DIR_RE, p.name))
    ]
    return max(steps) if steps else None


def checkpoint_path(run_dir: str | pathlib.Path, step: int) -> pathlib.Path:
    return pathlib.Path(run_dir) / "checkpoints" / f"step_{step:08d}"


def save_state(run_dir: str | pathlib.Path, step: int, state) -> pathlib.Path:
    path = checkpoint_path(run_dir, step)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path.absolute(), state, force=True)
    return path


def with_default_sharding(abstract_tree):
    """Attach a concrete single-device sharding to every leaf of a
    ``jax.eval_shape``-abstract pytree. Orbax refuses to restore into
    sharding-less abstract arrays, and checkpoints saved on one platform
    (TPU) carry device metadata that cannot resolve on another (CPU) —
    pinning the default device makes restores platform-portable."""
    import jax

    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sharding),
        abstract_tree,
    )


def restore_state(run_dir: str | pathlib.Path, step: int, abstract_state):
    """Restore into the structure of ``abstract_state`` (a concrete or
    ``jax.eval_shape``-abstract train-state pytree)."""
    path = checkpoint_path(run_dir, step)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path.absolute(), abstract_state)


def resolve_resume(
    output_dir: str | pathlib.Path, name: str
) -> tuple[pathlib.Path, int] | None:
    """(run_dir, latest_step) of the newest resumable run, or None."""
    run_dir = find_latest_run_dir(output_dir, name)
    if run_dir is None:
        return None
    step = find_latest_step(run_dir)
    if step is None:
        return None
    return run_dir, step
