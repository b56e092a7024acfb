"""Device mesh + sharding layout.

The reference is single-process, single-GPU (SURVEY §2.9 — no distributed
parallelism of any kind); this module *introduces* the TPU-native
parallelism design:

- ``data`` axis: patches are i.i.d. training samples, so the patch batch is
  sharded over all chips; XLA inserts the gradient ``psum`` over ICI
  automatically from the sharding annotations on the jitted train step.
- evaluation shards validation *files* over hosts/chips (embarrassingly
  parallel, see ``mri_inr_tpu.eval``); metric scalars are gathered host-side.
- multi-host bootstrap goes through ``jax.distributed.initialize`` (DCN);
  inside a slice all collectives ride ICI.

Shardings are expressed as ``NamedSharding(mesh, PartitionSpec(...))`` so
the same jitted step runs unchanged on 1 chip, 1 host, or a pod slice.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices
    (default: all)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays onto the mesh, batch-sharded. Batch sizes must be
    divisible by the data-axis size (the host pipeline pads batches to a
    static size, so this is a cheap invariant)."""
    sharding = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]
