"""Distributed weighted overlap-add fold with ICI halo exchange.

The reference assembles a full image from overlapping SIREN patches with a
single-device ``F.fold`` (``src/util/tiling.py:91-140``). For fields of
view too large for one chip — the INR analog of long-context/sequence
parallelism (SURVEY §5) — this module shards the *patch-row* axis across
the device mesh: every device folds its contiguous band of patch rows
locally, then exchanges the ``siren - inner`` pixel halo bands with its
mesh neighbors via ``jax.lax.ppermute`` (one hop over ICI each way), adds
the received contributions, and keeps its band of final image rows.

Semantics are identical to the single-device
``tiling.patches_to_image_weighted_average`` (asserted bit-tight in
tests/test_halo_fold.py); communication is 2 bands of ``overlap x W``
pixels per device instead of any gather of the full patch tensor.

Layout contract: ``patches`` is (nv*nh, s, s) row-major with nv divisible
by the mesh axis size; each device holds nv/D consecutive patch rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mri_inr_tpu.ops import tiling
from mri_inr_tpu.parallel.mesh import DATA_AXIS


def _local_fold_padded(
    patches: jax.Array, nv: int, nh: int, kernel: int, stride: int
) -> jax.Array:
    """Overlap-add of a local band of patch rows WITHOUT cropping the
    vertical halo: returns (nv*stride + 2*pad, nh*stride) where
    pad = (kernel - stride) // 2. Horizontal halo is cropped (the row axis
    is the only sharded axis)."""
    pad = (kernel - stride) // 2
    out_h, out_w = nv * stride, nh * stride
    # scatter-free parity canvas (see tiling._fold_canvas): patch (r, c)
    # occupies canvas rows r*stride..+kernel, matching this function's
    # coordinate contract, so the vertical halo is rows [0, out_h + 2*pad)
    canvas = tiling._fold_canvas(patches, nv, nh, kernel, stride)
    return canvas[: out_h + 2 * pad, pad : pad + out_w]


def _exchange_halos(canvas: jax.Array, pad: int, axis: str) -> jax.Array:
    """Send the top/bottom ``pad`` rows to the previous/next device on the
    mesh axis and add the bands received from both neighbors."""
    n = jax.lax.axis_size(axis)
    if pad == 0:
        return canvas
    if n == 1:
        # no neighbors: out-of-band halo contributions are dropped, exactly
        # like the single-device fold's canvas crop
        return canvas[pad:-pad]
    top_halo = canvas[:pad]  # belongs to the previous device's band
    bot_halo = canvas[-pad:]  # belongs to the next device's band
    # ring permutes; edge devices receive zeros (their halo has no owner)
    from_next = jax.lax.ppermute(
        top_halo, axis, [(i, (i - 1) % n) for i in range(n)]
    )
    from_prev = jax.lax.ppermute(
        bot_halo, axis, [(i, (i + 1) % n) for i in range(n)]
    )
    idx = jax.lax.axis_index(axis)
    from_next = jnp.where(idx < n - 1, from_next, 0.0)
    from_prev = jnp.where(idx > 0, from_prev, 0.0)
    body = canvas[pad:-pad]
    body = body.at[-pad:].add(from_next)
    body = body.at[:pad].add(from_prev)
    return body


@functools.partial(
    jax.jit, static_argnames=("grid", "siren_patch_size", "inner_patch_size", "mesh")
)
def sharded_patches_to_image_weighted_average(
    patches: jax.Array,
    grid: tuple[int, int],
    siren_patch_size: int,
    inner_patch_size: int,
    mesh: Mesh,
) -> jax.Array:
    """Drop-in distributed version of
    :func:`mri_inr_tpu.ops.tiling.patches_to_image_weighted_average`.

    ``patches``: (nv*nh, s, s) with nv divisible by the mesh's data-axis
    size. Returns the assembled (nv*inner, nh*inner) image, row-sharded
    over the mesh (materialize with ``jax.device_get`` or re-shard as
    needed).
    """
    nv, nh = grid
    axis_size = mesh.shape[DATA_AXIS]
    if nv % axis_size:
        raise ValueError(f"nv={nv} must be divisible by mesh size {axis_size}")
    nv_local = nv // axis_size
    pad = (siren_patch_size - inner_patch_size) // 2
    weights = tiling.generate_weight_matrix(siren_patch_size)

    def local(p):
        p = p.reshape(nv_local * nh, siren_patch_size, siren_patch_size)
        num = _local_fold_padded(
            p * weights, nv_local, nh, siren_patch_size, inner_patch_size
        )
        den = _local_fold_padded(
            jnp.broadcast_to(weights, p.shape),
            nv_local, nh, siren_patch_size, inner_patch_size,
        )
        num = _exchange_halos(num, pad, DATA_AXIS)
        den = _exchange_halos(den, pad, DATA_AXIS)
        return num / den

    fold = shard_map(
        local,
        mesh=mesh,
        in_specs=P(DATA_AXIS),
        out_specs=P(DATA_AXIS),
    )
    return fold(patches)


def shard_patches_by_rows(mesh: Mesh, patches: jax.Array) -> jax.Array:
    """Place (nv*nh, s, s) patches row-band-sharded on the mesh."""
    return jax.device_put(patches, NamedSharding(mesh, P(DATA_AXIS)))
