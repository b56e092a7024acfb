"""Patch/tiling engine: overlapping patch extraction and overlap-add
recomposition, all static-shape and jit-friendly.

Geometry parity with the reference (``src/util/tiling.py``, studied not
copied), defaults ``outer=32, inner=16, siren=24``:

- extraction (`tiling.py:10-64`): reflect-pad by ``(outer-inner)/2`` on all
  sides plus bottom/right padding to a multiple of ``inner``; overlapping
  ``outer``-sized windows at stride ``inner``, row-major order.
- weighted recomposition (`tiling.py:67-140`): radial weights
  ``exp(-0.1 * dist_from_center)`` normalized to max 1; fold with
  ``kernel=siren, stride=inner, padding=(siren-inner)/2``; divide by the
  folded weight sum.
- plain recomposition (`tiling.py:143-181`): fold with ``kernel=outer``,
  ones normalization.
- black-patch rule (`tiling.py:184-198`): ``mean(patch) < 1e-10``.

TPU-native design: unfold is a broadcasted gather, fold is a scatter-add
into a padded canvas — exact adjoints, no ragged shapes. Black patches are
handled as a *validity mask* carried through the batch (a masked patch is
zeroed but still contributes its weights to fold normalization, which is
exactly equivalent to the reference's filter-then-reintegrate-zeros dance,
``tiling.py:244-303``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BLACK_PATCH_THRESHOLD = 1e-10


def grid_shape(height: int, width: int, inner_patch_size: int) -> tuple[int, int]:
    """Number of (vertical, horizontal) patches for an image; static Python
    ints so downstream shapes stay static."""
    nv = -(-height // inner_patch_size)
    nh = -(-width // inner_patch_size)
    return nv, nh


@functools.lru_cache(maxsize=None)
def _window_indices(n: int, kernel: int, stride: int) -> np.ndarray:
    """(n, kernel) row indices of each window's pixels."""
    return np.arange(n)[:, None] * stride + np.arange(kernel)[None, :]


@functools.partial(jax.jit, static_argnums=(1, 2))
def image_to_patches(
    image: jax.Array, outer_patch_size: int, inner_patch_size: int
) -> jax.Array:
    """Extract overlapping patches from one (H, W) image.

    Returns (nv * nh, outer, outer) patches in row-major order.
    """
    height, width = image.shape
    pad = (outer_patch_size - inner_patch_size) // 2
    vpad = (inner_patch_size - height % inner_patch_size) % inner_patch_size
    hpad = (inner_patch_size - width % inner_patch_size) % inner_patch_size
    padded = jnp.pad(
        image, ((pad, pad + vpad), (pad, pad + hpad)), mode="reflect"
    )
    nv, nh = grid_shape(height, width, inner_patch_size)
    if outer_patch_size % inner_patch_size == 0:
        # Block formulation, no gather: with stride == inner and
        # outer == k*inner, the padded image tiles exactly into
        # (nv+k-1, nh+k-1) non-overlapping inner-sized blocks and patch
        # (i, j) is the k x k block neighborhood [i:i+k, j:j+k] — k^2
        # contiguous slices + concats, which XLA lowers to cheap copies.
        # The equivalent advanced-index gather measured 5.38 ms/call at
        # 320x320 on the v5e (more than the 441-patch model forward,
        # 2.14 ms); this path removes the eval sweep's dominant cost
        # (bit-identical output; runs/results/eval_parts_r5.log).
        k = outer_patch_size // inner_patch_size
        inner = inner_patch_size
        blocks = padded.reshape(
            nv + k - 1, inner, nh + k - 1, inner
        ).transpose(0, 2, 1, 3)
        bands = [
            jnp.concatenate(
                [blocks[di : di + nv, dj : dj + nh] for dj in range(k)],
                axis=3,
            )
            for di in range(k)
        ]
        patches = jnp.concatenate(bands, axis=2)
        return patches.reshape(nv * nh, outer_patch_size, outer_patch_size)
    rows = _window_indices(nv, outer_patch_size, inner_patch_size)
    cols = _window_indices(nh, outer_patch_size, inner_patch_size)
    patches = padded[rows[:, None, :, None], cols[None, :, None, :]]
    return patches.reshape(nv * nh, outer_patch_size, outer_patch_size)


def batch_images_to_patches(
    images: jax.Array, outer_patch_size: int, inner_patch_size: int
) -> jax.Array:
    """vmap of :func:`image_to_patches` over a (B, H, W) batch of same-size
    images -> (B, nv*nh, outer, outer)."""
    fn = functools.partial(
        image_to_patches,
        outer_patch_size=outer_patch_size,
        inner_patch_size=inner_patch_size,
    )
    return jax.vmap(fn)(images)


@functools.lru_cache(maxsize=None)
def _weight_matrix_np(tile_size: int) -> np.ndarray:
    center = (tile_size - 1) / 2
    ii, jj = np.meshgrid(np.arange(tile_size), np.arange(tile_size), indexing="ij")
    dist = np.sqrt((ii - center) ** 2 + (jj - center) ** 2)
    w = np.exp(-0.1 * dist)
    return (w / w.max()).astype(np.float32)


def generate_weight_matrix(tile_size: int) -> jax.Array:
    """Radial overlap-blending weights, max-normalized to 1."""
    return jnp.asarray(_weight_matrix_np(tile_size))


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _fold(
    patches: jax.Array, grid: tuple[int, int], kernel: int, stride: int
) -> jax.Array:
    """Overlap-add of (nv*nh, kernel, kernel) patches with torch.F.fold
    semantics: block (r, c) covers output rows ``r*stride - pad`` to
    ``r*stride - pad + kernel`` where ``pad=(kernel-stride)//2``;
    out-of-bounds contributions are dropped. Output is (nv*s, nh*s).

    TPU-native formulation: with ``kernel <= 2*stride`` (both geometries
    here: siren 24 / outer 32 at stride 16) patches of the same (row, col)
    parity never overlap, so the fold is FOUR dense reshape-placements
    added at static offsets — no scatter. XLA lowers an overlapping
    ``.at[...].add`` gather-scatter to a serialized scatter op on TPU
    (measured ~100x slower than these four pad+add steps at 320x320);
    the general scatter path remains as fallback for exotic geometries."""
    nv, nh = grid
    pad = (kernel - stride) // 2
    out_h, out_w = nv * stride, nh * stride
    canvas = _fold_canvas(patches, nv, nh, kernel, stride)
    return canvas[pad : pad + out_h, pad : pad + out_w]


def _fold_canvas(
    patches: jax.Array, nv: int, nh: int, kernel: int, stride: int
) -> jax.Array:
    """Uncropped overlap-add canvas: patch (r, c) occupies canvas rows
    ``r*stride .. r*stride + kernel``. Scatter-free parity decomposition
    when ``kernel <= 2*stride``; returns at least
    (nv*stride + kernel - stride, nh*stride + kernel - stride) rows/cols
    (parity path allocates (stride*(nv+1), stride*(nh+1)))."""
    patches = patches.reshape(nv, nh, kernel, kernel)

    if kernel > 2 * stride:  # general (unused by the shipped geometries)
        pad2 = kernel - stride
        canvas = jnp.zeros(
            (nv * stride + pad2, nh * stride + pad2), patches.dtype
        )
        rows = _window_indices(nv, kernel, stride)
        cols = _window_indices(nh, kernel, stride)
        return canvas.at[
            rows[:, None, :, None], cols[None, :, None, :]
        ].add(patches)

    two_s = 2 * stride
    big = jnp.zeros((stride * (nv + 1), stride * (nh + 1)), patches.dtype)
    for a in (0, 1):
        for b in (0, 1):
            sub = patches[a::2, b::2]
            ra, cb = sub.shape[0], sub.shape[1]
            if ra == 0 or cb == 0:
                continue
            # pad each patch to (2s, 2s): same-parity tiles then abut
            sub = jnp.pad(
                sub, ((0, 0), (0, 0), (0, two_s - kernel), (0, two_s - kernel))
            )
            dense = sub.transpose(0, 2, 1, 3).reshape(ra * two_s, cb * two_s)
            big = jax.lax.dynamic_update_slice(
                big,
                jax.lax.dynamic_slice(
                    big, (a * stride, b * stride), (ra * two_s, cb * two_s)
                )
                + dense,
                (a * stride, b * stride),
            )
    return big


@functools.lru_cache(maxsize=None)
def _fold_den_np(
    grid: tuple[int, int], kernel: int, stride: int, weighted: bool
) -> np.ndarray:
    """The fold normalization denominator is a PURE function of the
    geometry (every patch contributes the same weight/ones tile), so it is
    precomputed host-side once per (grid, kernel, stride) and baked as an
    XLA constant — halving the fold work per slice."""
    nv, nh = grid
    tile = _weight_matrix_np(kernel) if weighted else np.ones(
        (kernel, kernel), np.float32
    )
    pad = (kernel - stride) // 2
    out_h, out_w = nv * stride, nh * stride
    canvas = np.zeros((out_h + 2 * pad, out_w + 2 * pad), np.float64)
    for r in range(nv):
        for c in range(nh):
            canvas[r * stride : r * stride + kernel,
                   c * stride : c * stride + kernel] += tile
    return canvas[pad : pad + out_h, pad : pad + out_w].astype(np.float32)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def patches_to_image_weighted_average(
    patches: jax.Array,
    grid: tuple[int, int],
    siren_patch_size: int,
    inner_patch_size: int,
) -> jax.Array:
    """Blend overlapping (N, siren, siren) model outputs into a
    (nv*inner, nh*inner) image with radial weights."""
    weights = generate_weight_matrix(siren_patch_size)
    num = _fold(patches * weights, grid, siren_patch_size, inner_patch_size)
    den = jnp.asarray(
        _fold_den_np(grid, siren_patch_size, inner_patch_size, weighted=True)
    )
    return num / den


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def patches_to_image(
    patches: jax.Array,
    grid: tuple[int, int],
    outer_patch_size: int,
    inner_patch_size: int,
) -> jax.Array:
    """Uniform-average recomposition of (N, outer, outer) patches (used for
    ground-truth / undersampled display paths)."""
    num = _fold(patches, grid, outer_patch_size, inner_patch_size)
    den = jnp.asarray(
        _fold_den_np(grid, outer_patch_size, inner_patch_size, weighted=False)
    )
    return num / den


@functools.partial(jax.jit, static_argnums=(1, 2))
def extract_center_batch(
    patches: jax.Array, outer_patch_size: int, center_size: int
) -> jax.Array:
    """Center-crop (N, outer, outer) -> (N, center, center); builds the
    training target from fully-sampled outer patches."""
    start = (outer_patch_size - center_size) // 2
    return patches[..., start : start + center_size, start : start + center_size]


@jax.jit
def classify_black_patches(patches: jax.Array) -> jax.Array:
    """Validity mask over (N, P, P): True for informative patches, False for
    black (mean < 1e-10) ones."""
    return jnp.mean(patches, axis=(-2, -1)) >= BLACK_PATCH_THRESHOLD


def mask_black_patches(values: jax.Array, valid: jax.Array) -> jax.Array:
    """Zero the entries of (N, ...) ``values`` whose patch is black. Combined
    with the weighted fold this reproduces the reference's
    filter -> model -> reintegrate-zeros pipeline with static shapes."""
    return values * valid.reshape(valid.shape + (1,) * (values.ndim - 1)).astype(
        values.dtype
    )
