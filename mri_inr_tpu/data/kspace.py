"""Jitted k-space pipeline: centered 2-D FFTs, undersampling masks, volume
normalization.

Behavioral parity targets (reference, studied not copied):
- ``fastmri.ifft2c`` — centered orthonormal inverse 2-D FFT:
  ``fftshift(ifft2(ifftshift(x), norm="ortho"))`` over the last two spatial
  dims (used at reference ``src/data/preprocessing.py:57``).
- ``fastmri.complex_abs`` — complex magnitude.
- ``RandomMaskFunc(center_fractions, accelerations)`` + ``T.apply_mask`` —
  per-column (phase-encode) mask: ``round(N * cf)`` central columns always
  kept, remaining columns kept i.i.d. with probability
  ``(N/acc - N*cf) / (N - N*cf)`` (reference ``preprocessing.py:49-58``).
- ``normalize_scan`` — whole-volume min-max to [0, 1] (reference
  ``src/util/visualization.py:113-126``).

TPU-native notes: JAX complex64 arrays (no torch real-pair layout); all ops
jit-compile; the mask is drawn with ``jax.random`` under explicit keys
(deterministic preprocessing instead of the reference's unseeded RNG).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _shifted_fft2(x: jax.Array, inverse: bool) -> jax.Array:
    axes = (-2, -1)
    x = jnp.fft.ifftshift(x, axes=axes)
    if inverse:
        x = jnp.fft.ifft2(x, axes=axes, norm="ortho")
    else:
        x = jnp.fft.fft2(x, axes=axes, norm="ortho")
    return jnp.fft.fftshift(x, axes=axes)


@jax.jit
def ifft2c(kspace: jax.Array) -> jax.Array:
    """Centered orthonormal inverse 2-D FFT over the last two dims."""
    return _shifted_fft2(kspace, inverse=True)


@jax.jit
def fft2c(image: jax.Array) -> jax.Array:
    """Centered orthonormal forward 2-D FFT over the last two dims."""
    return _shifted_fft2(image, inverse=False)


@jax.jit
def complex_abs(x: jax.Array) -> jax.Array:
    return jnp.abs(x)


def num_low_frequencies(num_cols: int, center_fraction: float) -> int:
    return round(num_cols * center_fraction)


def random_mask(
    key: jax.Array,
    num_cols: int,
    center_fraction: float,
    acceleration: float,
) -> jax.Array:
    """fastMRI ``RandomMaskFunc``-semantics column mask of shape (num_cols,).

    The expected retained fraction is 1/acceleration: ``num_low`` center
    columns are always kept; each remaining column is kept with probability
    ``(num_cols/acceleration - num_low) / (num_cols - num_low)``.
    """
    num_low = num_low_frequencies(num_cols, center_fraction)
    prob = (num_cols / acceleration - num_low) / (num_cols - num_low)
    mask = jax.random.uniform(key, (num_cols,)) < prob
    pad = (num_cols - num_low + 1) // 2
    center = jnp.zeros((num_cols,), bool).at[pad : pad + num_low].set(True)
    return jnp.logical_or(mask, center)


def apply_mask(kspace: jax.Array, mask: jax.Array) -> jax.Array:
    """Zero out unsampled phase-encode columns. ``mask`` is (W,) boolean and
    broadcasts over leading dims; columns are the last axis."""
    return kspace * mask.astype(kspace.dtype)


@jax.jit
def normalize_scan(volume: jax.Array) -> jax.Array:
    """Whole-volume min-max normalization to [0, 1]."""
    lo = jnp.min(volume)
    hi = jnp.max(volume)
    return (volume - lo) / (hi - lo)


def undersample_volume(
    kspace: jax.Array,
    key: jax.Array,
    center_fraction: float,
    acceleration: float,
) -> tuple[jax.Array, jax.Array]:
    """Mask a (..., H, W) k-space volume with a single random column mask
    (fastMRI draws one mask per volume). Returns (masked k-space, mask)."""
    mask = random_mask(key, kspace.shape[-1], center_fraction, acceleration)
    return apply_mask(kspace, mask), mask


@jax.jit
def reconstruct_magnitude(kspace: jax.Array) -> jax.Array:
    """k-space -> image-space magnitude (the reference's load path:
    ``ifft2c`` then ``complex_abs``)."""
    return complex_abs(ifft2c(kspace))


# ---------------------------------------------------------------------------
# Real/imag-pair interface. The axon TPU runtime cannot transfer complex64
# across the host<->device boundary (UNIMPLEMENTED), though on-device complex
# compute works — so the device API takes float32 (..., H, W, 2) arrays and
# forms/splits complex inside jit. This is also the layout fastMRI itself
# uses for k-space tensors.
# ---------------------------------------------------------------------------


def to_ri(kspace_complex) -> jax.Array:
    """Host-side complex (...,H,W) -> float32 (...,H,W,2) real/imag pairs."""
    import numpy as np

    k = np.asarray(kspace_complex)
    return np.stack([k.real, k.imag], axis=-1).astype(np.float32)


def _ri_to_complex(ri: jax.Array) -> jax.Array:
    return jax.lax.complex(ri[..., 0], ri[..., 1])


@jax.jit
def reconstruct_magnitude_ri(kspace_ri: jax.Array) -> jax.Array:
    """float32 (..., H, W, 2) k-space -> (..., H, W) magnitude image."""
    return complex_abs(ifft2c(_ri_to_complex(kspace_ri)))


def apply_mask_ri(kspace_ri: jax.Array, mask: jax.Array) -> jax.Array:
    """Column mask on (..., H, W, 2) real/imag k-space."""
    return kspace_ri * mask[:, None].astype(kspace_ri.dtype)


def undersample_volume_ri(
    kspace_ri: jax.Array,
    key: jax.Array,
    center_fraction: float,
    acceleration: float,
) -> tuple[jax.Array, jax.Array]:
    mask = random_mask(key, kspace_ri.shape[-2], center_fraction, acceleration)
    return apply_mask_ri(kspace_ri, mask), mask
