"""Centered 2-D DFT as a Pallas MXU kernel (the TPU-native "FFT").

The reference gets its k-space transform from ``fastmri.ifft2c``
(``src/data/preprocessing.py:57``):
``fftshift(ifft2(ifftshift(x), norm="ortho"))``. On TPU the idiomatic
implementation of a moderate-N Fourier transform is not a butterfly FFT —
scalar-indexed butterflies are exactly what the MXU cannot run — but a
dense DFT matmul: for fastMRI slice sizes (H, W <= 640) the O(N^3) matmul
costs microseconds on a ~100 TF/s systolic array and XLA/Mosaic can
pipeline it perfectly, while an O(N^2 log N) butterfly would be
VPU/lane-shuffle bound.

Both centering shifts are folded into the transform matrix once on the
host (``A = fftshift . F . ifftshift`` applied to the identity), so the
kernel is just ``Y = A_H @ X @ A_W^T`` in complex arithmetic = 8 real
(H,H)@(H,W)/(H,W)@(W,W) matmuls per slice, grid over slices, transform
matrices VMEM-resident across grid steps. An optional magnitude epilogue
fuses ``|Y|`` (the reference's ``complex_abs``) so the kernel writes half
the bytes on the reconstruction path.

Complex data crosses the host<->device boundary as float32 real/imag
pairs (axon cannot transfer complex64; see ``data/kspace.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=None)
def _centered_dft_matrix_np(n: int, inverse: bool):
    """(real, imag) float32 (n, n) matrices of the *centered* orthonormal
    1-D (i)DFT: applying ``A @ x`` equals
    ``fftshift((i)fft(ifftshift(x), norm="ortho"))``. Built numerically by
    pushing the identity through the exact reference pipeline, which also
    gets the odd-n shift asymmetry right for free."""
    eye = np.eye(n, dtype=np.complex128)
    shifted = np.fft.ifftshift(eye, axes=0)
    f = (np.fft.ifft if inverse else np.fft.fft)(shifted, axis=0, norm="ortho")
    a = np.fft.fftshift(f, axes=0)
    return a.real.astype(np.float32), a.imag.astype(np.float32)


def _kernel(xr_ref, xi_ref, ar_ref, ai_ref, btr_ref, bti_ref, out_ref,
            *, magnitude: bool):
    """One slice: Y = A_H @ X @ A_W^T, complex via real matmuls."""
    xr = xr_ref[0]
    xi = xi_ref[0]
    ar, ai = ar_ref[:], ai_ref[:]
    mm = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    tr = mm(ar, xr) - mm(ai, xi)
    ti = mm(ar, xi) + mm(ai, xr)
    btr, bti = btr_ref[:], bti_ref[:]
    yr = mm(tr, btr) - mm(ti, bti)
    yi = mm(tr, bti) + mm(ti, btr)
    if magnitude:
        out_ref[0] = jnp.sqrt(yr * yr + yi * yi)
    else:
        out_ref[0, :, :, 0] = yr
        out_ref[0, :, :, 1] = yi


@functools.partial(
    jax.jit, static_argnames=("inverse", "magnitude", "interpret")
)
def dft2c_ri(
    kspace_ri: jax.Array,
    *,
    inverse: bool = True,
    magnitude: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Centered orthonormal 2-D (i)DFT of (..., H, W, 2) real/imag data.

    Returns (..., H, W, 2), or (..., H, W) magnitudes when
    ``magnitude=True`` (== the reference's ``ifft2c`` + ``complex_abs``
    reconstruction, fused).
    """
    lead = kspace_ri.shape[:-3]
    h, w = kspace_ri.shape[-3:-1]
    x = kspace_ri.reshape(-1, h, w, 2)
    b = x.shape[0]

    ar, ai = (jnp.asarray(m) for m in _centered_dft_matrix_np(h, inverse))
    bwr, bwi = (jnp.asarray(m) for m in _centered_dft_matrix_np(w, inverse))

    full = lambda *shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    slice_block = lambda *tail: pl.BlockSpec(
        (1, *tail), lambda i: (i,) + (0,) * len(tail), memory_space=pltpu.VMEM
    )
    out_shape = (b, h, w) if magnitude else (b, h, w, 2)
    out = pl.pallas_call(
        functools.partial(_kernel, magnitude=magnitude),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        grid=(b,),
        in_specs=[
            slice_block(h, w),
            slice_block(h, w),
            full(h, h),
            full(h, h),
            full(w, w),
            full(w, w),
        ],
        out_specs=slice_block(h, w) if magnitude else slice_block(h, w, 2),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * h * w * (h + w),
            bytes_accessed=4 * b * h * w * (4 if magnitude else 6)
            + 8 * (h * h + w * w),
            transcendentals=b * h * w if magnitude else 0,
        ),
        interpret=interpret,
    )(x[..., 0], x[..., 1], ar, ai, bwr.T, bwi.T)
    return out.reshape(*lead, h, w) if magnitude else out.reshape(
        *lead, h, w, 2
    )


def reconstruct_magnitude_ri_mxu(
    kspace_ri: jax.Array, *, interpret: bool = False
) -> jax.Array:
    """float32 (..., H, W, 2) k-space -> (..., H, W) magnitude image via the
    MXU-DFT kernel; drop-in for ``kspace.reconstruct_magnitude_ri``."""
    return dft2c_ri(
        kspace_ri, inverse=True, magnitude=True, interpret=interpret
    )
