"""Image quality metrics (PSNR / SSIM / NRMSE) in pure JAX.

The reference scores with ``skimage.metrics`` on CPU numpy
(``src/util/error.py:10-12, 23-101``); here the metrics are jitted JAX so
the whole eval (tile -> forward -> fold -> score) stays on-device and can be
pod-parallel. Semantics match the reference exactly:

- joint data range: ``max(a.max(), b.max()) - min(a.min(), b.min())`` for
  both PSNR and SSIM (reference ``error.py:23-70``);
- SSIM with skimage defaults: uniform 7x7 windows (gaussian_weights=False),
  K1=0.01, K2=0.03, sample covariance normalization N/(N-1), border of
  (win_size-1)//2 cropped from the SSIM map before averaging — implemented
  here with VALID windows, which is equivalent;
- NRMSE with skimage's default 'euclidean' normalization:
  ``sqrt(mse) / sqrt(mean(gt**2))``.

Validated against golden values produced by re-running skimage's exact
``structural_similarity(gaussian_weights=False)`` pipeline on
``scipy.ndimage.uniform_filter`` — the same windowing engine skimage
calls — in float64, plus closed-form analytic cases
(tests/test_metrics_goldens.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def joint_data_range(gt: jax.Array, pred: jax.Array) -> jax.Array:
    hi = jnp.maximum(jnp.max(gt), jnp.max(pred))
    lo = jnp.minimum(jnp.min(gt), jnp.min(pred))
    return hi - lo


@jax.jit
def psnr(gt: jax.Array, pred: jax.Array, data_range: jax.Array | None = None):
    if data_range is None:
        data_range = joint_data_range(gt, pred)
    mse = jnp.mean(jnp.square(gt - pred))
    return 10.0 * jnp.log10(jnp.square(data_range) / mse)


def _uniform_filter_valid(x: jax.Array, win: int) -> jax.Array:
    """Mean over each valid win x win window of a 2-D array.

    Separable two-pass formulation: win adds/px per axis instead of win^2
    per window (the 2-D reduce_window was a measured slice of the eval
    sweep's VPU time; same result up to f32 reassociation ~1e-7, inside
    the skimage-golden tolerances)."""
    rows = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (win, 1), (1, 1), "VALID"
    )
    summed = jax.lax.reduce_window(
        rows, 0.0, jax.lax.add, (1, win), (1, 1), "VALID"
    )
    return summed / (win * win)


@functools.partial(jax.jit, static_argnums=(3,))
def ssim(
    gt: jax.Array,
    pred: jax.Array,
    data_range: jax.Array | None = None,
    win_size: int = 7,
):
    """Mean structural similarity over a 2-D image pair."""
    if data_range is None:
        data_range = joint_data_range(gt, pred)
    x = gt.astype(jnp.float32)
    y = pred.astype(jnp.float32)
    ux = _uniform_filter_valid(x, win_size)
    uy = _uniform_filter_valid(y, win_size)
    uxx = _uniform_filter_valid(x * x, win_size)
    uyy = _uniform_filter_valid(y * y, win_size)
    uxy = _uniform_filter_valid(x * y, win_size)
    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    k1, k2 = 0.01, 0.03
    c1 = jnp.square(k1 * data_range)
    c2 = jnp.square(k2 * data_range)
    a1 = 2.0 * ux * uy + c1
    a2 = 2.0 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    return jnp.mean((a1 * a2) / (b1 * b2))


@jax.jit
def nrmse(gt: jax.Array, pred: jax.Array):
    mse = jnp.mean(jnp.square(gt - pred))
    denom = jnp.sqrt(jnp.mean(jnp.square(gt)))
    return jnp.sqrt(mse) / denom


@jax.jit
def difference(gt: jax.Array, pred: jax.Array):
    """Absolute difference map (reference ``error.py:87-101``)."""
    return jnp.abs(gt - pred)


@jax.jit
def image_metrics(gt: jax.Array, pred: jax.Array) -> dict[str, jax.Array]:
    """PSNR / SSIM / NRMSE of one image pair with the reference's joint
    data-range convention."""
    dr = joint_data_range(gt, pred)
    return {
        "psnr": psnr(gt, pred, dr),
        "ssim": ssim(gt, pred, dr),
        "nrmse": nrmse(gt, pred),
    }
