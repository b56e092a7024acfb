"""Golden-value validation of the JAX metrics against skimage semantics
(VERDICT r1 item 7 / weak #6).

skimage itself is not installed in this image, but its
``structural_similarity(gaussian_weights=False)`` path is a thin wrapper
over ``scipy.ndimage.uniform_filter`` (the exact windowing engine) plus
documented constants (K1=0.01, K2=0.03, sample covariance N/(N-1), crop
pad=(win-1)//2). scipy IS installed, so the goldens here are produced by
re-running skimage's exact pipeline on its own windowing engine in
float64 — plus hardcoded values from that computation (so a scipy change
would be caught), plus closed-form analytic cases.

Reference scoring: ``src/util/error.py:23-101`` (skimage psnr/ssim/nrmse,
joint data range).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import convolve, uniform_filter

from mri_inr_tpu.eval import metrics as M


def skimage_ssim_f64(im1, im2, data_range, win_size=7):
    """skimage.metrics.structural_similarity, gaussian_weights=False path,
    reconstructed step-for-step on scipy.ndimage.uniform_filter."""
    im1 = im1.astype(np.float64)
    im2 = im2.astype(np.float64)
    NP = win_size**2
    cov_norm = NP / (NP - 1)
    ux = uniform_filter(im1, size=win_size)
    uy = uniform_filter(im2, size=win_size)
    uxx = uniform_filter(im1 * im1, size=win_size)
    uyy = uniform_filter(im2 * im2, size=win_size)
    uxy = uniform_filter(im1 * im2, size=win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    K1, K2 = 0.01, 0.03
    C1, C2 = (K1 * data_range) ** 2, (K2 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux * ux + uy * uy + C1) * (vx + vy + C2)
    )
    pad = (win_size - 1) // 2
    return S[pad:-pad, pad:-pad].mean()


def _fixture():
    rng = np.random.default_rng(20240816)
    yy, xx = np.mgrid[0:40, 0:56]
    gt = (0.4 + 0.3 * np.sin(xx / 7.0) + 0.3 * np.cos(yy / 5.0)).astype(np.float32)
    gt = (gt - gt.min()) / (gt.max() - gt.min())
    noisy = np.clip(
        gt + rng.normal(0, 0.05, gt.shape).astype(np.float32), 0, 1
    ).astype(np.float32)
    contrast = np.clip(gt * 0.9 + 0.02, 0, 1).astype(np.float32)
    blur = convolve(gt, np.ones((3, 3)) / 9.0, mode="nearest").astype(np.float32)
    return gt, {"noisy": noisy, "contrast": contrast, "blur": blur}


# float64 values computed by the scipy pipeline above (pinned so a scipy
# behavior change is also caught)
GOLDEN = {
    "noisy": (26.0689750404, 0.8304020903, 0.0803655080),
    "contrast": (27.0841455249, 0.9919831839, 0.0715008443),
    "blur": (47.9490812853, 0.9996905628, 0.0064723856),
}


@pytest.mark.parametrize("case", ["noisy", "contrast", "blur"])
def test_jax_metrics_match_goldens(case):
    gt, preds = _fixture()
    pred = preds[case]
    got = {k: float(v) for k, v in M.image_metrics(
        jnp.asarray(gt), jnp.asarray(pred)
    ).items()}
    g_psnr, g_ssim, g_nrmse = GOLDEN[case]
    assert got["psnr"] == pytest.approx(g_psnr, abs=1e-3)
    assert got["ssim"] == pytest.approx(g_ssim, abs=1e-5)
    assert got["nrmse"] == pytest.approx(g_nrmse, abs=1e-6)


@pytest.mark.parametrize("case", ["noisy", "contrast", "blur"])
def test_live_scipy_pipeline_agrees(case):
    """Same comparison recomputed live on scipy's uniform_filter — the
    goldens and the engine cross-check each other."""
    gt, preds = _fixture()
    pred = preds[case]
    dr = float(max(gt.max(), pred.max()) - min(gt.min(), pred.min()))
    live = skimage_ssim_f64(gt, pred, dr)
    assert float(M.ssim(jnp.asarray(gt), jnp.asarray(pred))) == pytest.approx(
        live, abs=1e-5
    )


def test_analytic_constant_shift():
    """Closed forms: pred = gt + c with gt constant-free data range.
    PSNR = 10 log10(dr^2/c^2); NRMSE = c/rms(gt); SSIM: variance terms
    identical, means shifted -> per-window closed form."""
    gt = np.linspace(0.0, 1.0, 64, dtype=np.float32).reshape(8, 8)
    gt = np.tile(gt, (4, 4))  # 32x32
    c = 0.125
    pred = (gt + c).astype(np.float32)
    dr = float(pred.max() - gt.min())  # joint range = 1 + c
    got_psnr = float(M.psnr(jnp.asarray(gt), jnp.asarray(pred)))
    assert got_psnr == pytest.approx(10 * np.log10(dr**2 / c**2), abs=1e-4)
    got_nrmse = float(M.nrmse(jnp.asarray(gt), jnp.asarray(pred)))
    assert got_nrmse == pytest.approx(
        c / np.sqrt(np.mean(gt.astype(np.float64) ** 2)), abs=1e-6
    )


def test_analytic_identical_images():
    gt = np.random.default_rng(3).uniform(size=(32, 32)).astype(np.float32)
    assert float(M.ssim(jnp.asarray(gt), jnp.asarray(gt))) == pytest.approx(
        1.0, abs=1e-6
    )
    assert float(M.nrmse(jnp.asarray(gt), jnp.asarray(gt))) == 0.0


def test_valid_windows_equal_filter_then_crop():
    """Our VALID-window SSIM equals skimage's filter-everywhere-then-crop:
    for interior pixels the reflected border never enters the window, so
    the two formulations are identical — verified numerically."""
    rng = np.random.default_rng(9)
    a = rng.uniform(size=(20, 24)).astype(np.float32)
    full = uniform_filter(a.astype(np.float64), size=7)
    pad = 3
    cropped = full[pad:-pad, pad:-pad]
    # VALID means via cumsum integral image (independent of scipy)
    from numpy.lib.stride_tricks import sliding_window_view

    valid = sliding_window_view(a.astype(np.float64), (7, 7)).mean(axis=(2, 3))
    np.testing.assert_allclose(valid, cropped, atol=1e-12)
