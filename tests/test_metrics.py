import jax.numpy as jnp
import numpy as np
import pytest

from mri_inr_tpu.eval import metrics


def _naive_ssim(x, y, data_range, win=7):
    """Independent sliding-window SSIM with skimage-default constants, for
    cross-checking the vectorized JAX implementation."""
    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    h, w = x.shape
    vals = []
    n = win * win
    for i in range(h - win + 1):
        for j in range(w - win + 1):
            a = x[i : i + win, j : j + win].ravel()
            b = y[i : i + win, j : j + win].ravel()
            ua, ub = a.mean(), b.mean()
            va = ((a - ua) ** 2).sum() / (n - 1)
            vb = ((b - ub) ** 2).sum() / (n - 1)
            vab = ((a - ua) * (b - ub)).sum() / (n - 1)
            s = ((2 * ua * ub + c1) * (2 * vab + c2)) / (
                (ua**2 + ub**2 + c1) * (va + vb + c2)
            )
            vals.append(s)
    return np.mean(vals)


def test_psnr_manual(rng):
    gt = rng.uniform(size=(32, 32)).astype(np.float32)
    pred = gt + rng.normal(scale=0.05, size=gt.shape).astype(np.float32)
    dr = max(gt.max(), pred.max()) - min(gt.min(), pred.min())
    expected = 10 * np.log10(dr**2 / np.mean((gt - pred) ** 2))
    got = float(metrics.psnr(jnp.asarray(gt), jnp.asarray(pred)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_psnr_identical_is_inf(rng):
    x = jnp.asarray(rng.uniform(size=(8, 8)).astype(np.float32))
    assert np.isinf(float(metrics.psnr(x, x)))


def test_ssim_identical_is_one(rng):
    x = jnp.asarray(rng.uniform(size=(32, 32)).astype(np.float32))
    assert float(metrics.ssim(x, x)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_matches_naive(rng):
    gt = rng.uniform(size=(24, 20)).astype(np.float32)
    pred = np.clip(
        gt + rng.normal(scale=0.1, size=gt.shape).astype(np.float32), 0, 1
    )
    dr = float(max(gt.max(), pred.max()) - min(gt.min(), pred.min()))
    got = float(metrics.ssim(jnp.asarray(gt), jnp.asarray(pred)))
    expected = _naive_ssim(gt, pred, dr)
    assert got == pytest.approx(expected, abs=1e-5)


def test_ssim_decreases_with_noise(rng):
    gt = rng.uniform(size=(64, 64)).astype(np.float32)
    s = []
    for scale in (0.01, 0.05, 0.2):
        noisy = gt + rng.normal(scale=scale, size=gt.shape).astype(np.float32)
        s.append(float(metrics.ssim(jnp.asarray(gt), jnp.asarray(noisy))))
    assert s[0] > s[1] > s[2]


def test_nrmse_manual(rng):
    gt = rng.uniform(size=(16, 16)).astype(np.float32) + 0.5
    pred = gt + rng.normal(scale=0.02, size=gt.shape).astype(np.float32)
    expected = np.sqrt(np.mean((gt - pred) ** 2)) / np.sqrt(np.mean(gt**2))
    got = float(metrics.nrmse(jnp.asarray(gt), jnp.asarray(pred)))
    assert got == pytest.approx(expected, rel=1e-5)


def test_image_metrics_bundle(rng):
    gt = jnp.asarray(rng.uniform(size=(32, 32)).astype(np.float32))
    pred = gt * 0.9
    out = metrics.image_metrics(gt, pred)
    assert set(out) == {"psnr", "ssim", "nrmse"}
    assert float(out["psnr"]) > 10
