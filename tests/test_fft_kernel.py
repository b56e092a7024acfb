"""MXU-DFT kernel vs the jnp.fft reference pipeline (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mri_inr_tpu.data import kspace
from mri_inr_tpu.ops import fft_kernel


def _random_kspace(shape, seed=0):
    rng = np.random.default_rng(seed)
    k = rng.normal(size=shape) + 1j * rng.normal(size=shape)
    return k.astype(np.complex64)


@pytest.mark.parametrize("h,w", [(64, 64), (96, 64), (63, 33)])
def test_idft_matches_ifft2c(h, w):
    k = _random_kspace((3, h, w))
    ri = kspace.to_ri(k)
    got = fft_kernel.dft2c_ri(jnp.asarray(ri), inverse=True, interpret=True)
    ref = kspace.ifft2c(jnp.asarray(k))
    np.testing.assert_allclose(
        np.asarray(got[..., 0]), np.asarray(ref.real), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(got[..., 1]), np.asarray(ref.imag), atol=2e-5
    )


def test_forward_dft_matches_fft2c():
    k = _random_kspace((2, 64, 48), seed=1)
    ri = kspace.to_ri(k)
    got = fft_kernel.dft2c_ri(jnp.asarray(ri), inverse=False, interpret=True)
    ref = kspace.fft2c(jnp.asarray(k))
    np.testing.assert_allclose(
        np.asarray(got[..., 0]), np.asarray(ref.real), atol=2e-5
    )


def test_fused_magnitude_matches_reconstruct():
    k = _random_kspace((4, 64, 64), seed=2)
    ri = jnp.asarray(kspace.to_ri(k))
    got = fft_kernel.reconstruct_magnitude_ri_mxu(ri, interpret=True)
    ref = kspace.reconstruct_magnitude_ri(ri)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_roundtrip_identity():
    k = _random_kspace((1, 64, 64), seed=3)
    ri = jnp.asarray(kspace.to_ri(k))
    img = fft_kernel.dft2c_ri(ri, inverse=True, interpret=True)
    back = fft_kernel.dft2c_ri(img, inverse=False, interpret=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(ri), atol=3e-5)
