import jax
import jax.numpy as jnp
import numpy as np

from mri_inr_tpu.data import kspace


def test_fft_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(4, 64, 64)).astype(np.complex64))
    back = kspace.ifft2c(kspace.fft2c(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_fft_orthonormal(rng):
    """ortho norm: energy is preserved."""
    x = jnp.asarray(rng.normal(size=(32, 32)).astype(np.complex64))
    k = kspace.fft2c(x)
    np.testing.assert_allclose(
        np.sum(np.abs(np.asarray(k)) ** 2),
        np.sum(np.abs(np.asarray(x)) ** 2),
        rtol=1e-5,
    )


def test_fft_centered_dc():
    """A constant image has all its energy in the center k-space bin."""
    x = jnp.ones((16, 16), jnp.complex64)
    k = np.array(kspace.fft2c(x))
    assert abs(k[8, 8]) > 1.0
    k[8, 8] = 0
    np.testing.assert_allclose(k, 0, atol=1e-5)


def test_random_mask_center_kept():
    key = jax.random.key(0)
    mask = np.asarray(kspace.random_mask(key, 320, 0.08, 4))
    num_low = round(320 * 0.08)
    pad = (320 - num_low + 1) // 2
    assert mask[pad : pad + num_low].all()


def test_random_mask_expected_fraction():
    """Mean retained fraction over many draws approaches 1/acceleration."""
    keys = jax.random.split(jax.random.key(1), 200)
    fracs = [
        np.asarray(kspace.random_mask(k, 320, 0.05, 6)).mean() for k in keys
    ]
    assert abs(np.mean(fracs) - 1 / 6) < 0.01


def test_apply_mask_zeroes_columns():
    k = jnp.ones((2, 8, 8), jnp.complex64)
    mask = jnp.array([True, False] * 4)
    out = np.asarray(kspace.apply_mask(k, mask))
    assert (out[..., 1::2] == 0).all()
    assert (out[..., ::2] == 1).all()


def test_normalize_scan():
    vol = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 3, 4) + 5)
    out = np.asarray(kspace.normalize_scan(vol))
    assert out.min() == 0.0 and out.max() == 1.0


def test_reconstruct_magnitude_matches_phantom():
    """fft2c then reconstruct_magnitude recovers the phantom."""
    from mri_inr_tpu.data import synthetic

    vol = synthetic.phantom_volume(0, num_slices=2, height=64, width=64)
    k = jnp.asarray(synthetic.volume_to_kspace(vol))
    recon = np.asarray(kspace.reconstruct_magnitude(k))
    np.testing.assert_allclose(recon, vol, atol=1e-4)
