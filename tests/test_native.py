"""Native C++ data-pipeline kernels vs their numpy twins (exact equality)."""

import numpy as np
import pytest

from mri_inr_tpu import native


@pytest.fixture(scope="module")
def pool():
    rng = np.random.default_rng(7)
    return rng.uniform(size=(64, 32, 32)).astype(np.float32)


def test_native_builds():
    # the image ships g++, so the native path must be active here
    assert native.have_native()


@pytest.mark.parametrize("shape", [(96, 96), (100, 90), (320, 320), (17, 33)])
def test_tile_matches_numpy(shape):
    rng = np.random.default_rng(0)
    img = rng.uniform(size=shape).astype(np.float32)
    got, grid_got = native.tile_image(img, 32, 16)
    want, grid_want = native._tile_np(img, 32, 16)
    assert grid_got == grid_want
    np.testing.assert_array_equal(got, want)


def test_tile_matches_jax_ops():
    """Host tiler must agree exactly with the jitted device tiler."""
    import jax.numpy as jnp

    from mri_inr_tpu.ops import tiling

    rng = np.random.default_rng(1)
    img = rng.uniform(size=(96, 80)).astype(np.float32)
    host, _ = native.tile_image(img, 32, 16)
    device = np.asarray(tiling.image_to_patches(jnp.asarray(img), 32, 16))
    np.testing.assert_array_equal(host, device)


def test_gather_pairs(pool):
    under = pool[::-1].copy()
    idx = np.array([3, 0, 63, 17, 3], np.int64)
    got_f, got_u = native.gather_pairs(pool, under, idx)
    np.testing.assert_array_equal(got_f, pool[idx])
    np.testing.assert_array_equal(got_u, under[idx])


def test_patch_means(pool):
    got = native.patch_means(pool)
    want = pool.mean(axis=(-2, -1))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_prefetch_iter_order_and_errors():
    from mri_inr_tpu.data.dataset import prefetch_iter

    assert list(prefetch_iter(iter(range(10)), depth=3)) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = prefetch_iter(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer failed"):
        list(it)
