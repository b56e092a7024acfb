import jax.numpy as jnp
import numpy as np
import pytest

from mri_inr_tpu.ops import tiling
from mri_inr_tpu.data.dataset import tile_image_np

OUTER, INNER, SIREN = 32, 16, 24


def test_patch_count_and_shape(rng):
    img = jnp.asarray(rng.normal(size=(320, 320)).astype(np.float32))
    patches = tiling.image_to_patches(img, OUTER, INNER)
    nv, nh = tiling.grid_shape(320, 320, INNER)
    assert (nv, nh) == (20, 20)
    assert patches.shape == (400, OUTER, OUTER)


def test_patch_center_matches_image(rng):
    """The inner 16x16 window of patch (r, c) is exactly the image block at
    (r*16, c*16)."""
    img = rng.normal(size=(64, 48)).astype(np.float32)
    patches = np.asarray(tiling.image_to_patches(jnp.asarray(img), OUTER, INNER))
    nv, nh = tiling.grid_shape(64, 48, INNER)
    pad = (OUTER - INNER) // 2
    for r in range(nv):
        for c in range(nh):
            p = patches[r * nh + c]
            np.testing.assert_array_equal(
                p[pad : pad + INNER, pad : pad + INNER],
                img[r * INNER : (r + 1) * INNER, c * INNER : (c + 1) * INNER],
            )


def test_numpy_and_jax_tiling_agree(rng):
    img = rng.normal(size=(70, 90)).astype(np.float32)
    jp = np.asarray(tiling.image_to_patches(jnp.asarray(img), OUTER, INNER))
    npp, grid = tile_image_np(img, OUTER, INNER)
    assert grid == tiling.grid_shape(70, 90, INNER)
    np.testing.assert_array_equal(jp, npp)


def test_fold_unfold_identity(rng):
    """Unweighted recomposition of the patches reproduces the image
    (overlap-average of identical values is the value)."""
    img = rng.uniform(size=(64, 64)).astype(np.float32)
    patches = tiling.image_to_patches(jnp.asarray(img), OUTER, INNER)
    grid = tiling.grid_shape(64, 64, INNER)
    recon = np.asarray(tiling.patches_to_image(patches, grid, OUTER, INNER))
    np.testing.assert_allclose(recon, img, atol=1e-5)


def test_weighted_fold_identity(rng):
    """Weighted recomposition of center-cropped (siren-sized) patches also
    reproduces the image: weighting is a convex combination per pixel."""
    img = rng.uniform(size=(96, 64)).astype(np.float32)
    patches = tiling.image_to_patches(jnp.asarray(img), OUTER, INNER)
    centers = tiling.extract_center_batch(patches, OUTER, SIREN)
    grid = tiling.grid_shape(96, 64, INNER)
    recon = np.asarray(
        tiling.patches_to_image_weighted_average(centers, grid, SIREN, INNER)
    )
    np.testing.assert_allclose(recon, img, atol=1e-5)


def test_weight_matrix_properties():
    w = np.asarray(tiling.generate_weight_matrix(24))
    assert w.shape == (24, 24)
    assert w.max() == pytest.approx(1.0)
    assert (w > 0).all()
    # radially symmetric: corner weights equal
    assert w[0, 0] == pytest.approx(w[-1, -1])
    assert w[0, -1] == pytest.approx(w[-1, 0])
    # center-heavier than corner
    assert w[11, 11] > w[0, 0]
    # exact value of corner: exp(-0.1*(sqrt(2)*11.5)) / exp(-0.1*sqrt(0.5))
    center = 11.5
    dist_corner = np.sqrt(2) * center
    dist_min = np.sqrt(0.5)  # nearest pixel to fractional center
    expected = np.exp(-0.1 * dist_corner) / np.exp(-0.1 * dist_min)
    assert w[0, 0] == pytest.approx(expected, rel=1e-5)


def test_extract_center_batch(rng):
    patches = jnp.asarray(rng.normal(size=(5, 32, 32)).astype(np.float32))
    centers = np.asarray(tiling.extract_center_batch(patches, 32, 24))
    np.testing.assert_array_equal(centers, np.asarray(patches)[:, 4:28, 4:28])


def test_black_patch_classification():
    patches = jnp.stack(
        [jnp.zeros((32, 32)), jnp.full((32, 32), 0.5), jnp.full((32, 32), 1e-12)]
    )
    valid = np.asarray(tiling.classify_black_patches(patches))
    np.testing.assert_array_equal(valid, [False, True, False])


def test_mask_black_patches_equivalent_to_reintegration(rng):
    """Masking model outputs to zero + weighted fold == filtering black
    patches, running the model, and reintegrating zeros (the reference's
    eval path)."""
    img = rng.uniform(size=(64, 64)).astype(np.float32)
    img[:20] = 0.0  # black band -> some black patches
    patches = tiling.image_to_patches(jnp.asarray(img), OUTER, INNER)
    valid = tiling.classify_black_patches(patches)
    outputs = tiling.extract_center_batch(patches, OUTER, SIREN)

    masked = tiling.mask_black_patches(outputs, valid)
    grid = tiling.grid_shape(64, 64, INNER)
    via_mask = np.asarray(
        tiling.patches_to_image_weighted_average(masked, grid, SIREN, INNER)
    )

    # explicit reintegration: zero the black patches by hand
    explicit = np.asarray(outputs).copy()
    explicit[~np.asarray(valid)] = 0.0
    via_reint = np.asarray(
        tiling.patches_to_image_weighted_average(
            jnp.asarray(explicit), grid, SIREN, INNER
        )
    )
    np.testing.assert_allclose(via_mask, via_reint, atol=1e-7)


def test_batch_tiling(rng):
    imgs = jnp.asarray(rng.normal(size=(3, 64, 64)).astype(np.float32))
    batch = tiling.batch_images_to_patches(imgs, OUTER, INNER)
    assert batch.shape == (3, 16, OUTER, OUTER)
    single = tiling.image_to_patches(imgs[1], OUTER, INNER)
    np.testing.assert_array_equal(np.asarray(batch[1]), np.asarray(single))
