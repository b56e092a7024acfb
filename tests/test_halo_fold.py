"""Distributed halo-exchange fold vs the single-device fold (8-virtual-
device CPU mesh; SURVEY §4/§5 — sharded results must match)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mri_inr_tpu.ops import tiling
from mri_inr_tpu.parallel import halo_fold, mesh as mesh_lib

SIREN, INNER = 24, 16


@pytest.mark.parametrize("nv,nh", [(8, 5), (16, 3), (8, 1)])
def test_matches_single_device(nv, nh):
    rng = np.random.default_rng(0)
    patches = jnp.asarray(
        rng.uniform(size=(nv * nh, SIREN, SIREN)).astype(np.float32)
    )
    mesh = mesh_lib.make_mesh()
    want = tiling.patches_to_image_weighted_average(
        patches, (nv, nh), SIREN, INNER
    )
    sharded = halo_fold.shard_patches_by_rows(mesh, patches)
    got = halo_fold.sharded_patches_to_image_weighted_average(
        sharded, (nv, nh), SIREN, INNER, mesh
    )
    assert got.shape == want.shape == (nv * INNER, nh * INNER)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_rejects_indivisible_rows():
    mesh = mesh_lib.make_mesh()
    patches = jnp.zeros((3 * 2, SIREN, SIREN))
    with pytest.raises(ValueError, match="divisible"):
        halo_fold.sharded_patches_to_image_weighted_average(
            patches, (3, 2), SIREN, INNER, mesh
        )


def test_single_device_mesh_identity():
    mesh = mesh_lib.make_mesh(num_devices=1)
    rng = np.random.default_rng(1)
    patches = jnp.asarray(rng.uniform(size=(4 * 4, SIREN, SIREN)).astype(np.float32))
    want = tiling.patches_to_image_weighted_average(patches, (4, 4), SIREN, INNER)
    got = halo_fold.sharded_patches_to_image_weighted_average(
        patches, (4, 4), SIREN, INNER, mesh
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
