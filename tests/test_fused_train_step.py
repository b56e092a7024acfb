"""Trainer integration of the fused Pallas training kernels: single-device
step, shard_map'd mesh step (8 virtual CPU devices), and the one-dispatch
scan epoch (all interpret mode on CPU; Mosaic compilation is covered by
benchmarks/bench_train.py on the chip)."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from mri_inr_tpu.data import synthetic
from mri_inr_tpu.data.dataset import MRIDataset
from mri_inr_tpu.data.preprocessing import process_files
from mri_inr_tpu.models.modulated_siren import ModulatedSiren
from mri_inr_tpu.parallel import mesh as mesh_lib
from mri_inr_tpu.train import losses
from mri_inr_tpu.train.trainer import (
    Trainer,
    create_train_state,
    make_epoch_perm,
    make_scan_epoch,
    make_train_step,
)


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    synthetic.write_synthetic_h5(d, num_files=2, num_slices=2, height=64, width=64)
    meta = process_files(d)
    train = MRIDataset(meta, max_slice_num=10)
    val = MRIDataset(meta, max_slice_num=0)
    return train, val


@pytest.fixture(scope="module")
def model():
    return ModulatedSiren(dim_hidden=32, latent_dim=32, num_layers=2, dropout=0.1)


def _state(model, opt="adam", lr=1e-3):
    return create_train_state(
        model, jax.random.key(0), jnp.zeros((4, 32, 32)), opt, lr
    )


def test_fused_train_step_reduces_loss(tiny_data, model):
    train, _ = tiny_data
    state = _state(model)
    step = make_train_step(model, losses.mse, 32, 24, use_pallas=True, interpret=True)
    fully, under = next(train.batches(32, seed=0))
    fully, under = jnp.asarray(fully), jnp.asarray(under)
    rng = jax.random.key(1)
    first = None
    for _ in range(20):
        state, loss = step(state, fully, under, rng)
        if first is None:
            first = float(loss)
    assert float(loss) < first * 0.9


def test_fused_sharded_step_matches_single(tiny_data):
    """shard_map'd fused step == single-device fused step (dropout off so
    the per-device RNG fold does not change the math)."""
    model = ModulatedSiren(dim_hidden=32, latent_dim=32, num_layers=2, dropout=0.0)
    rng = jax.random.key(3)
    data = np.random.default_rng(0)
    fully = jnp.asarray(data.uniform(size=(16, 32, 32)).astype(np.float32))
    under = jnp.asarray(data.uniform(size=(16, 32, 32)).astype(np.float32))
    mesh = mesh_lib.make_mesh()

    state_a = _state(model, "sgd", 1e-2)
    state_b = _state(model, "sgd", 1e-2)
    step_single = make_train_step(
        model, losses.mse, 32, 24, use_pallas=True, interpret=True
    )
    step_sharded = make_train_step(
        model, losses.mse, 32, 24, mesh=mesh, use_pallas=True, interpret=True
    )
    state_a, loss_a = step_single(state_a, fully, under, rng)
    f_s, u_s = mesh_lib.shard_batch(mesh, fully, under)
    state_b, loss_b = step_sharded(state_b, f_s, u_s, rng)
    assert float(loss_b) == pytest.approx(float(loss_a), rel=1e-5)
    pa, _ = jax.flatten_util.ravel_pytree(state_a.params)
    pb, _ = jax.flatten_util.ravel_pytree(state_b.params)
    # pmean-of-shard-means vs one global mean: fp32 reduction-order noise
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-5)


def test_scan_epoch_matches_host_loop(tiny_data, model):
    """Trainer(device_data=True) runs the epoch as one lax.scan dispatch
    with identical batch composition and dropout keys -> identical losses
    and parameters as the per-batch host loop."""
    train, val = tiny_data

    def run(device_data, tmp):
        trainer = Trainer(
            model,
            _state(model),
            losses.mse,
            train,
            val,
            run_dir=tmp,
            batch_size=32,
            save_interval=1000,
            device_data=device_data,
        )
        l0 = trainer._epoch_loss(train, train=True, epoch=0)
        l1 = trainer._epoch_loss(train, train=True, epoch=1)
        lv = trainer._epoch_loss(val, train=False, epoch=0)
        p, _ = jax.flatten_util.ravel_pytree(trainer.state.params)
        return (l0, l1, lv), np.asarray(p)

    import tempfile

    with tempfile.TemporaryDirectory() as t1, tempfile.TemporaryDirectory() as t2:
        losses_host, params_host = run(False, t1)
        losses_scan, params_scan = run(True, t2)
    for lh, ls in zip(losses_host, losses_scan):
        assert ls == pytest.approx(lh, rel=1e-5)
    np.testing.assert_allclose(params_scan, params_host, atol=1e-6)


def test_epoch_perm_matches_dataset_batches(tiny_data):
    """make_epoch_perm reproduces MRIDataset.batches' composition."""
    train, _ = tiny_data
    perm = make_epoch_perm(len(train), 32, seed=4, shuffle=True)
    got = [
        (f.copy(), u.copy()) for f, u in train.batches(32, seed=4, shuffle=True)
    ]
    assert perm.shape[0] == len(got)
    for row, (f, u) in zip(perm, got):
        np.testing.assert_array_equal(train.fully_tiles[row], f)
        np.testing.assert_array_equal(train.under_tiles[row], u)
