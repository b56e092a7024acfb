import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mri_inr_tpu.data import synthetic
from mri_inr_tpu.data.dataset import MRIDataset
from mri_inr_tpu.data.preprocessing import process_files
from mri_inr_tpu.models.modulated_siren import ModulatedSiren
from mri_inr_tpu.train import checkpoint as ckpt_lib
from mri_inr_tpu.train import losses
from mri_inr_tpu.train.trainer import (
    Trainer,
    create_train_state,
    make_eval_step,
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
def tiny_model():
    return ModulatedSiren(dim_hidden=32, latent_dim=32, num_layers=2, dropout=0.1)


def test_train_step_reduces_loss(tiny_data, tiny_model):
    train, _ = tiny_data
    state = create_train_state(
        tiny_model, jax.random.key(0), jnp.zeros((4, 32, 32)), "adam", 1e-3
    )
    step = make_train_step(tiny_model, losses.mse, 32, 24)
    fully, under = next(train.batches(32, seed=0))
    fully, under = jnp.asarray(fully), jnp.asarray(under)
    rng = jax.random.key(1)
    first_loss = None
    for i in range(30):
        state, loss = step(state, fully, under, rng)
        if first_loss is None:
            first_loss = float(loss)
    assert float(loss) < first_loss * 0.9


def test_eval_step_deterministic(tiny_data, tiny_model):
    train, _ = tiny_data
    state = create_train_state(
        tiny_model, jax.random.key(0), jnp.zeros((4, 32, 32)), "adam", 1e-3
    )
    eval_step = make_eval_step(tiny_model, losses.mse, 32, 24)
    fully, under = next(train.batches(16, seed=0))
    l1 = float(eval_step(state, jnp.asarray(fully), jnp.asarray(under)))
    l2 = float(eval_step(state, jnp.asarray(fully), jnp.asarray(under)))
    assert l1 == l2


def test_checkpoint_roundtrip(tmp_path, tiny_model):
    state = create_train_state(
        tiny_model, jax.random.key(0), jnp.zeros((2, 32, 32)), "adam", 1e-3
    )
    run_dir = ckpt_lib.new_run_dir(tmp_path, "testrun")
    ckpt_lib.save_state(run_dir, 7, state)
    assert ckpt_lib.find_latest_step(run_dir) == 7
    restored = ckpt_lib.restore_state(run_dir, 7, state)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.params,
        restored.params,
    )


def test_resume_discovery(tmp_path):
    assert ckpt_lib.resolve_resume(tmp_path, "runx") is None
    d1 = ckpt_lib.new_run_dir(tmp_path, "runx", "2026-01-01_00-00-00")
    d2 = ckpt_lib.new_run_dir(tmp_path, "runx", "2026-02-01_00-00-00")
    other = ckpt_lib.new_run_dir(tmp_path, "other", "2026-03-01_00-00-00")
    (d1 / "checkpoints" / "step_00000005").mkdir(parents=True)
    (d2 / "checkpoints" / "step_00000003").mkdir(parents=True)
    (d2 / "checkpoints" / "step_00000009").mkdir(parents=True)
    (other / "checkpoints" / "step_00000099").mkdir(parents=True)
    run_dir, step = ckpt_lib.resolve_resume(tmp_path, "runx")
    assert run_dir == d2 and step == 9


def test_trainer_smoke(tmp_path, tiny_data, tiny_model):
    """Few-epoch end-to-end: loss decreases, artifacts appear, checkpoint
    restores (SURVEY §4 smoke strategy)."""
    train, val = tiny_data
    state = create_train_state(
        tiny_model, jax.random.key(0), jnp.zeros((4, 32, 32)), "adam", 1e-3
    )
    run_dir = ckpt_lib.new_run_dir(tmp_path, "smoke")
    trainer = Trainer(
        tiny_model,
        state,
        losses.mse,
        train,
        val,
        run_dir,
        batch_size=32,
        save_interval=2,
        snapshot_slices=1,
        log=lambda *a: None,
    )
    t0, v0 = trainer.initial_errors()
    trainer.train(epochs=4)
    progress = trainer._progress
    assert len(progress) == 4
    assert progress[-1]["train_loss"] < t0
    assert (run_dir / "progress_log.csv").exists()
    assert (run_dir / "progress_log.txt").exists()
    snaps = list((run_dir / "snapshots").glob("*.png"))
    assert snaps, "snapshot renders missing"
    step = ckpt_lib.find_latest_step(run_dir)
    assert step is not None and step > 0
    restored = ckpt_lib.restore_state(run_dir, step, trainer.state)
    assert int(restored.step) == step


def test_splice_pretrained_encoder(tiny_model):
    from mri_inr_tpu.models.encoder import ConvAutoencoder
    from mri_inr_tpu.train.trainer import splice_pretrained_encoder

    model = ModulatedSiren(dim_hidden=32, latent_dim=8, num_layers=2)
    params = model.init(jax.random.key(0), jnp.zeros((2, 32, 32)))["params"]
    ae = ConvAutoencoder(latent_dim=8)
    ae_params = ae.init(jax.random.key(1), jnp.zeros((2, 32, 32)))["params"]
    spliced = splice_pretrained_encoder(params, ae_params)
    np.testing.assert_array_equal(
        np.asarray(spliced["encoder"]["encoder"]["conv1"]["kernel"]),
        np.asarray(ae_params["encoder"]["conv1"]["kernel"]),
    )
    # model still runs with spliced params
    out = model.apply({"params": spliced}, jnp.zeros((2, 32, 32)))
    assert out.shape == (2, 24, 24)


def test_trainer_sigterm_preemption(tmp_path, tiny_data, tiny_model):
    """SIGTERM mid-run: finish the epoch, save a final checkpoint, return
    (the preemption half of the SLURM restart contract)."""
    import os
    import signal

    train, val = tiny_data
    state = create_train_state(
        tiny_model, jax.random.key(0), jnp.zeros((4, 32, 32)), "adam", 1e-3
    )
    run_dir = ckpt_lib.new_run_dir(tmp_path, "preempt")

    def log(msg):
        if str(msg).startswith("epoch 0"):
            os.kill(os.getpid(), signal.SIGTERM)

    trainer = Trainer(
        tiny_model, state, losses.mse, train, val, run_dir,
        batch_size=32, save_interval=100, snapshot_slices=1, log=log,
    )
    trainer.train(epochs=10)
    assert len(trainer._progress) == 1  # stopped after epoch 0
    step = ckpt_lib.find_latest_step(run_dir)
    assert step is not None and step > 0
    # the old handler is restored
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.default_int_handler,
    ) or callable(signal.getsignal(signal.SIGTERM))


def test_freeze_encoder_grads():
    """training.freeze_encoder: the latent-encoder (sub)tree stays at its
    initialization across steps while the SIREN/modulator train — the
    reference-splice control experiment's mechanism (RESULTS.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mri_inr_tpu.models.modulated_siren import ModulatedSiren
    from mri_inr_tpu.train import losses
    from mri_inr_tpu.train.trainer import create_train_state, make_train_step

    model = ModulatedSiren(dim_hidden=32, latent_dim=32, num_layers=3,
                           compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    fully = jnp.asarray(rng.uniform(size=(8, 32, 32)).astype(np.float32))
    under = jnp.asarray(rng.uniform(size=(8, 32, 32)).astype(np.float32))
    state = create_train_state(model, jax.random.key(0), under[:2], "adam", 1e-3)
    step = make_train_step(model, losses.mse, 32, 24, freeze_encoder=True)

    before = jax.tree.map(np.asarray, state.params)
    for _ in range(2):
        state, _ = step(state, fully, under, jax.random.key(1))
    after = jax.tree.map(np.asarray, state.params)

    froz_b, _ = jax.flatten_util.ravel_pytree(before["encoder"]["encoder"])
    froz_a, _ = jax.flatten_util.ravel_pytree(after["encoder"]["encoder"])
    np.testing.assert_array_equal(np.asarray(froz_a), np.asarray(froz_b))
    live_b, _ = jax.flatten_util.ravel_pytree(before["net"])
    live_a, _ = jax.flatten_util.ravel_pytree(after["net"])
    assert float(np.abs(np.asarray(live_a) - np.asarray(live_b)).max()) > 0
