"""Online k-space pipeline (data/online.py): offline parity + remasking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mri_inr_tpu.data import synthetic
from mri_inr_tpu.data.dataset import MRIDataset
from mri_inr_tpu.data.online import OnlineKspaceDataset
from mri_inr_tpu.data.preprocessing import process_files


@pytest.fixture(scope="module")
def h5_root(tmp_path_factory):
    d = tmp_path_factory.mktemp("online_data")
    synthetic.write_synthetic_h5(d, num_files=3, num_slices=3, height=64, width=48)
    process_files(d)
    return d


def test_offline_parity(h5_root):
    """remask off: the online device pipeline reproduces the offline .npy
    pipeline's tiles (same stable mask keys, same normalize, same tiling)."""
    offline = MRIDataset(h5_root / "processed" / "metadata.csv")
    online = OnlineKspaceDataset(h5_root, remask_each_epoch=False)
    assert len(online) == len(offline)
    fully, under = online.materialize(epoch=7)  # epoch must not matter
    np.testing.assert_allclose(
        np.asarray(fully), offline.fully_tiles, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(under), offline.under_tiles, atol=2e-6
    )


def test_offline_parity_with_slice_truncation(tmp_path):
    """Volumes with MORE slices than max_slice_num keeps: normalization
    must still cover the FULL volume (the offline pipeline normalizes
    before filtering, ``process_files`` -> ``_select_rows``) — the r4
    code-review caught a truncate-before-normalize variant of this."""
    synthetic.write_synthetic_h5(
        tmp_path, num_files=2, num_slices=5, height=64, width=48
    )
    meta = process_files(tmp_path)
    offline = MRIDataset(meta, max_slice_num=2)
    online = OnlineKspaceDataset(
        tmp_path, max_slice_num=2, remask_each_epoch=False
    )
    assert len(online) == len(offline)
    fully, under = online.materialize(0)
    np.testing.assert_allclose(
        np.asarray(fully), offline.fully_tiles, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(under), offline.under_tiles, atol=2e-6
    )


def test_remask_changes_under_not_fully(h5_root):
    online = OnlineKspaceDataset(h5_root, remask_each_epoch=True)
    f0, u0 = online.materialize(0)
    f1, u1 = online.materialize(1)
    assert f0 is f1  # fully tiles have no mask dependency: computed once
    assert bool(jnp.any(u0 != u1))  # fresh masks
    _, u0b = online.materialize(0)
    np.testing.assert_array_equal(np.asarray(u0), np.asarray(u0b))


def test_epoch0_matches_offline_masks(h5_root):
    """Even with remasking on, epoch 0 equals the offline masks (fold_in of
    the stable key with epoch 0 is still deterministic, but differs from the
    un-folded key) — assert determinism rather than offline equality."""
    a = OnlineKspaceDataset(h5_root, remask_each_epoch=True)
    b = OnlineKspaceDataset(h5_root, remask_each_epoch=True)
    _, ua = a.materialize(3)
    _, ub = b.materialize(3)
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))


def test_batches_and_get_slice(h5_root):
    online = OnlineKspaceDataset(h5_root, remask_each_epoch=True)
    n = len(online)
    batch = 7
    got = 0
    for f, u in online.batches(batch, seed=0):
        assert f.shape == (batch, 32, 32) and u.shape == (batch, 32, 32)
        got += batch
    assert got == -(-n // batch) * batch
    pair = online.get_slice(0)
    assert pair.fully_sampled.shape == (64, 48)
    assert pair.slice_id.endswith("_0")


def test_trainer_scan_epoch_with_online(h5_root):
    """The scan-epoch trainer consumes the online dataset end-to-end and
    the loss decreases."""
    from mri_inr_tpu.models.modulated_siren import ModulatedSiren
    from mri_inr_tpu.train import losses
    from mri_inr_tpu.train.trainer import Trainer, create_train_state

    online = OnlineKspaceDataset(h5_root, remask_each_epoch=True)
    model = ModulatedSiren(dim_hidden=32, latent_dim=32, num_layers=2,
                           dropout=0.0)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((2, 32, 32)), "adam", 1e-3
    )
    trainer = Trainer(
        model, state, losses.mse, online, online,
        run_dir="/tmp/online_trainer_test", batch_size=32,
        device_data=True, snapshot_slices=0, save_interval=1000,
    )
    l0 = trainer._epoch_loss(online, train=False, epoch=0)
    for e in range(3):
        trainer._epoch_loss(online, train=True, epoch=e)
    l1 = trainer._epoch_loss(online, train=False, epoch=3)
    assert trainer.device_data  # took the scan path, not the fallback
    assert l1 < l0


def test_online_sampler_matches_offline_eval(h5_root):
    """OnlineSampler (no-disk eval) serves the same slices in the same
    seed-42 order with the same pixel content as MRISampler over the
    offline-preprocessed metadata — so eval metrics are identical."""
    from mri_inr_tpu.data.dataset import MRISampler
    from mri_inr_tpu.data.online import OnlineSampler

    offline = MRISampler(h5_root / "processed" / "metadata.csv")
    online = OnlineSampler(
        OnlineKspaceDataset(h5_root, remask_each_epoch=False)
    )
    assert len(online) == len(offline)
    for _ in range(len(offline)):
        a = offline.next_sample()
        b = online.next_sample()
        assert a.slice_id == b.slice_id
        np.testing.assert_allclose(a.fully_sampled, b.fully_sampled, atol=2e-6)
        np.testing.assert_allclose(a.undersampled, b.undersampled, atol=2e-6)

    # shard contract matches too
    s0, s1 = online.shard(0, 2), online.shard(1, 2)
    o0 = offline.shard(0, 2)
    assert len(s0) + len(s1) == len(offline)
    assert s0.next_sample().slice_id == o0.next_sample().slice_id
