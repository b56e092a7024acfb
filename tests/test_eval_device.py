"""Device-resident metric sweep (round-5 headline path): the slice stacks
stay in HBM end-to-end and the sweep is one dispatch per image shape with a
single (3, K) fetch. Must produce the SAME results as the per-slice loop —
offline (bulk-upload path) and online (zero-image-transfer path), sharded
and unsharded, including the bucket padding trim."""

import numpy as np
import pytest

from mri_inr_tpu.data import synthetic
from mri_inr_tpu.data.dataset import MRISampler
from mri_inr_tpu.data.online import OnlineKspaceDataset, OnlineSampler
from mri_inr_tpu.data.preprocessing import process_files
from mri_inr_tpu.eval.evaluate import (
    SliceReconstructor,
    evaluate_files,
    evaluate_files_device,
)
from mri_inr_tpu.models.modulated_siren import ModulatedSiren


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    synthetic.write_synthetic_h5(d, num_files=3, num_slices=3, height=64, width=64)
    meta = process_files(d)
    return d, meta


@pytest.fixture(scope="module")
def setup():
    import jax
    import jax.numpy as jnp

    model = ModulatedSiren(dim_hidden=32, latent_dim=32, num_layers=3)
    params = model.init(jax.random.key(0), jnp.zeros((2, 32, 32)))["params"]

    def apply_fn(p, tiles):
        return model.apply({"params": p}, tiles, deterministic=True)

    recon = SliceReconstructor(apply_fn, patch_bucket=64)
    return params, recon


def _rows(results):
    return sorted((r.slice_id, r.psnr, r.ssim, r.nrmse) for r in results)


def test_device_sweep_matches_per_slice_offline(corpus, setup):
    _, meta = corpus
    params, recon = setup
    ref = evaluate_files(recon, params, MRISampler(meta), progress_every=0)
    got, timings = evaluate_files_device(
        recon, params, MRISampler(meta), bucket=4, log=lambda *_: None
    )
    assert len(got) == len(ref) == 9
    for (ia, pa, sa, na), (ib, pb, sb, nb) in zip(_rows(ref), _rows(got)):
        assert ia == ib
        np.testing.assert_allclose([pa, sa, na], [pb, sb, nb], rtol=1e-5)
    assert set(timings) == {
        "stage_seconds", "dispatch_seconds", "execute_fetch_seconds"
    }


def test_device_sweep_online_zero_host_transfer(corpus, setup):
    """Online mode: stacks come straight from HBM (device_stacks) and the
    results equal the per-slice host path's."""
    d, _ = corpus
    params, recon = setup
    ds = OnlineKspaceDataset(d, remask_each_epoch=False, max_slice_num=None)
    ref = evaluate_files(
        recon, params, OnlineSampler(ds, host_prefetch=True), progress_every=0
    )
    sampler = OnlineSampler(ds, host_prefetch=False)
    ids, fully, under = sampler.device_stacks()
    import jax

    assert isinstance(fully, jax.Array) and isinstance(under, jax.Array)
    got, _ = evaluate_files_device(
        recon, params, sampler, bucket=4, log=lambda *_: None
    )
    assert len(got) == len(ref)
    for (ia, pa, sa, na), (ib, pb, sb, nb) in zip(_rows(ref), _rows(got)):
        assert ia == ib
        np.testing.assert_allclose([pa, sa, na], [pb, sb, nb], rtol=1e-5)


def test_device_sweep_shard_and_truncation(corpus, setup):
    """Sharded device sweeps partition the unsharded result set; the
    num_samples cap truncates the serving order."""
    d, _ = corpus
    params, recon = setup
    ds = OnlineKspaceDataset(d, remask_each_epoch=False, max_slice_num=None)
    full_sampler = OnlineSampler(ds, host_prefetch=False)
    full, _ = evaluate_files_device(
        recon, params, full_sampler, bucket=4, log=lambda *_: None
    )
    shards = []
    for i in range(2):
        s = OnlineSampler(ds, host_prefetch=False).shard(i, 2)
        res, _ = evaluate_files_device(
            recon, params, s, bucket=4, log=lambda *_: None
        )
        shards.extend(res)
    assert _rows(shards) == _rows(full)

    capped, _ = evaluate_files_device(
        recon, params, OnlineSampler(ds, host_prefetch=False),
        num_samples=5, bucket=4, log=lambda *_: None,
    )
    assert len(capped) == 5
    assert all(row in _rows(full) for row in _rows(capped))


def test_device_sweep_honors_sampler_counter(corpus, setup):
    """A partially-consumed sampler (e.g. after a visual pass) must leave
    the device sweep scoring the SAME slices the host path would (r5
    review: device_stacks used to restart at order[0])."""
    d, _ = corpus
    params, recon = setup
    ds = OnlineKspaceDataset(d, remask_each_epoch=False, max_slice_num=None)

    host = OnlineSampler(ds, host_prefetch=True)
    host.next_sample(); host.next_sample()  # visual pass consumes 2
    ref = evaluate_files(recon, params, host, num_samples=5, progress_every=0)

    dev = OnlineSampler(ds, host_prefetch=False)
    dev.next_sample(); dev.next_sample()
    got, _ = evaluate_files_device(
        recon, params, dev, num_samples=5, bucket=4, log=lambda *_: None
    )
    assert [r.slice_id for r in got] == [r.slice_id for r in ref]
    for a, b in zip(ref, got):
        np.testing.assert_allclose(
            [a.psnr, a.ssim, a.nrmse], [b.psnr, b.ssim, b.nrmse], rtol=1e-5
        )


def test_eval_images_stay_epoch0_during_remask_training(corpus):
    """Remask training materializes epoch-e tiles, but every eval consumer
    (get_slice, device_image_stacks) promises epoch-0 masks (r5 review:
    a cached current-epoch image stack once leaked through)."""
    d, _ = corpus
    ds_train = OnlineKspaceDataset(d, remask_each_epoch=True, max_slice_num=None)
    ds_train.materialize(7)  # training at epoch 7: fresh masks
    got = ds_train.get_slice(0)

    ds_fresh = OnlineKspaceDataset(d, remask_each_epoch=True, max_slice_num=None)
    want = ds_fresh.get_slice(0)
    np.testing.assert_array_equal(got.undersampled, want.undersampled)
    np.testing.assert_array_equal(got.fully_sampled, want.fully_sampled)

    _, under0 = ds_train.device_image_stacks()
    _, under0_fresh = ds_fresh.device_image_stacks()
    np.testing.assert_array_equal(np.asarray(under0), np.asarray(under0_fresh))
