"""Pod-parallel eval sweep plumbing: file sharding, shard-CSV merging, the
single-process gather identity, and the MRISampler ``test_files`` filter
(VERDICT r1 items 3 and 6)."""

import numpy as np
import pytest

from mri_inr_tpu.data import synthetic
from mri_inr_tpu.data.dataset import MRISampler
from mri_inr_tpu.data.preprocessing import process_files
from mri_inr_tpu.eval.evaluate import (
    SliceResult,
    gather_shard_results,
    merge_shard_csvs,
    read_metrics_csv,
    write_metrics_artifacts,
)


@pytest.fixture(scope="module")
def meta(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    synthetic.write_synthetic_h5(d, num_files=3, num_slices=2, height=64, width=64)
    return process_files(d)


def _results(ids):
    rng = np.random.default_rng(0)
    return [
        SliceResult(slice_id=s, psnr=float(rng.uniform(20, 30)),
                    ssim=float(rng.uniform(0.7, 0.9)),
                    nrmse=float(rng.uniform(0.2, 0.4)))
        for s in ids
    ]


def test_shards_partition_the_file_set(meta):
    sampler = MRISampler(meta)
    ids = [r["slice_id"] for r in sampler.rows]
    s0 = MRISampler(meta).shard(0, 2)
    s1 = MRISampler(meta).shard(1, 2)
    got = [r["slice_id"] for r in s0.rows] + [r["slice_id"] for r in s1.rows]
    assert sorted(got) == sorted(ids)
    assert not set(r["slice_id"] for r in s0.rows) & set(
        r["slice_id"] for r in s1.rows
    )


def test_merge_shard_csvs_equals_unsharded(meta, tmp_path):
    """Two --shard runs' CSVs merged == the single-run artifact contract."""
    all_results = _results([f"slice_{i}" for i in range(7)])
    # unsharded reference
    ref_summary = write_metrics_artifacts(all_results, tmp_path / "ref")

    # shard writes (the CLI's metrics_shard{i}_{n}/ layout)
    out = tmp_path / "run"
    write_metrics_artifacts(all_results[0::2], out / "metrics_shard0_2")
    write_metrics_artifacts(all_results[1::2], out / "metrics_shard1_2")
    merged = merge_shard_csvs(out)
    assert sorted(r.slice_id for r in merged) == sorted(
        r.slice_id for r in all_results
    )
    merged_summary = write_metrics_artifacts(merged, out)
    for metric in ("PSNR", "SSIM", "NRMSE"):
        for stat in ("mean", "std", "min", "max"):
            assert merged_summary[metric][stat] == pytest.approx(
                ref_summary[metric][stat], rel=1e-9
            )
    assert (out / "metrics_error.csv").exists()
    assert (out / "metrics_summary.txt").exists()


def test_read_metrics_csv_roundtrip(tmp_path):
    results = _results(["a", "b", "c"])
    write_metrics_artifacts(results, tmp_path)
    back = read_metrics_csv(tmp_path / "metrics_error.csv")
    assert [(r.slice_id, r.psnr, r.ssim, r.nrmse) for r in back] == [
        (r.slice_id, r.psnr, r.ssim, r.nrmse) for r in results
    ]


def test_gather_single_process_identity():
    results = _results(["x", "y"])
    assert gather_shard_results(results) == results


def test_sampler_test_files_filter(meta):
    sampler = MRISampler(meta)
    # pick two known slice ids and one stem
    ids = sorted(r["slice_id"] for r in sampler.rows)[:2]
    picked = MRISampler(meta, test_files=ids)
    assert sorted(r["slice_id"] for r in picked.rows) == ids

    stem = sampler.rows[0]["stem"]
    by_stem = MRISampler(meta, test_files=[stem])
    assert {r["stem"] for r in by_stem.rows} == {stem}
    assert len(by_stem.rows) >= 1

    with pytest.raises(ValueError):
        MRISampler(meta, test_files=["no_such_file"])


def test_chunked_sweep_equals_per_slice(meta):
    """evaluate_files_chunked (one dispatch per chunk) returns the same
    per-slice metrics as the per-slice evaluate_files loop."""
    import jax
    import jax.numpy as jnp

    from mri_inr_tpu.eval.evaluate import (
        SliceReconstructor,
        evaluate_files,
        evaluate_files_chunked,
    )
    from mri_inr_tpu.models.modulated_siren import ModulatedSiren

    model = ModulatedSiren(dim_hidden=32, latent_dim=32, num_layers=2)
    params = model.init(jax.random.key(0), jnp.zeros((2, 32, 32)))["params"]
    apply_fn = lambda p, x: model.apply({"params": p}, x, deterministic=True)
    recon = SliceReconstructor(apply_fn, patch_bucket=32)

    ref = evaluate_files(recon, params, MRISampler(meta), progress_every=0)
    got = evaluate_files_chunked(
        recon, params, MRISampler(meta), chunk=4, progress_every=0
    )
    assert [r.slice_id for r in got] == [r.slice_id for r in ref]
    for a, b in zip(got, ref):
        assert a.psnr == pytest.approx(b.psnr, abs=1e-4)
        assert a.ssim == pytest.approx(b.ssim, abs=1e-5)
        assert a.nrmse == pytest.approx(b.nrmse, abs=1e-6)
