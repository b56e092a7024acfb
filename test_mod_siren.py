#!/usr/bin/env python
"""Evaluation CLI: visual samples + metric sweep over the validation set.

Parity with the reference's ``test_mod_siren.py`` (studied, not copied):
loads a checkpoint, renders N visual samples (reconstruction/undersampled/
fully-sampled/difference PNGs + comparison panel), scores M metric samples
(default: every selected slice), writes ``metrics_error.csv``,
``metrics_summary.txt``, boxplots and density plots.

TPU-native: the per-slice pipeline is one jitted call; the file sweep is
shardable across processes (``--shard i:n``) — the pod-parallel axis for
the 940-file validation run.

Usage:
    python test_mod_siren.py --config configs/test.yaml \
        [--set data.metric_samples=50] [--shard 0:4]
"""

from __future__ import annotations

import argparse
import pathlib


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", "-c", default=None)
    parser.add_argument("--set", dest="overrides", action="append", default=[])
    parser.add_argument(
        "--shard",
        default=None,
        metavar="I:N",
        help="evaluate file shard I of N (manual multi-machine sweep; "
        "under jax.distributed the process shard is automatic)",
    )
    parser.add_argument(
        "--merge-shards",
        action="store_true",
        help="merge metrics_shard*/ CSVs from prior --shard runs into the "
        "single-run metrics_error.csv/summary/plots, then exit",
    )
    from mri_inr_tpu.utils.platform import add_platform_arg, select_platform

    add_platform_arg(parser)
    args = parser.parse_args()
    select_platform(args.platform, args.devices)

    from mri_inr_tpu.parallel import distributed

    distributed.initialize()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mri_inr_tpu.configuration import load_test_configuration
    from mri_inr_tpu.data.dataset import MRISampler
    from mri_inr_tpu.eval import metrics as metrics_mod
    from mri_inr_tpu.eval.evaluate import (
        SliceReconstructor,
        evaluate_files,
        evaluate_files_chunked,
        evaluate_files_device,
        gather_shard_results,
        merge_shard_csvs,
        write_metrics_artifacts,
    )
    from mri_inr_tpu.models import modulated_siren as ms
    from mri_inr_tpu.train import checkpoint as ckpt_lib
    from mri_inr_tpu.train.trainer import create_train_state
    from mri_inr_tpu.utils import visualization

    cfg = load_test_configuration(args.config, args.overrides)
    ecfg, mcfg = cfg.data, cfg.model

    model = ms.from_config(mcfg)
    state = create_train_state(
        model,
        jax.random.key(0),
        jnp.zeros((2, mcfg.outer_patch_size, mcfg.outer_patch_size)),
        "adam",
        1e-4,
    )
    import time

    model_path = pathlib.Path(ecfg.model_path)
    t_restore = time.perf_counter()
    # model_path may be a run dir (newest step restored) or a step dir
    if (model_path / "checkpoints").is_dir():
        step = ckpt_lib.find_latest_step(model_path)
        state = ckpt_lib.restore_state(model_path, step, state)
        print(f"restored {model_path} step {step} "
              f"({time.perf_counter() - t_restore:.1f}s)")
    else:
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(model_path.absolute(), state)
        print(f"restored {model_path} ({time.perf_counter() - t_restore:.1f}s)")

    primary = distributed.is_primary()
    output_dir = (
        pathlib.Path(ecfg.output_dir) / ecfg.output_name
    )
    if primary:
        output_dir.mkdir(parents=True, exist_ok=True)

    if args.merge_shards:
        results = merge_shard_csvs(output_dir)
        summary = write_metrics_artifacts(results, output_dir)
        values = {
            "PSNR": np.array([r.psnr for r in results]),
            "SSIM": np.array([r.ssim for r in results]),
            "NRMSE": np.array([r.nrmse for r in results]),
        }
        visualization.metrics_boxplot(values, output_dir)
        visualization.metrics_density_plot(values, output_dir)
        print(f"merged {len(results)} rows into {output_dir}")
        return

    if ecfg.online:
        # no-disk eval: raw .h5 -> device mask+IFFT, offline-parity masks
        from mri_inr_tpu.data.online import OnlineKspaceDataset, OnlineSampler

        if ecfg.test_files:
            raise ValueError("data.test_files requires the offline sampler")
        online_ds = OnlineKspaceDataset(
            ecfg.dataset,
            center_fraction=ecfg.center_fraction,
            acceleration=ecfg.acceleration,
            mri_type=ecfg.mri_type,
            max_slice_num=ecfg.max_slice_num,
            outer_patch_size=mcfg.outer_patch_size,
            inner_patch_size=mcfg.inner_patch_size,
            remask_each_epoch=False,
        )
        # the device sweep never needs host image copies — skip the bulk
        # D2H prefetch (visual samples fall back to cached per-slice fetches)
        sampler = OnlineSampler(
            online_ds,
            num_samples=ecfg.num_samples,
            host_prefetch=False if ecfg.device_sweep else None,
        )
        visual_sampler = sampler
    else:
        sampler_kwargs = dict(
            center_fraction=ecfg.center_fraction,
            acceleration=ecfg.acceleration,
            mri_type=ecfg.mri_type,
            max_slice_num=ecfg.max_slice_num,
            num_samples=ecfg.num_samples,
        )
        sampler = MRISampler(ecfg.dataset, **sampler_kwargs)
        # explicit file list for the visual pass (reference
        # test_mod_siren.py:124-128); metric sweep keeps the full selection
        visual_sampler = sampler
        if ecfg.test_files:
            visual_sampler = MRISampler(
                ecfg.dataset, test_files=list(ecfg.test_files), **sampler_kwargs
            )
    if args.shard:
        i, n = (int(x) for x in args.shard.split(":"))
        sampler = sampler.shard(i, n)
        print(f"shard {i}/{n}: {len(sampler)} slices")
    elif distributed.process_count() > 1:
        i, n = distributed.process_index(), distributed.process_count()
        sampler = sampler.shard(i, n)
        print(f"process shard {i}/{n}: {len(sampler)} slices")

    from mri_inr_tpu.ops.siren_kernel import make_apply_fn
    from mri_inr_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh() if jax.local_device_count() > 1 else None
    reconstructor = SliceReconstructor(
        make_apply_fn(model, use_pallas=mcfg.use_pallas,
                      sin_bf16=ecfg.sin_bf16, sin5=ecfg.sin5,
                      ksplit=ecfg.ksplit, quantized=ecfg.quantized),
        outer_patch_size=mcfg.outer_patch_size,
        inner_patch_size=mcfg.inner_patch_size,
        siren_patch_size=mcfg.siren_patch_size,
        patch_bucket=ecfg.batch_patches,
        mesh=mesh,
        # large-FOV mode: distributed weighted fold with ICI halo exchange
        # (falls back per slice when the grid doesn't divide the mesh)
        halo=ecfg.halo_fold,
    )

    # visual pass (primary host only — every host rendering the same files
    # would duplicate artifacts)
    for _ in range(ecfg.visual_samples if primary else 0):
        pair = visual_sampler.next_sample()
        recon, fully, under, m = reconstructor(
            state.params, pair.fully_sampled, pair.undersampled
        )
        vis_dir = output_dir / pair.slice_id
        visualization.save_image(np.asarray(recon), f"{pair.slice_id}_reconstructed", vis_dir)
        visualization.save_image(np.asarray(under), f"{pair.slice_id}_undersampled", vis_dir)
        visualization.save_image(np.asarray(fully), f"{pair.slice_id}_fully_sampled", vis_dir)
        diff = np.abs(np.asarray(fully) - np.asarray(recon))
        visualization.save_image(diff, f"{pair.slice_id}_difference", vis_dir)
        visualization.save_image_comparison(
            [np.asarray(fully), np.asarray(under), np.asarray(recon), diff],
            ["fully sampled", "undersampled", "reconstruction", "difference"],
            f"{pair.slice_id}_comparison",
            vis_dir,
        )
        (vis_dir / f"{pair.slice_id}_error.txt").write_text(
            "".join(f"{k}: {float(v):.6f}\n" for k, v in m.items())
        )
        print(f"visual sample {pair.slice_id}: "
              + " ".join(f"{k}={float(v):.4f}" for k, v in m.items()))

    # metric pass: each process scores its file shard; process shards are
    # all-gathered so the primary writes the single-run artifact contract.
    # Manual --shard runs land in metrics_shard*/ for a later --merge-shards.
    import time

    t_metric = time.perf_counter()
    if ecfg.device_sweep:
        results, _ = evaluate_files_device(
            reconstructor, state.params, sampler,
            num_samples=ecfg.metric_samples,
            steady_probe=ecfg.steady_probe,
        )
    elif ecfg.eval_chunk > 1:
        results = evaluate_files_chunked(
            reconstructor, state.params, sampler,
            num_samples=ecfg.metric_samples, chunk=ecfg.eval_chunk,
        )
    else:
        results = evaluate_files(
            reconstructor, state.params, sampler, num_samples=ecfg.metric_samples
        )
    metric_secs = time.perf_counter() - t_metric
    print(f"metric pass: {len(results)} slices in {metric_secs:.1f}s "
          f"({len(results) / max(metric_secs, 1e-9):.1f} slices/s incl. "
          "compile+program load)")
    results = gather_shard_results(results)
    suffix = f"_shard{args.shard.replace(':', '_')}" if args.shard else ""
    metrics_dir = output_dir if not suffix else output_dir / f"metrics{suffix}"
    if not primary:
        return
    summary = write_metrics_artifacts(results, metrics_dir)
    values = {
        "PSNR": np.array([r.psnr for r in results]),
        "SSIM": np.array([r.ssim for r in results]),
        "NRMSE": np.array([r.nrmse for r in results]),
    }
    visualization.metrics_boxplot(values, metrics_dir)
    visualization.metrics_density_plot(values, metrics_dir)
    for name, stats in summary.items():
        print(
            f"{name}: mean={stats['mean']:.4f} std={stats['std']:.4f} "
            f"min={stats['min']:.4f} max={stats['max']:.4f}"
        )


if __name__ == "__main__":
    main()
