#!/usr/bin/env python
"""End-to-end quality-evidence run (VERDICT r1 item 4): synthetic phantoms
-> preprocessing -> conv-AE pretrain -> modulated-SIREN train to
convergence -> metric sweep + snapshot, producing the artifacts committed
as RESULTS.md + runs/quality/.

This is the full reference recipe (preprocess -> train_encoder ->
train_mod_siren -> test_mod_siren, ref README.md:66-101) executed by this
framework's own CLIs on one TPU chip. On real fastMRI data the same
commands reproduce the reference's README table rows; phantoms are used
here because the fastMRI download needs a license + egress.

Usage: python scripts/quality_run.py [--root runs/quality] [--epochs 600]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]


def sh(args: list[str]) -> None:
    print(f"+ {' '.join(args)}", flush=True)
    subprocess.run(args, check=True, cwd=REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="runs/quality")
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--ae-epochs", type=int, default=30)
    ap.add_argument("--train-files", type=int, default=24)
    ap.add_argument("--val-files", type=int, default=4)
    ap.add_argument("--eval-files", type=int, default=12)
    ap.add_argument("--slices", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--platform", default=None)
    # r5 "hard mode" corpus knobs (see data/synthetic.py): complex phase,
    # k-space noise at --snr-db, tissue-like texture
    ap.add_argument("--phase", action="store_true")
    ap.add_argument("--snr-db", type=float, default=None)
    ap.add_argument("--texture", type=float, default=0.0)
    args = ap.parse_args()

    root = (REPO / args.root).resolve()
    root.mkdir(parents=True, exist_ok=True)
    plat = ["--platform", args.platform] if args.platform else []
    t_start = time.time()

    # 1. synthetic volumes + preprocessing (train / val / eval splits)
    sys.path.insert(0, str(REPO))
    from mri_inr_tpu.data import synthetic
    from mri_inr_tpu.data.preprocessing import process_files

    stamps = {}
    splits = {
        "train": (args.train_files, 0),
        "val": (args.val_files, 1000),
        "eval": (args.eval_files, 2000),
    }
    for name, (num, seed) in splits.items():
        d = root / "data" / name
        if not (d / "processed" / "metadata.csv").exists():
            synthetic.write_synthetic_h5(
                d, num_files=num, num_slices=args.slices,
                height=args.size, width=args.size, seed=seed,
                phase=args.phase, snr_db=args.snr_db, texture=args.texture,
            )
            process_files(d)
        stamps[name] = str(d / "processed" / "metadata.csv")
    print(f"data ready ({time.time() - t_start:.0f}s)", flush=True)

    # 2. conv-AE pretraining (the encoder the SIREN fine-tunes)
    ae_dir = root / "encoder"
    ae_ckpt = ae_dir / f"conv_autoencoder_epoch_{args.ae_epochs - 1:05d}"
    if not ae_ckpt.exists():
        sh([sys.executable, "train_encoder.py",
            "--dataset", stamps["train"], "--output", str(ae_dir),
            "--model", "conv", "--epochs", str(args.ae_epochs),
            "--batch-size", "1024", *plat])
    print(f"AE ready ({time.time() - t_start:.0f}s)", flush=True)

    # 3. SIREN training (fused kernels + device-resident scan epochs)
    sh([sys.executable, "train_mod_siren.py", *plat,
        "--set", f"data.train.dataset={stamps['train']}",
        "--set", f"data.val.dataset={stamps['val']}",
        "--set", "data.train.max_slice_num=100",
        "--set", "data.val.max_slice_num=100",
        "--set", f"model.encoder_path={ae_ckpt}",
        "--set", f"training.epochs={args.epochs}",
        "--set", "training.batch_size=400",
        "--set", "training.save_interval=100",
        "--set", "training.device_data=true",
        "--set", f"training.output_dir={root / 'train'}",
        "--set", "training.output_name=quality",
        ])
    run_dirs = sorted((root / "train").glob("quality_*"))
    run_dir = run_dirs[-1]
    print(f"train done: {run_dir} ({time.time() - t_start:.0f}s)", flush=True)

    # 4. evaluation sweep (fused eval kernel) + visual samples
    eval_dir = root / "eval"
    sh([sys.executable, "test_mod_siren.py", *plat,
        "--set", f"data.dataset={stamps['eval']}",
        "--set", f"data.model_path={run_dir}",
        "--set", "data.visual_samples=3",
        "--set", "data.batch_patches=512",
        "--set", f"data.output_dir={eval_dir}",
        "--set", "data.output_name=quality",
        ])
    summary = (eval_dir / "quality" / "metrics_summary.txt").read_text()
    print(summary, flush=True)
    (root / "run_info.json").write_text(json.dumps({
        "epochs": args.epochs,
        "ae_epochs": args.ae_epochs,
        "train_files": args.train_files,
        "slices_per_file": args.slices,
        "image_size": args.size,
        "run_dir": str(run_dir.relative_to(REPO)),
        "wall_seconds": time.time() - t_start,
    }, indent=2) + "\n")
    print(f"total {time.time() - t_start:.0f}s", flush=True)


if __name__ == "__main__":
    main()
