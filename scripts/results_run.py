#!/usr/bin/env python
"""Ablation + acceleration evidence runs (VERDICT r2 item 2): execute the
reference's published config matrix (``/root/reference/README.md:34-62``)
end-to-end on this framework — train each row to the same budget with the
same seed, evaluate with the metric sweep, and collect the PSNR/SSIM/NRMSE
table into ``runs/results/rows.json`` (rendered into RESULTS.md).

Rows (reference README row -> our config):
- morlet      model.activation=morlet          (README.md:39)
- edge        training.criterion=edge          (README.md:37)
- residual    model.residual=true              (README.md:41)
- vgg         model.encoder_type=vgg + in-framework VGG AE pretrain (README.md:38)
- perceptual  training.criterion=perceptual + perceptual AE pretrain (README.md:40)
- acc_005_8   acceleration 8, cf 0.05          (README.md:60)
- acc_01_6    acceleration 6, cf 0.10          (README.md:62)

The baseline row (sine/MSE/custom, acc 6 / cf 0.05) is the committed
``runs/quality`` run; all rows here reuse its synthetic phantom data and
(except vgg) its pretrained conv AE, so the only variable per row is the
ablated config — mirroring the reference's protocol.

Usage: python scripts/results_run.py [--epochs 600] [--rows morlet,edge,...]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
# overridable via --quality-root / --out-root (the r5 hard-corpus table
# points these at runs/quality_hard + runs/results_hard)
QUALITY = REPO / "runs" / "quality"
ROOT = REPO / "runs" / "results"


def sh(args: list[str]) -> None:
    print(f"+ {' '.join(args)}", flush=True)
    subprocess.run(args, check=True, cwd=REPO)


def ensure_acc_data(stamps: dict) -> dict:
    """Re-process the quality phantoms with the full mask set (the quality
    data has only the reference's default (0.05, 6) / (0.1, 6) masks;
    acceleration rows also need (0.05, 8) and (0.2, 4))."""
    sys.path.insert(0, str(REPO))
    # the runner's own process never needs the chip (training/eval are
    # subprocesses) — keep preprocessing on CPU
    import jax

    jax.config.update("jax_platforms", "cpu")
    from mri_inr_tpu.data.preprocessing import process_files

    acc_stamps = {}
    for name in ("train", "val", "eval"):
        d = QUALITY / "data" / name
        out = d / "processed_acc"
        if not (out / "metadata.csv").exists():
            process_files(
                d, out,
                undersample_params=((0.05, 6), (0.05, 8), (0.1, 6), (0.2, 4)),
            )
        acc_stamps[name] = str(out / "metadata.csv")
    return acc_stamps


def train_and_eval(
    name: str,
    stamps: dict,
    epochs: int,
    train_overrides: list[str],
    eval_overrides: list[str],
    encoder_ckpt: str | None,
    plat: list[str],
) -> dict:
    row_dir = ROOT / name
    t0 = time.time()
    train_args = [
        sys.executable, "train_mod_siren.py", *plat,
        "--set", f"data.train.dataset={stamps['train']}",
        "--set", f"data.val.dataset={stamps['val']}",
        "--set", "data.train.max_slice_num=100",
        "--set", "data.val.max_slice_num=100",
        "--set", f"training.epochs={epochs}",
        "--set", "training.batch_size=400",
        "--set", f"training.save_interval={epochs}",
        "--set", "training.device_data=true",
        "--set", f"training.output_dir={row_dir}",
        "--set", f"training.output_name={name}",
    ]
    if encoder_ckpt:
        train_args += ["--set", f"model.encoder_path={encoder_ckpt}"]
    sh(train_args + train_overrides)
    run_dir = sorted(row_dir.glob(f"{name}_*"))[-1]
    train_secs = time.time() - t0

    t1 = time.time()
    sh([
        sys.executable, "test_mod_siren.py", *plat,
        "--set", f"data.dataset={stamps['eval']}",
        "--set", f"data.model_path={run_dir}",
        "--set", "data.batch_patches=512",
        "--set", f"data.output_dir={row_dir}",
        "--set", "data.output_name=eval",
    ] + eval_overrides)
    eval_secs = time.time() - t1

    summary = {}
    for line in (row_dir / "eval" / "metrics_summary.txt").read_text().splitlines():
        metric, rest = line.split(":", 1)
        summary[metric.strip()] = {
            kv.split("=")[0]: float(kv.split("=")[1]) for kv in rest.split()
        }
    return {
        "row": name,
        "epochs": epochs,
        "run_dir": str(run_dir.relative_to(REPO)),
        "train_seconds": round(train_secs, 1),
        "eval_seconds": round(eval_secs, 1),
        "train_overrides": train_overrides,
        "eval_overrides": eval_overrides,
        **summary,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=600)
    ap.add_argument("--ae-epochs", type=int, default=30)
    ap.add_argument("--platform", default=None,
                    help="forwarded to every CLI (e.g. cpu for a dry run)")
    ap.add_argument(
        "--rows",
        default="morlet,edge,residual,vgg,perceptual,acc_005_8,acc_01_6,acc_02_4",
    )
    ap.add_argument("--quality-root", default=None,
                    help="baseline quality run root (default runs/quality)")
    ap.add_argument("--out-root", default=None,
                    help="row output root (default runs/results)")
    args = ap.parse_args()
    global QUALITY, ROOT
    if args.quality_root:
        QUALITY = (REPO / args.quality_root).resolve()
    if args.out_root:
        ROOT = (REPO / args.out_root).resolve()
    plat = ["--platform", args.platform] if args.platform else []

    ROOT.mkdir(parents=True, exist_ok=True)
    stamps = {
        name: str(QUALITY / "data" / name / "processed" / "metadata.csv")
        for name in ("train", "val", "eval")
    }
    for p in stamps.values():
        assert pathlib.Path(p).exists(), f"missing {p}; run scripts/quality_run.py first"
    conv_ae = sorted(
        d for d in (QUALITY / "encoder").glob("conv_autoencoder_epoch_*")
        if not d.name.endswith("_full")
    )[-1]

    rows_out_path = ROOT / "rows.json"
    rows_done = {}
    if rows_out_path.exists():
        rows_done = {r["row"]: r for r in json.loads(rows_out_path.read_text())}

    def save():
        rows_out_path.write_text(json.dumps(list(rows_done.values()), indent=2) + "\n")

    wanted = args.rows.split(",")

    specs: dict[str, dict] = {
        "morlet": dict(
            train_overrides=["--set", "model.activation=morlet"],
            eval_overrides=["--set", "model.activation=morlet"],
            encoder=str(conv_ae),
        ),
        "edge": dict(
            train_overrides=["--set", "training.criterion=edge"],
            eval_overrides=[],
            encoder=str(conv_ae),
        ),
        "residual": dict(
            train_overrides=["--set", "model.residual=true"],
            eval_overrides=["--set", "model.residual=true"],
            encoder=str(conv_ae),
        ),
    }

    if "vgg" in wanted:
        vgg_dir = ROOT / "encoder_vgg"
        vgg_ckpt = vgg_dir / f"vgg_autoencoder_epoch_{args.ae_epochs - 1:05d}"
        if not vgg_ckpt.exists():
            sh([sys.executable, "train_encoder.py", *plat,
                "--dataset", stamps["train"], "--output", str(vgg_dir),
                "--model", "vgg", "--epochs", str(args.ae_epochs),
                "--batch-size", "256"])
        specs["vgg"] = dict(
            # Flax-autodiff path: conv-heavy graphs composed with the fused
            # custom_vjp hit a pathological XLA:TPU compile (>27 min for the
            # VGG16 trunk, measured; MSE/morlet compile in ~30 s)
            train_overrides=["--set", "model.encoder_type=vgg",
                             "--set", "training.use_pallas=false"],
            eval_overrides=["--set", "model.encoder_type=vgg"],
            encoder=str(vgg_ckpt),
        )

    if "vgg_frozen_rand" in wanted:
        # VERDICT r4 control experiment: the reference splices an
        # ImageNet-trained (non-corpus) VGG trunk and loses ~5 dB
        # (README.md:38); RESULTS.md argues initialization artifact. This
        # row freezes a RANDOM (non-corpus) trunk — if the collapse
        # reproduces, unadapted trunk features alone explain it.
        specs["vgg_frozen_rand"] = dict(
            train_overrides=["--set", "model.encoder_type=vgg",
                             "--set", "training.freeze_encoder=true",
                             "--set", "training.use_pallas=false"],
            eval_overrides=["--set", "model.encoder_type=vgg"],
            encoder=None,
        )

    if "vgg_frozen_corpus" in wanted:
        # separating control: the corpus-pretrained trunk, frozen. If this
        # row does NOT collapse while vgg_frozen_rand does, the damage is
        # attributable to initialization, not to freezing per se.
        vgg_dir = ROOT / "encoder_vgg"
        vgg_ckpt = vgg_dir / f"vgg_autoencoder_epoch_{args.ae_epochs - 1:05d}"
        if not vgg_ckpt.exists():
            sh([sys.executable, "train_encoder.py", *plat,
                "--dataset", stamps["train"], "--output", str(vgg_dir),
                "--model", "vgg", "--epochs", str(args.ae_epochs),
                "--batch-size", "256"])
        specs["vgg_frozen_corpus"] = dict(
            train_overrides=["--set", "model.encoder_type=vgg",
                             "--set", "training.freeze_encoder=true",
                             "--set", "training.use_pallas=false"],
            eval_overrides=["--set", "model.encoder_type=vgg"],
            encoder=str(vgg_ckpt),
        )

    if "perceptual" in wanted:
        perc_dir = ROOT / "encoder_perceptual"
        perc_ckpt = perc_dir / f"perceptual_autoencoder_epoch_{args.ae_epochs - 1:05d}"
        if not perc_ckpt.exists():
            sh([sys.executable, "train_encoder.py", *plat,
                "--dataset", stamps["train"], "--output", str(perc_dir),
                "--model", "perceptual", "--epochs", str(args.ae_epochs),
                "--batch-size", "1024"])
        specs["perceptual"] = dict(
            # Flax path for the same compile-pathology reason as vgg (the
            # perceptual loss differentiates a 4-conv CNN per step)
            train_overrides=[
                "--set", "training.criterion=perceptual",
                "--set", f"training.perceptual_encoder_path={perc_ckpt}",
                "--set", "training.use_pallas=false",
            ],
            eval_overrides=[],
            encoder=str(conv_ae),
        )

    if "acc_005_8" in wanted or "acc_02_4" in wanted:
        acc_stamps = ensure_acc_data(stamps)
        specs["acc_005_8"] = dict(
            train_overrides=["--set", "data.acceleration=8"],
            eval_overrides=["--set", "data.acceleration=8"],
            encoder=str(conv_ae),
            stamps=acc_stamps,
        )
        specs["acc_02_4"] = dict(
            train_overrides=[
                "--set", "data.acceleration=4",
                "--set", "data.center_fraction=0.2",
            ],
            eval_overrides=[
                "--set", "data.acceleration=4",
                "--set", "data.center_fraction=0.2",
            ],
            encoder=str(conv_ae),
            stamps=acc_stamps,
        )
    # cf 0.10 / acc 6 masks exist in the default-processed quality data
    specs["acc_01_6"] = dict(
        train_overrides=["--set", "data.center_fraction=0.1"],
        eval_overrides=["--set", "data.center_fraction=0.1"],
        encoder=str(conv_ae),
    )

    failed = []
    for name in wanted:
        if name in rows_done:
            print(f"row {name}: already done, skipping", flush=True)
            continue
        spec = specs[name]
        try:
            rows_done[name] = train_and_eval(
                name,
                spec.get("stamps", stamps),
                args.epochs,
                spec["train_overrides"],
                spec["eval_overrides"],
                spec["encoder"],
                plat,
            )
        except Exception as exc:  # keep later rows alive; rerun picks it up
            failed.append(name)
            print(f"row {name} FAILED: {exc}", flush=True)
            continue
        save()
        print(f"row {name} done: {rows_done[name]}", flush=True)
    if failed:
        print(f"FAILED rows (rerun to retry): {failed}", flush=True)

    save()
    print(f"all rows written to {rows_out_path}", flush=True)


if __name__ == "__main__":
    main()
