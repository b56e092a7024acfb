#!/usr/bin/env python
"""Render RESULTS.md from the measured quality/throughput artifacts:

- runs/quality/            (baseline row, r2: 600-epoch end-to-end run)
- runs/results/rows.json   (ablation + acceleration rows, scripts/results_run.py)
- runs/results/sweep940/sweep940.json (940-slice sweep, scripts/sweep940.py)
- benchmarks readings      (inlined manually in benchmarks/README.md)

Usage: python scripts/render_results.py
"""

from __future__ import annotations

import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]

REF_ROWS = {
    # reference README.md:34-41 and :58-62 (mean values)
    "baseline": ("26.646", "0.850", "0.310", "/root/reference/README.md:36"),
    "edge": ("26.766", "0.855", "0.313", "/root/reference/README.md:37"),
    "vgg": ("21.233", "0.739", "0.608", "/root/reference/README.md:38"),
    "morlet": ("25.865", "0.861", "0.370", "/root/reference/README.md:39"),
    "perceptual": ("24.659", "0.770", "0.428", "/root/reference/README.md:40"),
    "residual": ("26.666", "0.853", "0.307", "/root/reference/README.md:41"),
    "acc_005_8": ("26.371", "0.854", "0.324", "/root/reference/README.md:60"),
    "acc_01_6": ("27.878", "0.882", "0.269", "/root/reference/README.md:62"),
    "acc_02_4": ("—", "—", "—", "(not published)"),
    "online_remask": ("—", "—", "—", "(not expressible offline)"),
    "train_sin5": ("—", "—", "—", "(speed mode)"),
}

ROW_LABEL = {
    "baseline": "Baseline (sine, MSE, custom encoder, acc 6 / cf 0.05)",
    "edge": "Edge loss",
    "vgg": "VGG encoder",
    "morlet": "Morlet activation",
    "perceptual": "Perceptual loss",
    "residual": "Residual MLP",
    "acc_005_8": "Acc 8 / cf 0.05",
    "acc_01_6": "Acc 6 / cf 0.10",
    "acc_02_4": "Acc 4 / cf 0.20",
    "online_remask": "Online mask re-randomization (TPU-native, r4)",
    "train_sin5": "Degree-5 train kernels (training.sin5, r4 default)",
}


def fmt(stats: dict | None) -> str:
    if not stats:
        return "—"
    return f"{stats['mean']:.3f} ± {stats['std']:.3f}"


def read_summary_txt(path: pathlib.Path) -> dict:
    out = {}
    for line in path.read_text().splitlines():
        metric, rest = line.split(":", 1)
        out[metric.strip()] = {
            kv.split("=")[0]: float(kv.split("=")[1]) for kv in rest.split()
        }
    return out


def main():
    rows = {}
    # baseline from runs/quality (r2 run)
    qsum = REPO / "runs/quality/eval/quality/metrics_summary.txt"
    qinfo = json.loads((REPO / "runs/quality/run_info.json").read_text())
    if qsum.exists():
        rows["baseline"] = {
            "row": "baseline",
            "epochs": qinfo["epochs"],
            "run_dir": qinfo["run_dir"],
            **read_summary_txt(qsum),
        }
    rows_json = REPO / "runs/results/rows.json"
    if rows_json.exists():
        for r in json.loads(rows_json.read_text()):
            rows[r["row"]] = r

    lines = [
        "# RESULTS — measured quality + scale evidence (round 4)",
        "",
        "All numbers are measured end-to-end on the single real TPU v5e chip",
        "with this framework's own CLIs (`scripts/quality_run.py` rows via",
        "`scripts/results_run.py`): synthetic phantom k-space -> preprocessing",
        "-> conv-AE pretrain -> modulated-SIREN training -> chunked metric",
        "sweep. fastMRI itself needs a license + egress, so the reference's",
        "absolute numbers are NOT directly comparable — phantoms are smoother",
        "(higher PSNR) and the training corpus is smaller. What IS comparable,",
        "and what the reference's table is really read for, is the",
        "*ordering and spread of the ablations under an identical protocol*,",
        "plus the numerical-parity proof in `PARITY.md` (weights-transplant",
        "tests against the actual torch reference, forward max-abs-diff",
        "2.6e-8) showing both stacks compute the same function.",
        "",
        "Protocol per row: same phantom dataset (24 train / 4 val / 12 eval",
        "volumes x 4 slices, 256x256), same seed, same budget"
        f" ({rows.get('baseline', {}).get('epochs', 600)} epochs, batch 400,"
        " Adam 1e-4),",
        "same pretrained conv AE (except the vgg row, which pretrains its own",
        "VGG16 AE in-framework — the reference downloads ImageNet weights,",
        "`vgg.py:325-363`; no egress here). Eval: 48 slices, PSNR/SSIM/NRMSE",
        "with the reference's joint-data-range metric definitions.",
        "",
        "## Ablations (our measured vs reference published)",
        "",
        "| Row | PSNR (ours) | SSIM (ours) | NRMSE (ours) | PSNR (ref) | SSIM (ref) | NRMSE (ref) |",
        "|---|---|---|---|---|---|---|",
    ]
    order = ["baseline", "edge", "morlet", "residual", "vgg", "perceptual",
             "acc_005_8", "acc_01_6", "acc_02_4", "online_remask",
             "train_sin5"]
    for name in order:
        r = rows.get(name)
        ref = REF_ROWS.get(name, ("—",) * 4)
        lines.append(
            f"| {ROW_LABEL[name]} | {fmt(r.get('PSNR') if r else None)} | "
            f"{fmt(r.get('SSIM') if r else None)} | "
            f"{fmt(r.get('NRMSE') if r else None)} | "
            f"{ref[0]} | {ref[1]} | {ref[2]} |"
        )
    lines += [
        "",
        "Row-ordering vs the reference: edge >= baseline, residual ~=",
        "baseline, morlet trades PSNR for SSIM, perceptual degrades SSIM",
        "to the worst of all rows (0.837; the reference's Perceptual row is",
        "its worst ablation too, README.md:40) with PSNR below baseline,",
        "and the acceleration sweep is monotone in sampling density:",
        "acc8/cf.05 28.03 < acc6/cf.05 28.41 < acc6/cf.10 31.85 <",
        "acc4/cf.20 33.63 —",
        "all reproduce the reference's ordering. The online-remask row",
        "is framework-native surface, not a reference reproduction: same",
        "protocol as baseline but with fresh per-volume masks drawn every",
        "epoch on device (`data.train.online`, ~137 ms/epoch at 940-slice",
        "scale) — +0.14 dB PSNR / +0.006 SSIM over the fixed-mask",
        "baseline, replicated on a second seed (+0.10 dB / +0.009 SSIM,",
        "runs/results/seed1_*): an augmentation the reference's offline",
        ".npy pipeline cannot express. The train_sin5 row measures the degree-5",
        "train-kernel speed mode at the full protocol: quality identical",
        "to baseline (-0.01 dB, SSIM equal) while training ~10% faster —",
        "the evidence behind its promotion to default. A doubled-budget",
        "probe (1200 epochs, online remask) plateaus: val loss is flat",
        "from ~epoch 500 (progress_log in runs/results/best/) and PSNR",
        "does not improve (28.30, SSIM 0.882) — the 600-epoch protocol",
        "budget saturates this corpus.",
        "The one reproduction divergence is the",
        "VGG row: the reference splices a FROZEN-init ImageNet VGG16 AE",
        "(`vgg.py:325-363`) and loses ~5 dB; this framework pretrains the",
        "same VGG16 AE architecture on the training corpus itself (no",
        "egress for ImageNet weights), and the properly-initialized trunk",
        "does not regress — evidence the reference's VGG gap is an",
        "initialization artifact, not an architecture property.",
        "",
        "Reference sources: `/root/reference/README.md:34-41,58-62`.",
        "Per-row commands and run dirs: `runs/results/rows.json`;",
        "raw artifacts under `runs/results/<row>/` (text artifacts committed,",
        "binaries gitignored). Reproduce any row with the overrides recorded",
        "in its `rows.json` entry (they are literal `--set` arguments).",
        "",
    ]

    sweep = REPO / "runs/results/sweep940/sweep940.json"
    if sweep.exists():
        s = json.loads(sweep.read_text())
        lines += [
            "## 940-file validation sweep (reference scale)",
            "",
            f"The reference's metric pass covers up to 940 fastMRI FLAIR",
            f"slices at 320x320 (`test_mod_siren.py:175-255`). Executed here",
            f"on {s['slices']} synthetic {s['image_size']}x{s['image_size']}",
            "slices through the chunked jitted pipeline on one chip:",
            "",
            f"- unsharded sweep: **{s['slices']} slices in"
            f" {s['unsharded_seconds']}s ="
            f" {s['unsharded_slices_per_sec']:.2f} slices/s** end-to-end"
            f" (chunk={s['eval_chunk']}; the metric pass alone sustains"
            " ~50-60 slices/s warm — the balance is per-process fixed"
            " cost, dominated by a one-time server-side program load"
            " through the axon relay measured at 45-540 s across"
            " otherwise-identical runs, plus restore + startup; see"
            " benchmarks/README.md eval-sweep attribution). The"
            " round-3 committed figure was"
            " 0.54 slices/s; round 4 attributed and fixed it (scalar-fetch"
            " round trips, unpipelined chunks, chip contention).",
            f"- `--shard 0:2` + `--shard 1:2` + `--merge-shards`: merged"
            " summary and per-file rows are EXACTLY equal to the unsharded"
            " artifacts (asserted by `scripts/sweep940.py` on the real",
            " artifacts, not a unit test)",
            f"- PSNR {s['summary']['PSNR']['mean']:.3f} ±"
            f" {s['summary']['PSNR']['std']:.3f} / SSIM"
            f" {s['summary']['SSIM']['mean']:.3f} across the sweep —"
            " the r4 headline model: ~16 min of training at matched"
            " 320x320 resolution on a DISJOINT synthetic corpus (60"
            " volumes, seeds 7000/8000 vs the eval set's 5000) with"
            " online mask re-randomization, including an exercised"
            " auto-resume (150 -> 300 epochs via"
            " training.continue_training; `runs/results/train320/`)."
            " The r3 checkpoint (trained at 256x256 on 24 volumes)"
            " scored 28.043 / 0.849 on the same sweep — the patch"
            " pipeline is resolution-agnostic, and the +2.8 dB came"
            " from matched-resolution training + the online"
            " corpus/remask, same architecture.",
            "",
        ]

    lines += [
        "## Throughput readings (round-4 headlines)",
        "",
        "- **Eval kernel: 3.163e8 px/s = ~167 TF/s bf16 = 85% of the v5e",
        "  peak** (7.46 ms @ 4096 patches, degree-5 schedule promoted on",
        "  940-scale quality evidence) — inside the roofline's 3.1-3.4e8",
        "  practical ceiling band for this chip.",
        "- **Train step: 56.61 ms @ B=4096 (72,359 samples/s), 4.7-5.1x",
        "  the XLA-autodiff path**; a reference 3,000-slice epoch in ~3.8 s.",
        "- **Eval sweep: ~50-60 slices/s steady** through the pipelined",
        "  chunked pipeline (the r3 0.54 slices/s figure was contention +",
        "  scalar-fetch round trips, attributed and fixed); 940-slice",
        "  no-disk online sweep in 39-108 s across runs including the",
        "  variable program load (best: 24 slices/s end-to-end).",
        "- Preprocessing: MXU-DFT ifft2c 11,867 slices/s on chip; the",
        "  offline pipeline is host-I/O-bound at 26.5 slices/s, which the",
        "  online mode bypasses entirely.",
        "",
        "Full tables, schedule sweeps and the roofline analysis:",
        "`benchmarks/README.md`; raw JSON: `BENCH_extras.json`,",
        "`BENCH_r0*.json`.",
        "",
        "Caveat on every `vs_baseline` multiplier quoted from `bench.py`:",
        "the reference publishes NO throughput numbers, so the denominator is",
        "an analytic estimate — ~377 MFLOP/patch at 25% fp16 utilization of",
        "an A100 = 1.0e8 px/s (`bench.py:17-21,30`). The multiplier moves",
        "1:1 with that utilization assumption; the absolute px/s and TF/s",
        "numbers (and the roofline vs the v5e's own 197 TF/s bf16 peak) are",
        "measured and assumption-free.",
        "",
    ]

    (REPO / "RESULTS.md").write_text("\n".join(lines))
    print(f"wrote RESULTS.md ({len(rows)} measured rows)")


if __name__ == "__main__":
    main()
