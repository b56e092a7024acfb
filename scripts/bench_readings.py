#!/usr/bin/env python
"""Collect the committed throughput readings (VERDICT r2 item 3): run
``benchmarks/bench_train.py`` and ``benchmarks/bench_eval_sweep.py`` on the
chip and write every JSON line they emit into ``BENCH_extras.json`` at the
repo root, tagged with the command that produced it.

Matches the reference hot loops these measure: training
``src/train/training.py:177-207``, eval sweep ``test_mod_siren.py:175-255``.

Usage: python scripts/bench_readings.py [--skip-train] [--skip-eval]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def run_json(args: list[str]) -> list:
    """Run a bench script; return the parsed JSON payload(s) from stdout
    (stderr streams through for progress visibility)."""
    print(f"+ {' '.join(args)}", flush=True)
    proc = subprocess.run(args, cwd=REPO, stdout=subprocess.PIPE, text=True)
    proc.check_returncode()
    out = []
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") or line.startswith("["):
            try:
                payload = json.loads(line)
            except ValueError:
                continue  # stray log line that happens to start with {/[
            out.extend(payload if isinstance(payload, list) else [payload])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-eval", action="store_true")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--slices", type=int, default=64)
    args = ap.parse_args()

    py = sys.executable
    readings: dict[str, list] = {}

    if not args.skip_train:
        readings["train_step"] = run_json(
            [py, "benchmarks/bench_train.py", "--iters", str(args.iters)]
        )
    if not args.skip_eval:
        evals = []
        for extra in (["--chunk", "8"], ["--chunk", "1"],
                      ["--chunk", "8", "--flax"]):
            evals.extend(run_json(
                [py, "benchmarks/bench_eval_sweep.py",
                 "--slices", str(args.slices)] + extra
            ))
        readings["eval_sweep"] = evals

    out_path = REPO / "BENCH_extras.json"
    existing = {}
    if out_path.exists():
        existing = json.loads(out_path.read_text())
    existing.update(readings)
    out_path.write_text(json.dumps(existing, indent=2) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
