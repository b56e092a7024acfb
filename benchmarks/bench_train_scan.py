#!/usr/bin/env python
"""Training throughput via the PRODUCTION scan-epoch path
(``trainer.make_scan_epoch``): one jitted ``lax.scan`` drives every train
step of an epoch on-device — exactly what ``training.device_data=true``
runs (and what the committed quality/ablation runs used).

This complements ``bench_train.py`` (raw per-step scan): the r2/r3 relay
wedged >25 min compiling bench_train's fused-step scan twice, while this
epoch formulation compiles reliably (it is the same program the 600-epoch
quality run compiled on-chip). Reports ms/step and samples/s for the Flax
autodiff path vs the fused Pallas custom_vjp path.

Usage: python benchmarks/bench_train_scan.py [--steps 50] [--batches 400,4096] [--paths flax,fused]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def bench_one(batch: int, steps: int, use_pallas: bool) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mri_inr_tpu.models.modulated_siren import ModulatedSiren
    from mri_inr_tpu.train import losses
    from mri_inr_tpu.train.trainer import (
        create_train_state,
        make_epoch_perm,
        make_scan_epoch,
    )

    model = ModulatedSiren(
        dim_hidden=256,
        latent_dim=256,
        num_layers=5,
        dropout=0.1,
        compute_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    # tile pool sized so each scanned step sees distinct rows
    pool = max(batch * 2, 8192)
    fully = jnp.asarray(rng.uniform(size=(pool, 32, 32)).astype(np.float32))
    under = jnp.asarray(rng.uniform(size=(pool, 32, 32)).astype(np.float32))
    state = create_train_state(model, jax.random.key(0), under[:8], "adam", 1e-4)
    epoch = make_scan_epoch(model, losses.mse, 32, 24, use_pallas=use_pallas)

    def perm(seed):
        p = make_epoch_perm(pool, batch, seed, shuffle=True)
        reps = -(-steps // p.shape[0])
        return jnp.asarray(np.concatenate([p] * reps)[:steps])

    t0 = time.perf_counter()
    state, loss = epoch(state, fully, under, perm(0), jax.random.key(1), True)
    jax.device_get(loss)  # fetch-sync (relay)
    compile_s = time.perf_counter() - t0

    best = float("inf")
    for i in range(3):
        p = perm(i + 1)  # fresh permutation: relay memoization cannot hit
        t0 = time.perf_counter()
        state, loss = epoch(state, fully, under, p, jax.random.key(1), True)
        jax.device_get(loss)  # fetch-sync (relay)
        best = min(best, time.perf_counter() - t0)

    per_step = best / steps
    return {
        "path": "fused" if use_pallas else "flax",
        "batch": batch,
        "ms_per_step": per_step * 1e3,
        "samples_per_sec": batch / per_step,
        "compile_s": compile_s,
        "final_loss": float(loss),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batches", default="400,4096")
    ap.add_argument("--paths", default="flax,fused")
    args = ap.parse_args()

    import jax

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rows = []
    for batch in (int(b) for b in args.batches.split(",")):
        for path in args.paths.split(","):
            r = bench_one(batch, args.steps, use_pallas=(path == "fused"))
            rows.append(r)
            print(
                f"{r['path']:>5} B={r['batch']:>5}: {r['ms_per_step']:8.2f} ms/step "
                f"{r['samples_per_sec']:12.0f} samples/s "
                f"(compile {r['compile_s']:.1f}s, loss {r['final_loss']:.4f})",
                file=sys.stderr,
            )
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
