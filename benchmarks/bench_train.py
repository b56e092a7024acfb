#!/usr/bin/env python
"""Training-step throughput on one TPU chip: Flax autodiff path vs the
fused Pallas fwd+bwd kernels (ops/siren_train_kernel), at the reference's
batch 400 and at the eval-bench batch 4096.

Methodology matches bench.py: the timed region is one jitted ``lax.scan``
over ITERS full train steps (fwd+bwd+optax update) with a per-iteration
input perturbation, so per-dispatch relay latency (~23.5 ms on axon) is
amortized and relay memoization cannot fake the number.

Matches the reference hot loop ``src/train/training.py:177-207`` (studied,
not copied): batch 400 of 32x32 patches, Adam, MSE on the 24x24 center.

Usage: python benchmarks/bench_train.py [--iters 50] [--batches 400,4096]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def bench_one(batch: int, iters: int, use_pallas: bool,
              sin5: bool = True) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mri_inr_tpu.models.modulated_siren import ModulatedSiren
    from mri_inr_tpu.ops import tiling
    from mri_inr_tpu.train import losses
    from mri_inr_tpu.train.trainer import _make_forward, create_train_state

    model = ModulatedSiren(
        dim_hidden=256,
        latent_dim=256,
        num_layers=5,
        dropout=0.1,
        compute_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    fully = jnp.asarray(rng.uniform(size=(batch, 32, 32)).astype(np.float32))
    under = jnp.asarray(rng.uniform(size=(batch, 32, 32)).astype(np.float32))
    state = create_train_state(
        model, jax.random.key(0), under[:8], "adam", 1e-4
    )
    # sin5=True mirrors the shipped TrainingConfig default (degree-5
    # train kernels, promoted r4); pass --sin9 for the degree-9 numbers
    forward = _make_forward(model, use_pallas, interpret=False, sin5=sin5)
    base_rng = jax.random.key(1)

    def body(state, i):
        f = fully + i.astype(jnp.float32) * 1e-6
        u = under + i.astype(jnp.float32) * 1e-6
        target = tiling.extract_center_batch(f, 32, 24).astype(jnp.float32)
        dropout_rng = jax.random.fold_in(base_rng, state.step)

        def loss_of(p):
            pred = forward(p, u, dropout_rng)
            return losses.mse(pred.astype(jnp.float32), target)

        loss, grads = jax.value_and_grad(loss_of)(state.params)
        return state.apply_gradients(grads=grads), loss

    def run(state):
        return jax.lax.scan(body, state, jnp.arange(iters))

    run = jax.jit(run, donate_argnums=(0,))

    t0 = time.perf_counter()
    state, losses_out = run(state)
    jax.device_get(losses_out)  # fetch-sync (relay)
    compile_s = time.perf_counter() - t0

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses_out = run(state)
        jax.device_get(losses_out)  # fetch-sync (relay)
        best = min(best, time.perf_counter() - t0)

    per_step = best / iters
    return {
        # "fused" (unsuffixed) historically means the degree-9 kernels in
        # BENCH JSON; the promoted degree-5 default gets its own label
        "path": "flax" if not use_pallas
        else ("fused_sin5" if sin5 else "fused"),
        "batch": batch,
        "ms_per_step": per_step * 1e3,
        "samples_per_sec": batch / per_step,
        "compile_s": compile_s,
        "final_loss": float(losses_out[-1]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batches", default="400,4096")
    ap.add_argument("--paths", default="flax,fused")
    ap.add_argument("--sin9", action="store_true",
                    help="degree-9 train kernels (pre-r4 default)")
    args = ap.parse_args()

    import jax

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rows = []
    for batch in (int(b) for b in args.batches.split(",")):
        for path in args.paths.split(","):
            r = bench_one(batch, args.iters, use_pallas=(path == "fused"),
                          sin5=not args.sin9)
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
