#!/usr/bin/env python
"""Backward-kernel schedule experiments (VERDICT r4 weak #3): the fused
train step ran at 78 TF/s = 40% of v5e bf16 peak with the bwd kernel at
75 TF/s, and two standard countermeasures were never attempted. This
script measures them on the real chip:

- ``block16`` / ``block32``: larger backward batch blocks (r4's sweep was
  capped at 8 by the 100 MB scoped-VMEM limit; the cap is now 127 MB of
  the core's 128 MB physical VMEM);
- ``partials``: per-block dW/dsb/dlw/dlb output blocks reduced by XLA
  outside the kernel instead of read-modify-write accumulation into a
  resident block across the sequential grid;
- the cross: ``block16+partials`` (partials shrink the resident output
  footprint, which is what capped the block size).

Methodology = bench_train.py: one jitted lax.scan over ITERS full train
steps (fwd+bwd+optax) with per-iteration input perturbation, fetch-synced;
best of 3. Reference hot loop: ``src/train/training.py:177-207``.

Usage: python benchmarks/bench_bwd_variants.py [--iters 30]
       [--batches 400,4096] [--variants base,block16,block32,partials,block16_partials]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

VARIANTS = {
    "base": dict(bwd_block_b=8, dw_partials=False),
    "block16": dict(bwd_block_b=16, dw_partials=False),
    "block32": dict(bwd_block_b=32, dw_partials=False),
    "partials": dict(bwd_block_b=8, dw_partials=True),
    "block16_partials": dict(bwd_block_b=16, dw_partials=True),
}

# fwd ~2 MXU flops/param-elem + bwd ~3 matmuls/layer (recompute, dW, dX)
# on the 4 hidden-chain layers of (n=B*576, 256)x(256, 256); the chain is
# the measured hot region (roofline: benchmarks/README.md)
CHAIN_FLOPS_PER_SAMPLE = 8 * 576 * 256 * 256 * 4  # bwd-dominated estimate


def bench_one(batch: int, iters: int, variant: str) -> dict:
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
    forward = _make_forward(
        model, use_pallas=True, interpret=False, sin5=True,
        **VARIANTS[variant],
    )
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
    try:
        state, losses_out = run(state)
        jax.device_get(losses_out)  # fetch-sync (relay)
    except Exception as exc:  # compile failure IS a result here
        return {
            "variant": variant, "batch": batch,
            "error": f"{type(exc).__name__}: {str(exc)[:200]}",
        }
    compile_s = time.perf_counter() - t0

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses_out = run(state)
        jax.device_get(losses_out)  # fetch-sync (relay)
        best = min(best, time.perf_counter() - t0)

    per_step = best / iters
    return {
        "variant": variant,
        "batch": batch,
        "ms_per_step": per_step * 1e3,
        "samples_per_sec": batch / per_step,
        "chain_tflops": batch * CHAIN_FLOPS_PER_SAMPLE / per_step / 1e12,
        "compile_s": compile_s,
        "final_loss": float(losses_out[-1]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batches", default="400,4096")
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    import jax

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rows = []
    for batch in (int(b) for b in args.batches.split(",")):
        for variant in args.variants.split(","):
            r = bench_one(batch, args.iters, variant)
            rows.append(r)
            if "error" in r:
                print(f"{variant:>18} B={batch:>5}: FAILED {r['error']}",
                      file=sys.stderr)
            else:
                print(
                    f"{variant:>18} B={batch:>5}: {r['ms_per_step']:8.2f} ms/step "
                    f"{r['samples_per_sec']:10.0f} samples/s "
                    f"~{r['chain_tflops']:5.1f} chain-TF/s "
                    f"(compile {r['compile_s']:.1f}s)",
                    file=sys.stderr,
                )
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
