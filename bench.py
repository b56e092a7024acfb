#!/usr/bin/env python
"""Benchmark: modulated-SIREN evaluation throughput on one TPU chip.

Prints ONE JSON line:
    {"metric": "siren_eval_pixels_per_sec", "value": ..., "unit": "pixel/s",
     "vs_baseline": ...}

Methodology: the timed region is a single jitted ``lax.scan`` that runs the
full flagship forward (conv encoder -> modulator -> 5-layer modulated SIREN
-> 24x24 output) ITERS times with a per-iteration input perturbation.
One dispatch total, so per-call host/relay latency is amortized (the axon
relay has a measured ~23.5 ms fixed round-trip per dispatch — ITERS=100
keeps it under 3% of the total) AND identical-execution memoization by
the relay (observed: repeated same-input calls return in ~0.1 ms) cannot
fake the number.

``vs_baseline`` is the ratio to an analytic estimate of the reference
PyTorch implementation on an A100 (the reference publishes no throughput
numbers — see BASELINE.md): ~377 MFLOP per 32x32 patch at a generous 25%
fp16 utilization of 312 TFLOP/s -> ~1.0e8 pixels/s. North star: >=5x.
"""

from __future__ import annotations

import json
import sys
import time


A100_BASELINE_PIXELS_PER_SEC = 1.0e8
BATCH = 4096
ITERS = 100
SIREN = 24
# exact count (see benchmarks/README.md roofline): encoder 0.96 MF +
# modulator 1.18 MF + SIREN chain 302.0 MF + final projection 0.29 MF
FLOPS_PER_PATCH = 3.044e8


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mri_inr_tpu.models.modulated_siren import ModulatedSiren
    from mri_inr_tpu.ops import siren_kernel

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    model = ModulatedSiren(
        dim_hidden=256,
        latent_dim=256,
        num_layers=5,
        dropout=0.1,
        compute_dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(rng.uniform(size=(BATCH, 32, 32)).astype(np.float32))
    params = model.init(jax.random.key(0), tiles[:8])["params"]
    # fused Pallas modulator+SIREN kernel on TPU, Flax/XLA path elsewhere
    # sin5=True is the EvalConfig-promoted default; the library default
    # stays degree-7 (bit-parity), so the headline passes it explicitly
    apply_fn = siren_kernel.make_apply_fn(model, sin5=True)

    def body(carry, i):
        x = tiles + i.astype(jnp.float32) * 1e-6  # defeat execution memoization
        out = apply_fn(params, x)
        return carry + out.astype(jnp.float32).mean(), None

    run = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))[0])

    # sync via value fetch: through the axon relay jax.block_until_ready
    # resolves without waiting for the remote device (measured r4,
    # scripts/profile_eval.py) — float() is the only true barrier. The
    # fetch adds one ~30 ms round trip per ~800 ms timed region (<4%).
    # The relay occasionally returns a transient INTERNAL error on the
    # first execution after compile (observed r4); retry before giving up.
    t0 = time.perf_counter()
    for attempt in range(3):
        try:
            float(run())
            break
        # only the relay's transient backend failures are retryable;
        # deterministic bugs (shape errors, OOM tracebacks) surface at once
        except jax.errors.JaxRuntimeError as exc:
            if attempt == 2:
                raise
            print(f"first execution failed ({exc}); retrying", file=sys.stderr)
            time.sleep(10)
    print(f"compile+first: {time.perf_counter() - t0:.2f}s", file=sys.stderr)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run())
        best = min(best, time.perf_counter() - t0)

    per_call = best / ITERS
    pixels_per_sec = BATCH * SIREN * SIREN / per_call
    tflops = BATCH * FLOPS_PER_PATCH / per_call / 1e12
    print(
        f"batch={BATCH}: {per_call * 1e3:.2f} ms/call -> "
        f"{pixels_per_sec:.3e} px/s (~{tflops:.1f} TF/s bf16)",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "siren_eval_pixels_per_sec",
                "value": pixels_per_sec,
                "unit": "pixel/s",
                "vs_baseline": pixels_per_sec / A100_BASELINE_PIXELS_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
