#!/usr/bin/env python
"""Eval-kernel schedule sweep on the real chip (block_b x streams x sine
poly), plus a pure-MXU calibration run (activation = identity) that anchors
the roofline argument in benchmarks/README.md.

Usage: python benchmarks/bench_sweep.py [configs...]
  config tokens: bb8.s1.sin9 | bb8.s2.sin7 | bb8.s1.ident | bb8.s1.sin7.k2 ...
  (optional trailing .kN = ksplit cross-phase pipelining)
  default sweep: bb8.s1.sin9 bb8.s1.sin7 bb8.s2.sin7 bb16.s1.sin7 bb8.s1.ident
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from mri_inr_tpu.models.modulated_siren import ModulatedSiren, coordinate_grid
from mri_inr_tpu.ops import siren_kernel as sk

BATCH, ITERS = 4096, 20

model = ModulatedSiren(dim_hidden=256, latent_dim=256, num_layers=5,
                       dropout=0.1, compute_dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
tiles = jnp.asarray(rng.uniform(size=(BATCH, 32, 32)).astype(np.float32))
params = model.init(jax.random.key(0), tiles[:8])["params"]
kp = sk.extract_kernel_params(params, coordinate_grid(24))
latents = model.apply({"params": params}, tiles, method=model.encode).astype(jnp.float32)
latents = jax.block_until_ready(latents)


def timed(tag, bb, streams, sin7, sin_bf16=False, sin5=False, ksplit=1):
    # fused_siren_forward is a module-level @jax.jit whose trace cache keys
    # only on static args — without this, a monkeypatched _poly_sin /
    # fast_sin7 (ident / sin7ne calibration rows) silently reuses the
    # cached real-sine trace and times the wrong kernel (ADVICE r3).
    sk.fused_siren_forward.clear_cache()

    def body(c, i):
        out = sk.fused_siren_forward(
            kp, latents + i * 1e-6, block_b=bb, streams=streams, sin7=sin7,
            sin_bf16=sin_bf16, sin5=sin5, ksplit=ksplit,
        )
        return c + out.mean(), None

    run = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))[0])
    # float() sync: block_until_ready does not wait through the axon relay
    t0 = time.perf_counter()
    float(run())
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run())
        best = min(best, time.perf_counter() - t0)
    ms = best / ITERS * 1e3
    px = BATCH * 576 / (best / ITERS)
    print(f"{tag:>16}: {ms:7.2f} ms/call  {px:.3e} px/s", flush=True)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    configs = sys.argv[1:] or [
        "bb8.s1.sin9", "bb8.s1.sin7", "bb8.s2.sin7", "bb16.s1.sin7",
        "bb8.s1.ident",
    ]
    orig_sin = sk._poly_sin
    orig_sin7 = sk.fast_sin7
    for tok in configs:
        parts = tok.split(".")
        bb_s, st_s, poly = parts[:3]
        bb, st = int(bb_s[2:]), int(st_s[1:])
        ks = int(parts[3][1:]) if len(parts) > 3 else 1
        if poly == "ident":
            # pure-MXU calibration: activation becomes a no-op; result is
            # wrong but the schedule/DMA structure is identical
            sk._poly_sin = lambda x: x
            try:
                timed(tok, bb, st, sin7=False, ksplit=ks)
            finally:
                sk._poly_sin = orig_sin
        elif poly == "sin7b":
            # bf16 polynomial tail + bf16 FiLM multiply (packed-VPU probe)
            timed(tok, bb, st, sin7=False, sin_bf16=True, ksplit=ks)
        elif poly == "sin7ne":
            # round-to-nearest-even range reduction: one hardware round vs
            # the floor(+0.5) pair, if Mosaic lowers lax.round natively
            import jax.lax as lax

            from mri_inr_tpu.ops import fast_math as fm

            def sin7_ne(x, _fm=fm, _lax=lax):
                v = x.astype(jnp.float32)
                r = _lax.round(v * _fm.INV_TWO_PI,
                               _lax.RoundingMethod.TO_NEAREST_EVEN)
                v = v - _fm.TWO_PI * jax.lax.stop_gradient(r)
                v2 = v * v
                p = _fm._D2 + v2 * _fm._D3
                p = _fm._D1 + v2 * p
                p = _fm._D0 + v2 * p
                return v * p

            sk.fast_sin7 = sin7_ne
            try:
                timed(tok, bb, st, sin7=True, ksplit=ks)
            finally:
                sk.fast_sin7 = orig_sin7
        elif poly == "sin5":
            timed(tok, bb, st, sin7=False, sin5=True, ksplit=ks)
        else:
            timed(tok, bb, st, sin7=(poly == "sin7"), ksplit=ks)


if __name__ == "__main__":
    main()
