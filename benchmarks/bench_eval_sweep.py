#!/usr/bin/env python
"""End-to-end evaluation-sweep throughput: slices/s through the full
tile -> forward (fused kernel) -> weighted fold -> PSNR/SSIM/NRMSE chain —
the loop the reference runs over 940 validation files
(``test_mod_siren.py:175-255``).

Unlike bench.py (bare model forward), the timed unit here is the
SliceReconstructor's whole jitted per-slice pipeline on fastMRI-shaped
320x320 slices. The first call compiles; the sweep then scores N distinct
synthetic slices (distinct inputs, so relay memoization cannot fake it).

Usage: python benchmarks/bench_eval_sweep.py [--slices 64]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slices", type=int, default=64)
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--chunk", type=int, default=8,
                    help="slices per dispatch (1 = per-slice loop)")
    ap.add_argument("--flax", action="store_true", help="Flax apply instead of fused")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mri_inr_tpu.data.synthetic import phantom_slice
    from mri_inr_tpu.eval.evaluate import SliceReconstructor
    from mri_inr_tpu.models.modulated_siren import ModulatedSiren
    from mri_inr_tpu.ops.siren_kernel import make_apply_fn

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    model = ModulatedSiren(
        dim_hidden=256, latent_dim=256, num_layers=5, dropout=0.1,
        compute_dtype=jnp.bfloat16,
    )
    params = model.init(jax.random.key(0), jnp.zeros((8, 32, 32)))["params"]
    recon = SliceReconstructor(
        make_apply_fn(model, use_pallas=not args.flax, sin5=True),
        patch_bucket=512
    )

    rng = np.random.default_rng(0)
    slices = [
        (phantom_slice(rng, args.size, args.size),
         phantom_slice(rng, args.size, args.size))
        for _ in range(args.slices)
    ]

    # compile + warm
    t0 = time.perf_counter()
    if args.chunk > 1:
        f0 = np.stack([f for f, _ in slices[: args.chunk]])
        u0 = np.stack([u for _, u in slices[: args.chunk]])
        out = recon.metrics_chunk(params, f0, u0)
        jax.block_until_ready(out[0])
    else:
        out = recon(params, slices[0][0], slices[0][1])
        jax.block_until_ready(out[3]["psnr"])
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    acc = 0.0
    if args.chunk > 1:
        for start in range(0, args.slices, args.chunk):
            grp = slices[start : start + args.chunk]
            grp += [grp[-1]] * (args.chunk - len(grp))
            fully = np.stack([f for f, _ in grp])
            under = np.stack([u for _, u in grp])
            psnr, _, _ = recon.metrics_chunk(params, fully, under)
            acc += float(psnr[0])
    else:
        for fully, under in slices:
            _, _, _, m = recon(params, fully, under)
            acc += float(m["psnr"])
    wall = time.perf_counter() - t0
    per_slice = wall / args.slices
    print(
        f"{args.slices} slices ({args.size}x{args.size}, chunk={args.chunk}): "
        f"{per_slice * 1e3:.1f} ms/slice -> {1.0 / per_slice:.2f} slices/s "
        f"(940-file sweep would take {940 * per_slice:.0f}s on one chip)",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "eval_sweep_slices_per_sec",
        "value": 1.0 / per_slice,
        "unit": "slice/s",
        "path": "flax" if args.flax else "fused",
        "image": args.size,
        "chunk": args.chunk,
    }))


if __name__ == "__main__":
    main()
