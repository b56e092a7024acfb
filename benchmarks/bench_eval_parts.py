#!/usr/bin/env python
"""Stage-by-stage timing of the per-slice eval pipeline at 320x320 (the
unit the 940-file sweep repeats): tile-extract gather, fused forward,
weighted fold (scatter-free parity formulation), plain folds, metrics
(PSNR/SSIM/NRMSE), and the whole fused chain.

Each stage is timed as one jitted lax.scan over ITERS perturbed inputs
(relay-memoization-proof, dispatch-amortized), mirroring bench.py.

Usage: python benchmarks/bench_eval_parts.py [stage ...]
  stages: tile forward wfold pfold metrics chain   (default: all)
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from mri_inr_tpu.data.synthetic import phantom_slice
from mri_inr_tpu.eval import metrics as metrics_mod
from mri_inr_tpu.models.modulated_siren import ModulatedSiren
from mri_inr_tpu.ops import tiling
from mri_inr_tpu.ops.siren_kernel import make_apply_fn

SIZE, ITERS = 320, 20

model = ModulatedSiren(dim_hidden=256, latent_dim=256, num_layers=5,
                       dropout=0.1, compute_dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
img = jnp.asarray(phantom_slice(rng, SIZE, SIZE))
img2 = jnp.asarray(phantom_slice(rng, SIZE, SIZE))
params = model.init(jax.random.key(0), jnp.zeros((8, 32, 32)))["params"]
apply_fn = make_apply_fn(model, sin5=True)  # the EvalConfig-promoted default
grid = tiling.grid_shape(SIZE, SIZE, 16)
n = grid[0] * grid[1]
patches0 = tiling.image_to_patches(img, 32, 16)
padded0 = jnp.zeros((512, 32, 32), jnp.float32).at[:n].set(patches0)
pred0 = jnp.asarray(rng.uniform(size=(n, 24, 24)).astype(np.float32))


def timeit(name, body):
    run = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))[0])
    t0 = time.perf_counter()
    float(run())  # fetch-sync: block_until_ready lies through the axon relay
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run())  # fetch-sync: block_until_ready lies through the axon relay
        best = min(best, time.perf_counter() - t0)
    print(f"{name:>28}: {best / ITERS * 1e3:7.2f} ms/call "
          f"(compile {compile_s:.0f}s)", flush=True)


STAGES = {
    "tile": lambda c, i: (
        c + tiling.image_to_patches(img + i * 1e-6, 32, 16).mean(), None),
    "forward": lambda c, i: (
        c + apply_fn(params, padded0 + i * 1e-6).astype(jnp.float32).mean(),
        None),
    "wfold": lambda c, i: (
        c + tiling.patches_to_image_weighted_average(
            pred0 + i * 1e-6, grid, 24, 16).mean(), None),
    "pfold": lambda c, i: (
        c + tiling.patches_to_image(padded0[:n] + i * 1e-6, grid, 32, 16)
        .mean(), None),
    "metrics": lambda c, i: (
        c + sum(metrics_mod.image_metrics(img + i * 1e-6, img2).values()),
        None),
}


def chain(c, i):
    im_u = img + i * 1e-6
    im_f = img2 + i * 1e-6
    up = tiling.image_to_patches(im_u, 32, 16)
    fp = tiling.image_to_patches(im_f, 32, 16)
    valid = tiling.classify_black_patches(up)
    padded = jnp.zeros((512, 32, 32), up.dtype).at[:n].set(up)
    pred = apply_fn(params, padded)[:n].astype(jnp.float32)
    pred = tiling.mask_black_patches(pred, valid)
    recon = tiling.patches_to_image_weighted_average(pred, grid, 24, 16)
    fully = tiling.patches_to_image(fp, grid, 32, 16)
    m = metrics_mod.image_metrics(fully, recon)
    return c + m["psnr"] + m["ssim"] + m["nrmse"], None


STAGES["chain"] = chain


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    for name in (sys.argv[1:] or ["tile", "forward", "wfold", "pfold",
                                  "metrics", "chain"]):
        timeit(name, STAGES[name])


if __name__ == "__main__":
    main()
