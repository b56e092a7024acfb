#!/usr/bin/env python
"""Historical r4 investigation artifact: times chunked-eval scan bodies
with pieces stripped (forward only, tile+fold only, metrics only, full)
plus a batched-forward alternative.

The "scan is 45x slower" hypothesis this script was written to test turned
out to be false — the gap was an async-timing artifact (block_until_ready
does not synchronize through the axon relay) plus chip contention; see
benchmarks/README.md "eval sweep" for the real attribution.  Timings here
are now fetch-synced (device_get) so the comparisons are valid.
"""

from __future__ import annotations

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    from mri_inr_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mri_inr_tpu.configuration import load_test_configuration
    from mri_inr_tpu.eval import metrics as metrics_mod
    from mri_inr_tpu.models import modulated_siren as ms
    from mri_inr_tpu.ops import tiling
    from mri_inr_tpu.ops.siren_kernel import make_apply_fn
    from mri_inr_tpu.train import checkpoint as ckpt_lib
    from mri_inr_tpu.train.trainer import create_train_state

    model_dir = str(sorted((REPO / "runs/quality/train").glob("quality_*"))[-1])
    cfg = load_test_configuration(None, [f"data.model_path={model_dir}"])
    mcfg = cfg.model
    model = ms.from_config(mcfg)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((2, 32, 32)), "adam", 1e-4)
    step = ckpt_lib.find_latest_step(pathlib.Path(model_dir))
    state = ckpt_lib.restore_state(pathlib.Path(model_dir), step, state)
    params = state.params
    apply_fn = make_apply_fn(model, use_pallas=mcfg.use_pallas, sin5=cfg.data.sin5)

    K, H, W = 8, 320, 320
    outer, inner, siren = 32, 16, 24
    grid = tiling.grid_shape(H, W, inner)
    npatch = grid[0] * grid[1]
    num_padded = -(-npatch // 512) * 512
    rng = np.random.default_rng(0)
    fully = jax.device_put(rng.random((K, H, W), np.float32))
    under = jax.device_put(rng.random((K, H, W), np.float32))

    def bench(name, fn, *args):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        jax.device_get(f(*args))  # fetch-sync: block_until_ready lies on the relay
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            jax.device_get(f(*args))
        run = (time.perf_counter() - t0) / reps
        print(f"{name:<32} compile {compile_s:7.1f}s   run {run * 1e3:9.1f} ms",
              flush=True)
        return run

    def tile_pad(img):
        p = tiling.image_to_patches(img, outer, inner)
        padded = jnp.zeros((num_padded, outer, outer), p.dtype)
        return padded.at[: p.shape[0]].set(p), p

    def fwd_of(img):
        padded, _ = tile_pad(img)
        return apply_fn(params, padded)[:npatch].astype(jnp.float32)

    def full_single(fu, un):
        pred = fwd_of(un)
        valid = tiling.classify_black_patches(
            tiling.image_to_patches(un, outer, inner))
        pred = tiling.mask_black_patches(pred, valid)
        recon = tiling.patches_to_image_weighted_average(pred, grid, siren, inner)
        fully_img = tiling.patches_to_image(
            tiling.image_to_patches(fu, outer, inner), grid, outer, inner)
        m = metrics_mod.image_metrics(fully_img, recon)
        return m["psnr"], m["ssim"], m["nrmse"]

    def scan_over(body):
        def run(fu_stack, un_stack):
            def step_fn(c, fu_un):
                return c, body(fu_un[0], fu_un[1])
            _, out = jax.lax.scan(step_fn, jnp.float32(0), (fu_stack, un_stack))
            return out
        return run

    # pieces
    bench("single: full slice", full_single, fully[0], under[0])
    bench("scan8: forward only",
          scan_over(lambda fu, un: jnp.sum(fwd_of(un))), fully, under)
    bench("scan8: tile+pad only",
          scan_over(lambda fu, un: jnp.sum(tile_pad(un)[0])), fully, under)
    bench("scan8: fold only",
          scan_over(lambda fu, un: jnp.sum(
              tiling.patches_to_image_weighted_average(
                  tile_pad(un)[1][:, 4:28, 4:28], grid, siren, inner))),
          fully, under)
    bench("scan8: metrics only",
          scan_over(lambda fu, un: metrics_mod.image_metrics(fu, un)["ssim"]),
          fully, under)
    bench("scan8: full", scan_over(full_single), fully, under)

    # alternative: one big batched forward, vmapped fold+metrics
    def batched_chunk(fu_stack, un_stack):
        un_patches = jax.vmap(
            lambda im: tiling.image_to_patches(im, outer, inner))(un_stack)
        flat = un_patches.reshape(-1, outer, outer)
        pad_to = -(-flat.shape[0] // 512) * 512
        padded = jnp.zeros((pad_to, outer, outer), flat.dtype)
        padded = padded.at[: flat.shape[0]].set(flat)
        preds = apply_fn(params, padded)[: flat.shape[0]].astype(jnp.float32)
        preds = preds.reshape(K, npatch, siren, siren)

        def per_slice(fu, un_p, pred):
            valid = tiling.classify_black_patches(un_p)
            pred = tiling.mask_black_patches(pred, valid)
            recon = tiling.patches_to_image_weighted_average(
                pred, grid, siren, inner)
            fully_img = tiling.patches_to_image(
                tiling.image_to_patches(fu, outer, inner), grid, outer, inner)
            m = metrics_mod.image_metrics(fully_img, recon)
            return m["psnr"], m["ssim"], m["nrmse"]

        return jax.vmap(per_slice)(fu_stack, un_patches, preds)

    bench("batched8: 1 fwd + vmap fold", batched_chunk, fully, under)


if __name__ == "__main__":
    main()
