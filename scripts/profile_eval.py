#!/usr/bin/env python
"""Attribute the 940-file eval sweep's wall clock (VERDICT r3 item 1).

The fused forward kernel sustains ~2.9e8 px/s (~350 slices/s of model
compute) yet the committed 940-slice sweep measured 0.54 slices/s.  This
script times every phase of the pipeline separately on the real chip:

  - checkpoint restore
  - host-side np.load of the slice pairs
  - host->device transfer bandwidth through the axon relay
  - bare dispatch round-trip latency
  - first-call compile of the chunked metrics program
  - steady-state chunked dispatch (the number that should dominate)
  - the fused forward alone on a device-resident batch
  - per-slice (unchunked) path for comparison

and prints a wall-clock attribution table plus one JSON line for
benchmarks/README.md.  Reference hot loop being attributed:
``/root/reference/test_mod_siren.py:175-255``.

MEASUREMENT CAVEAT (the round-3 "600x mystery" in one lesson): through
the axon relay ``jax.block_until_ready`` resolves without waiting for
the remote device — the only true synchronization point is an actual
value fetch (``np.asarray``/``float``).  Every timing below therefore
syncs by fetching.  The first fetch after a fresh compile additionally
pays a one-time ~1-2 min server-side program load that client-side
"compile time" does not show.

Usage: python scripts/profile_eval.py [--slices 64] [--chunk 8]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default=None)
    ap.add_argument("--dataset", default=str(
        REPO / "runs/results/sweep940/data/processed/metadata.csv"))
    ap.add_argument("--slices", type=int, default=64,
                    help="slices for the steady-state measurement")
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--trace-dir", default=None,
                    help="optional jax.profiler trace output dir")
    args = ap.parse_args()

    from mri_inr_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mri_inr_tpu.configuration import load_test_configuration
    from mri_inr_tpu.data.dataset import MRISampler
    from mri_inr_tpu.eval.evaluate import SliceReconstructor
    from mri_inr_tpu.models import modulated_siren as ms
    from mri_inr_tpu.ops.siren_kernel import make_apply_fn
    from mri_inr_tpu.train import checkpoint as ckpt_lib
    from mri_inr_tpu.train.trainer import create_train_state
    from mri_inr_tpu.utils.profiling import SectionTimer, device_trace

    model_dir = args.model_dir or str(
        sorted((REPO / "runs/quality/train").glob("quality_*"))[-1])

    timer = SectionTimer()
    cfg = load_test_configuration(None, [
        f"data.dataset={args.dataset}",
        f"data.model_path={model_dir}",
        "data.max_slice_num=100",
        "data.batch_patches=512",
    ])
    ecfg, mcfg = cfg.data, cfg.model

    with timer.section("checkpoint_restore"):
        model = ms.from_config(mcfg)
        state = create_train_state(
            model, jax.random.key(0),
            jnp.zeros((2, mcfg.outer_patch_size, mcfg.outer_patch_size)),
            "adam", 1e-4,
        )
        step = ckpt_lib.find_latest_step(pathlib.Path(model_dir))
        state = ckpt_lib.restore_state(pathlib.Path(model_dir), step, state)
    print(f"restored {model_dir} step {step}", flush=True)

    sampler = MRISampler(
        ecfg.dataset, center_fraction=ecfg.center_fraction,
        acceleration=ecfg.acceleration, mri_type=ecfg.mri_type,
        max_slice_num=ecfg.max_slice_num,
    )
    n = min(args.slices, len(sampler))

    # ---- host-side load --------------------------------------------------
    with timer.section("host_np_load"):
        pairs = [sampler.next_sample() for _ in range(n)]
    h, w = pairs[0].fully_sampled.shape
    print(f"loaded {n} slices of {h}x{w} "
          f"({timer.sections['host_np_load'] / n * 1e3:.1f} ms/slice)",
          flush=True)

    # ---- bare fetch round-trip latency (the true sync primitive) --------
    one = jax.device_put(np.float32(1.0))
    f = jax.jit(lambda x: x + 1)
    float(f(one))  # warm + force server-side program load
    t0 = time.perf_counter()
    for _ in range(16):
        float(f(one))
    lat = (time.perf_counter() - t0) / 16
    timer.sections["fetch_round_trip"] = lat
    print(f"dispatch+fetch round-trip: {lat * 1e3:.1f} ms", flush=True)

    # ---- raw H2D bandwidth (fresh buffer each rep: the relay elides
    # repeated puts of an identical host buffer) ---------------------------
    probe = jax.jit(lambda x: x.ravel()[0])
    nbytes = pairs[0].fully_sampled.nbytes * args.chunk
    rng = np.random.default_rng(0)
    reps = 6
    t0 = time.perf_counter()
    for _ in range(reps):
        fresh = rng.random((args.chunk, h, w)).astype(np.float32)
        float(probe(jax.device_put(fresh)))
    h2d_secs = (time.perf_counter() - t0) / reps - lat
    timer.sections["h2d_per_chunk"] = h2d_secs
    h2d_mbps = nbytes / h2d_secs / 1e6
    print(f"h2d: {nbytes / 1e6:.1f} MB chunk in {h2d_secs * 1e3:.1f} ms "
          f"= {h2d_mbps:.0f} MB/s (incl. host stacking)", flush=True)

    # ---- fused forward alone on device-resident batch -------------------
    apply_fn = make_apply_fn(model, use_pallas=mcfg.use_pallas, sin5=cfg.data.sin5)
    patches = jax.device_put(
        np.random.default_rng(0).random((512, 32, 32), np.float32))
    fwd = jax.jit(lambda p, x: apply_fn(p, x).ravel()[0])
    with timer.section("forward_compile"):
        float(fwd(state.params, patches))
    t0 = time.perf_counter()
    for _ in range(16):
        float(fwd(state.params, patches))
    fwd_secs = (time.perf_counter() - t0) / 16 - lat
    timer.sections["forward_512patches"] = fwd_secs
    print(f"fused forward 512 patches: {fwd_secs * 1e3:.2f} ms "
          f"(fetch RTT subtracted)", flush=True)

    reconstructor = SliceReconstructor(
        apply_fn,
        outer_patch_size=mcfg.outer_patch_size,
        inner_patch_size=mcfg.inner_patch_size,
        siren_patch_size=mcfg.siren_patch_size,
        patch_bucket=ecfg.batch_patches,
    )

    # ---- chunked path: compile (+ first real fetch = server program
    # load) then pipelined steady state -----------------------------------
    fully = np.stack([p.fully_sampled for p in pairs[: args.chunk]])
    under = np.stack([p.undersampled for p in pairs[: args.chunk]])
    with timer.section("chunk_compile_and_first_fetch"):
        reconstructor.metrics_chunk(state.params, fully, under)

    from mri_inr_tpu.eval.evaluate import evaluate_files_chunked

    class _ListSampler:
        def __init__(self, pairs):
            self.pairs, self._i = pairs, 0

        def __len__(self):
            return len(self.pairs)

        def next_sample(self):
            p = self.pairs[self._i % len(self.pairs)]
            self._i += 1
            return p

    nchunks = max(1, n // args.chunk)
    with device_trace(args.trace_dir):
        t0 = time.perf_counter()
        scored = nchunks * args.chunk
        evaluate_files_chunked(
            reconstructor, state.params, _ListSampler(pairs),
            num_samples=scored, chunk=args.chunk, progress_every=0,
        )
        chunk_secs = time.perf_counter() - t0
    timer.sections["steady_chunked_sweep"] = chunk_secs
    chunked_sps = scored / chunk_secs
    print(f"steady chunked (pipelined): {scored} slices in {chunk_secs:.2f}s "
          f"= {chunked_sps:.2f} slices/s", flush=True)

    # ---- per-slice path for comparison ----------------------------------
    with timer.section("per_slice_compile"):
        _, _, _, met = reconstructor(state.params, pairs[0].fully_sampled,
                                     pairs[0].undersampled)
        float(met["psnr"])
    t0 = time.perf_counter()
    m = min(n, 16)
    for p in pairs[:m]:
        _, _, _, met = reconstructor(state.params, p.fully_sampled,
                                     p.undersampled)
        _ = float(met["psnr"])
    per_slice_secs = (time.perf_counter() - t0) / m
    timer.sections["per_slice_steady_x16"] = per_slice_secs * m
    print(f"per-slice path: {per_slice_secs * 1e3:.1f} ms/slice "
          f"= {1 / per_slice_secs:.2f} slices/s", flush=True)

    print("\n=== wall-clock attribution ===")
    print(timer.report(), flush=True)

    reading = {
        "platform": jax.devices()[0].platform,
        "slices_measured": scored,
        "chunk": args.chunk,
        "host_load_ms_per_slice": round(
            timer.sections["host_np_load"] / n * 1e3, 2),
        "h2d_MBps": round(h2d_mbps, 1),
        "fetch_round_trip_ms": round(lat * 1e3, 2),
        "forward_512patches_ms": round(fwd_secs * 1e3, 3),
        "chunk_compile_s": round(
            timer.sections["chunk_compile_and_first_fetch"], 1),
        "chunked_slices_per_sec": round(chunked_sps, 2),
        "per_slice_slices_per_sec": round(1 / per_slice_secs, 2),
    }
    print("PROFILE " + json.dumps(reading), flush=True)


if __name__ == "__main__":
    main()
