"""Evaluation runtime: jitted per-slice reconstruction + the validation
sweep (940-file scale), shardable across devices and hosts.

Reference behavior reproduced (``src/util/error.py:104-271`` and
``test_mod_siren.py:78-255``, studied not copied): per slice — classify
black patches on the *undersampled* tiles, run the model on informative
patches, reintegrate zeros, weighted-fold to the reconstruction, plain-fold
the fully-sampled/undersampled tiles for reference images, then
PSNR/SSIM/NRMSE of fully-sampled vs reconstruction; per run —
``metrics_error.csv`` (FILENAME,PSNR,SSIM,NRMSE) and a mean/std/min/max
``metrics_summary.txt``.

TPU-native design: a slice's patches go through the model as ONE static
padded batch (bucketed to a multiple of 512); black patches are masked, not
filtered (exactly equivalent, see ops/tiling.py); the whole
tile -> forward -> fold -> metrics chain is one jit per image-size bucket.
The sweep fans files out round-robin (``MRISampler.shard``) across hosts —
the pod-parallel axis — while each host's chips share the patch batch via
the data mesh.
"""

from __future__ import annotations

import csv
import pathlib
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from mri_inr_tpu.eval import metrics as metrics_mod
from mri_inr_tpu.ops import tiling


def _bucket(n: int, multiple: int = 512) -> int:
    return -(-n // multiple) * multiple


@dataclass
class SliceResult:
    slice_id: str
    psnr: float
    ssim: float
    nrmse: float


class SliceReconstructor:
    """Jitted slice -> (reconstruction, metrics) pipeline. One compiled
    executable per (image shape) bucket; fastMRI brain is almost uniformly
    320x320 so recompilation is rare."""

    def __init__(
        self,
        apply_fn,
        outer_patch_size: int = 32,
        inner_patch_size: int = 16,
        siren_patch_size: int = 24,
        patch_bucket: int = 512,
        mesh=None,
        halo: bool = False,
    ):
        """``halo=True`` (with a mesh): the weighted overlap-add fold runs
        distributed via the ICI halo exchange
        (``parallel.halo_fold.sharded_patches_to_image_weighted_average``)
        instead of on one device — the large-FOV mode where the patch grid
        of a single image exceeds one chip (requires the vertical patch
        count to be divisible by the mesh's data-axis size; falls back to
        the single-device fold otherwise)."""
        self.apply_fn = apply_fn
        self.outer = outer_patch_size
        self.inner = inner_patch_size
        self.siren = siren_patch_size
        self.patch_bucket = patch_bucket
        self.mesh = mesh
        self.halo = halo
        self._jitted = {}
        self._replicated_params_id = None

    def _replicate(self, params):
        """With a mesh, checkpoint-restored params arrive committed to
        device 0 — a shard_map-under-jit over the full mesh rejects that
        placement. Replicate them across the mesh once (cached by id)."""
        if self.mesh is None:
            return params
        if self._replicated_params_id != id(params):
            from jax.sharding import NamedSharding, PartitionSpec

            self._params = jax.device_put(
                params, NamedSharding(self.mesh, PartitionSpec())
            )
            self._replicated_params_id = id(params)
        return self._params

    def _build(self, height: int, width: int, num_padded: int,
               metrics_only: bool = False):
        """``metrics_only``: skip the fully/under reference folds (the
        metric sweep never reads them, and the plain overlap-add fold of
        unfiltered patches reproduces the input image exactly — every
        overlapping copy holds identical values, so the average is the
        original up to ~1e-7 fp reassociation; asserted in
        tests/test_eval_device.py). Saves one gather + two folds per slice
        in the scanned sweep body."""
        outer, inner, siren = self.outer, self.inner, self.siren
        grid = tiling.grid_shape(height, width, inner)
        apply_fn = self.apply_fn

        mesh = self.mesh
        if mesh is not None:
            # shard the padded patch batch over the data axis via shard_map:
            # each device runs apply_fn on its local rows. (A pallas_call
            # under a plain with_sharding_constraint would make XLA gather
            # the batch onto one device — shard_map keeps it distributed
            # for both the Flax and the fused-kernel apply_fn.)
            from jax.sharding import PartitionSpec as P

            sharded_apply = jax.shard_map(
                lambda p, x: apply_fn(p, x),
                mesh=mesh,
                in_specs=(P(), P("data")),
                out_specs=P("data"),
                check_vma=False,
            )
        else:
            sharded_apply = apply_fn

        def run(params, fully_img, under_img):
            under_patches = tiling.image_to_patches(under_img, outer, inner)
            n = under_patches.shape[0]
            valid = tiling.classify_black_patches(under_patches)
            padded = jnp.zeros((num_padded, outer, outer), under_patches.dtype)
            padded = padded.at[:n].set(under_patches)
            pred = sharded_apply(params, padded)[:n].astype(jnp.float32)
            pred = tiling.mask_black_patches(pred, valid)
            if mesh is not None and self.halo and grid[0] % mesh.shape["data"] == 0:
                from mri_inr_tpu.parallel import halo_fold

                recon = halo_fold.sharded_patches_to_image_weighted_average(
                    pred, grid, siren, inner, mesh
                )
            else:
                recon = tiling.patches_to_image_weighted_average(
                    pred, grid, siren, inner
                )
            if metrics_only:
                return metrics_mod.image_metrics(
                    fully_img.astype(jnp.float32), recon
                )
            fully_patches = tiling.image_to_patches(fully_img, outer, inner)
            fully = tiling.patches_to_image(fully_patches, grid, outer, inner)
            under = tiling.patches_to_image(under_patches, grid, outer, inner)
            m = metrics_mod.image_metrics(fully, recon)
            return recon, fully, under, m

        return jax.jit(run)

    def __call__(self, params, fully_img: np.ndarray, under_img: np.ndarray):
        height, width = under_img.shape
        nv, nh = tiling.grid_shape(height, width, self.inner)
        num_padded = _bucket(nv * nh, self.patch_bucket)
        key = (height, width, num_padded)
        if key not in self._jitted:
            self._jitted[key] = self._build(height, width, num_padded)
        return self._jitted[key](
            self._replicate(params), jnp.asarray(fully_img), jnp.asarray(under_img)
        )

    def _build_many(self, height: int, width: int, num_padded: int, chunk: int):
        """Metrics-only pipeline scanned over a (chunk, H, W) slice stack —
        ONE dispatch scores ``chunk`` slices (the host<->device round trip
        otherwise dominates the 940-file sweep: ~23.5 ms/dispatch through
        the axon relay vs ~2 ms of compute per 320x320 slice)."""
        single = self._build(height, width, num_padded, metrics_only=True)

        def run_many(params, fully_stack, under_stack):
            def body(carry, fu):
                m = single(params, fu[0], fu[1])
                return carry, (m["psnr"], m["ssim"], m["nrmse"])

            _, ms = jax.lax.scan(
                body, jnp.float32(0), (fully_stack, under_stack)
            )
            # one (3, K) array -> ONE device->host fetch per chunk.  Through
            # the axon relay a scalar fetch costs ~8 ms of round-trip
            # latency; fetching 3*K python floats used to dominate the
            # whole sweep (measured: 24 scalar fetches ~= 0.2 s/chunk vs
            # ~5 ms of actual compute).
            return jnp.stack(ms)

        return jax.jit(run_many)

    def metrics_chunk_async(
        self, params, fully_stack: np.ndarray, under_stack: np.ndarray
    ):
        """(K, H, W) fully/under stacks -> a DEVICE (3, K) array of
        (psnr, ssim, nrmse) rows, dispatched asynchronously — fetch with
        ``np.asarray`` when the value is needed.  Lets the sweep pipeline
        host stacking + H2D of the next chunk against device compute of
        this one."""
        k, height, width = under_stack.shape
        nv, nh = tiling.grid_shape(height, width, self.inner)
        num_padded = _bucket(nv * nh, self.patch_bucket)
        key = ("many", height, width, num_padded, k)
        if key not in self._jitted:
            self._jitted[key] = self._build_many(height, width, num_padded, k)
        return self._jitted[key](
            self._replicate(params), jnp.asarray(fully_stack), jnp.asarray(under_stack)
        )

    def metrics_chunk(
        self, params, fully_stack: np.ndarray, under_stack: np.ndarray
    ):
        """(K, H, W) fully/under stacks -> (psnr, ssim, nrmse) numpy arrays
        of length K (blocking; one device dispatch + one fetch)."""
        out = np.asarray(
            self.metrics_chunk_async(params, fully_stack, under_stack)
        )
        return out[0], out[1], out[2]


def evaluate_files(
    reconstructor: SliceReconstructor,
    params,
    sampler,
    num_samples: int | None = None,
    progress_every: int = 100,
    log=print,
) -> list[SliceResult]:
    """Score ``num_samples`` slices (default: the sampler's full shard)."""
    total = len(sampler) if num_samples is None else min(num_samples, len(sampler))
    results = []
    for i in range(total):
        pair = sampler.next_sample()
        _, _, _, m = reconstructor(params, pair.fully_sampled, pair.undersampled)
        # one stacked fetch instead of three scalar round trips (each
        # costs ~8-32 ms through the axon relay)
        vals = np.asarray(jnp.stack([m["psnr"], m["ssim"], m["nrmse"]]))
        results.append(
            SliceResult(
                slice_id=pair.slice_id,
                psnr=float(vals[0]),
                ssim=float(vals[1]),
                nrmse=float(vals[2]),
            )
        )
        if progress_every and (i + 1) % progress_every == 0:
            log(f"evaluated {i + 1}/{total} slices")
    return results


def evaluate_files_chunked(
    reconstructor: SliceReconstructor,
    params,
    sampler,
    num_samples: int | None = None,
    chunk: int = 8,
    progress_every: int = 100,
    log=print,
    inflight: int = 4,
) -> list[SliceResult]:
    """Metric sweep with ``chunk`` slices scored per device dispatch
    (metrics only — the visual pass keeps the per-slice path). Slices are
    grouped by image shape; a trailing partial chunk is padded by repeating
    its last slice and trimmed. Equivalent results to
    :func:`evaluate_files` (tested), ~chunk x fewer dispatches.

    Chunks are software-pipelined: up to ``inflight`` chunks are dispatched
    before the oldest result is fetched, so host-side stacking + H2D of
    chunk i+1 overlaps device compute of chunk i and each chunk pays ONE
    D2H fetch (the (3, K) metric array) instead of 3*K scalar round trips
    — through the axon relay the scalar fetches alone used to cost ~40x
    the compute."""
    import time

    total = len(sampler) if num_samples is None else min(num_samples, len(sampler))
    pairs = [sampler.next_sample() for _ in range(total)]
    results: dict[int, SliceResult] = {}
    by_shape: dict[tuple[int, int], list[int]] = {}
    for i, p in enumerate(pairs):
        by_shape.setdefault(p.fully_sampled.shape, []).append(i)

    pending: list[tuple[list[int], object]] = []
    done = 0
    t_start = time.perf_counter()

    def drain_one():
        nonlocal done
        grp, fut = pending.pop(0)
        vals = np.asarray(fut)
        for j, i in enumerate(grp):
            results[i] = SliceResult(
                slice_id=pairs[i].slice_id,
                psnr=float(vals[0, j]),
                ssim=float(vals[1, j]),
                nrmse=float(vals[2, j]),
            )
        done += len(grp)
        if progress_every and done % progress_every < len(grp):
            dt = time.perf_counter() - t_start
            log(f"evaluated {done}/{total} slices "
                f"({dt:.1f}s, {done / dt:.1f} slices/s)")

    for shape, idxs in by_shape.items():
        for start in range(0, len(idxs), chunk):
            grp = idxs[start : start + chunk]
            padded = grp + [grp[-1]] * (chunk - len(grp))
            fully = np.stack([pairs[i].fully_sampled for i in padded])
            under = np.stack([pairs[i].undersampled for i in padded])
            fut = reconstructor.metrics_chunk_async(params, fully, under)
            pending.append((grp, fut))
            while len(pending) >= inflight:
                drain_one()
    while pending:
        drain_one()
    return [results[i] for i in range(total)]


def evaluate_files_device(
    reconstructor: SliceReconstructor,
    params,
    sampler,
    num_samples: int | None = None,
    bucket: int = 128,
    log=print,
    steady_probe: bool = False,
) -> tuple[list[SliceResult], dict[str, float]]:
    """Device-resident metric sweep: the slice stacks stay in HBM
    end-to-end and the whole sweep is ONE dispatch per image shape with a
    single (3, K) fetch per dispatch.

    This is the framework's thesis path for the reference's 940-file
    validation loop (``test_mod_siren.py:175-255``): where the chunked host
    sweep round-trips every image host<->device (2 x 0.41 MB/slice through
    the axon relay — the measured bottleneck at ~50-60 slices/s while the
    model computes at ~1600 slices/s), this path

    - **online mode** (sampler has ``device_stacks``): reorders the
      already-HBM-resident image stacks with one ``jnp.take`` — zero host
      transfers of image data in the whole sweep;
    - **offline mode**: loads + stacks the ``.npy`` slices on the host and
      uploads each shape-group ONCE, then never transfers again.

    The sweep length is padded to a multiple of ``bucket`` (repeating the
    final slice; padding rows are scored and discarded) so shard sweeps of
    nearby sizes reuse the same compiled program — through the relay a NEW
    program pays a 45-540 s one-time server-side load, so program identity
    matters more than the ~bucket/2 slices of wasted compute (~0.04 s).

    Returns ``(results, timings)`` where ``timings`` splits staging (host
    load + H2D upload; ~0 online), dispatch (client trace+compile) and
    execute+fetch (program load + device compute + the one small D2H).

    ``steady_probe=True`` re-executes the largest group's program once with
    a perturbed input (the relay memoizes identical executions, so a
    verbatim re-run would measure nothing) and adds
    ``steady_execute_seconds`` / ``steady_slices_per_sec`` /
    ``program_load_seconds`` — separating the relay's one-time program-load
    lottery (measured 45-540 s) from the true device rate, inside the SAME
    committed run rather than a side probe. Costs one extra sweep execution
    (~1 s at 940 slices).
    """
    import time

    total = len(sampler) if num_samples is None else min(num_samples, len(sampler))

    t0 = time.perf_counter()
    groups: list[tuple[list[str], jax.Array, jax.Array]] = []
    if hasattr(sampler, "device_stacks"):
        groups.append(sampler.device_stacks(total))
    else:
        pairs = [sampler.next_sample() for _ in range(total)]
        by_shape: dict[tuple[int, int], list] = {}
        for p in pairs:
            by_shape.setdefault(p.fully_sampled.shape, []).append(p)
        for ps in by_shape.values():
            groups.append((
                [p.slice_id for p in ps],
                jnp.asarray(np.stack([p.fully_sampled for p in ps])),
                jnp.asarray(np.stack([p.undersampled for p in ps])),
            ))
    stage_secs = time.perf_counter() - t0

    def pad_to_bucket(n: int, fully, under):
        """Pad the group to a bucket multiple by repeating the last slice
        (ONE definition — the dispatch loop and the steady probe must run
        the identical program)."""
        k = -(-n // bucket) * bucket
        if k != n:
            idx = jnp.asarray(
                np.concatenate([np.arange(n), np.full(k - n, n - 1)]),
                jnp.int32,
            )
            fully = jnp.take(fully, idx, axis=0)
            under = jnp.take(under, idx, axis=0)
        return k, fully, under

    t1 = time.perf_counter()
    futs = []
    for ids, fully, under in groups:
        _, fully, under = pad_to_bucket(len(ids), fully, under)
        futs.append(
            (ids, reconstructor.metrics_chunk_async(params, fully, under))
        )
    dispatch_secs = time.perf_counter() - t1

    t2 = time.perf_counter()
    results: list[SliceResult] = []
    group_fetch_secs = []
    for ids, fut in futs:
        t_g = time.perf_counter()
        vals = np.asarray(fut)  # the ONE (3, K) fetch for this group
        group_fetch_secs.append(time.perf_counter() - t_g)
        for j, sid in enumerate(ids):
            results.append(
                SliceResult(
                    slice_id=sid,
                    psnr=float(vals[0, j]),
                    ssim=float(vals[1, j]),
                    nrmse=float(vals[2, j]),
                )
            )
    fetch_secs = time.perf_counter() - t2

    timings = {
        "stage_seconds": stage_secs,
        "dispatch_seconds": dispatch_secs,
        "execute_fetch_seconds": fetch_secs,
    }
    log(
        f"device sweep: {total} slices staged in {stage_secs:.2f}s, "
        f"dispatched in {dispatch_secs:.2f}s (trace+compile), "
        f"executed+fetched in {fetch_secs:.2f}s"
    )

    if steady_probe and groups:
        largest = max(range(len(groups)), key=lambda i: len(groups[i][0]))
        ids, fully, under = groups[largest]
        k, fully_p, under_p = pad_to_bucket(len(ids), fully, under)
        # perturb: the relay memoizes identical executions, so a verbatim
        # re-run of the same program+inputs would measure nothing
        fully_p = fully_p + jnp.float32(1e-7)
        t3 = time.perf_counter()
        np.asarray(
            reconstructor.metrics_chunk_async(params, fully_p, under_p)
        )
        steady = time.perf_counter() - t3
        timings["steady_execute_seconds"] = steady
        timings["steady_slices_per_sec"] = k / steady
        # attribute against the LARGEST group's own fetch, not the total
        # across shape groups — with multiple groups the total would
        # overstate the one-time load
        timings["program_load_seconds"] = max(
            0.0, group_fetch_secs[largest] - steady
        )
        log(
            f"device sweep steady probe: {k} slices in {steady:.2f}s "
            f"({k / steady:.1f} slices/s); attributed program load "
            f"{timings['program_load_seconds']:.2f}s"
        )
    return results, timings


def gather_shard_results(results: list[SliceResult]) -> list[SliceResult]:
    """All-gather per-host eval results across processes (pod-parallel
    sweep): every host contributes its file-shard's rows, every host
    returns the combined list — the primary then writes the single-run
    artifact contract. Single-process: identity.

    Strings ride along as fixed-width uint8 rows; per-host counts may
    differ, so counts are gathered first and rows padded to the max."""
    import jax

    if jax.process_count() == 1:
        return list(results)
    from jax.experimental import multihost_utils

    width = 128
    count = len(results)
    counts = np.asarray(
        multihost_utils.process_allgather(np.int64(count))
    ).reshape(-1)
    max_count = int(counts.max())

    ids = np.zeros((max_count, width), np.uint8)
    vals = np.zeros((max_count, 3), np.float64)
    for i, r in enumerate(results):
        raw = r.slice_id.encode("utf-8")[:width]
        ids[i, : len(raw)] = np.frombuffer(raw, dtype=np.uint8)
        vals[i] = (r.psnr, r.ssim, r.nrmse)

    g_ids = np.asarray(multihost_utils.process_allgather(ids, tiled=False))
    g_vals = np.asarray(multihost_utils.process_allgather(vals, tiled=False))
    merged = []
    for host in range(len(counts)):
        for i in range(int(counts[host])):
            sid = bytes(g_ids[host, i]).rstrip(b"\x00").decode("utf-8")
            merged.append(
                SliceResult(
                    slice_id=sid,
                    psnr=float(g_vals[host, i, 0]),
                    ssim=float(g_vals[host, i, 1]),
                    nrmse=float(g_vals[host, i, 2]),
                )
            )
    return merged


def read_metrics_csv(path: str | pathlib.Path) -> list[SliceResult]:
    with open(path, newline="") as f:
        return [
            SliceResult(
                slice_id=row["FILENAME"],
                psnr=float(row["PSNR"]),
                ssim=float(row["SSIM"]),
                nrmse=float(row["NRMSE"]),
            )
            for row in csv.DictReader(f)
        ]


def merge_shard_csvs(output_dir: str | pathlib.Path) -> list[SliceResult]:
    """Merge ``metrics_shard*/metrics_error.csv`` files written by separate
    ``--shard i:n`` invocations into one result list (for the combined
    single-run artifact contract)."""
    output_dir = pathlib.Path(output_dir)
    shard_csvs = sorted(output_dir.glob("metrics_shard*/metrics_error.csv"))
    if not shard_csvs:
        raise FileNotFoundError(f"no metrics_shard*/metrics_error.csv under {output_dir}")
    results: list[SliceResult] = []
    for p in shard_csvs:
        results.extend(read_metrics_csv(p))
    return results


def write_metrics_artifacts(
    results: list[SliceResult], output_dir: str | pathlib.Path
) -> dict[str, dict[str, float]]:
    """Write ``metrics_error.csv`` + ``metrics_summary.txt`` (the
    reference's artifact contract) and return the summary stats."""
    output_dir = pathlib.Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    with open(output_dir / "metrics_error.csv", "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["FILENAME", "PSNR", "SSIM", "NRMSE"])
        for r in results:
            writer.writerow([r.slice_id, r.psnr, r.ssim, r.nrmse])

    summary = {}
    arrays = {
        "PSNR": np.array([r.psnr for r in results]),
        "SSIM": np.array([r.ssim for r in results]),
        "NRMSE": np.array([r.nrmse for r in results]),
    }
    lines = []
    for name, arr in arrays.items():
        stats = {
            "mean": float(arr.mean()),
            "std": float(arr.std()),
            "min": float(arr.min()),
            "max": float(arr.max()),
        }
        summary[name] = stats
        lines.append(
            f"{name}: mean={stats['mean']:.4f} std={stats['std']:.4f} "
            f"min={stats['min']:.4f} max={stats['max']:.4f}"
        )
    (output_dir / "metrics_summary.txt").write_text("\n".join(lines) + "\n")
    return summary
