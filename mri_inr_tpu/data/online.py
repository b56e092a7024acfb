"""Online k-space training pipeline: mask -> IFFT -> normalize -> tile ON
DEVICE, per epoch, with no intermediate ``.npy`` files.

The reference can only train against offline-preprocessed slices with a
mask drawn ONCE at preprocessing time (``src/data/preprocessing.py:102-164``
writes fixed undersampled variants to disk). The TPU-native pipeline keeps
the raw k-space volumes resident as float32 real/imag pairs and runs the
whole fastMRI chain (per-volume random column mask -> centered 2-D IFFT ->
magnitude -> volume min-max normalize -> overlapping-patch tiling) as one
jitted program per epoch:

- **offline parity**: with ``remask_each_epoch=False`` the mask keys are the
  same stable per-(volume, cf, acc) derivation ``process_files`` uses, so
  the produced tiles equal the offline ``.npy`` pipeline bit-for-bit
  (tested: ``tests/test_online.py``);
- **mask re-randomization** (``remask_each_epoch=True``, the point of the
  mode): every epoch re-undersamples with fresh per-volume masks — a
  physics-consistent data augmentation the reference cannot express, at the
  cost of one IFFT+tile program execution per epoch (measured ~ms-scale on
  chip vs the ~2 s training epoch).

Host I/O happens once at construction (``h5py`` reads); everything after
lives in HBM. Fully-sampled tiles have no mask dependency and are
materialized once.
"""

from __future__ import annotations

import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from mri_inr_tpu.data import kspace
from mri_inr_tpu.data.dataset import SlicePair
from mri_inr_tpu.data.preprocessing import (
    _stable_seed,
    get_mri_type,
    load_h5,
)
from mri_inr_tpu.ops import tiling


class OnlineKspaceDataset:
    """Device-resident k-space -> (fully, under) tile pairs, one jitted
    materialization per epoch. Drop-in for :class:`MRIDataset` in the
    scan-epoch trainer (``len``, ``materialize``, ``batches``,
    ``get_slice``)."""

    def __init__(
        self,
        data_root: str | pathlib.Path,
        center_fraction: float = 0.05,
        acceleration: int = 6,
        mri_type: str | None = "Flair",
        max_slice_num: int | None = 10,
        num_samples: int | None = None,
        seed: int = 31415,
        outer_patch_size: int = 32,
        inner_patch_size: int = 16,
        remask_each_epoch: bool = True,
    ):
        self.cf = float(center_fraction)
        self.acc = int(acceleration)
        self.outer = outer_patch_size
        self.inner = inner_patch_size
        self.remask = remask_each_epoch

        data_root = pathlib.Path(data_root)
        paths = sorted(data_root.glob("*.h5"))
        if mri_type:
            paths = [p for p in paths if get_mri_type(p.stem) == mri_type]
        if not paths:
            raise FileNotFoundError(
                f"No matching .h5 volumes under {data_root}"
            )

        # The FULL volume stays resident: offline parity requires the
        # min-max normalization window to cover every slice of the volume
        # (``process_files`` normalizes first, ``_select_rows`` filters
        # after) — truncating to max_slice_num before normalization would
        # silently shift every tile value whenever a volume has more
        # slices than the filter keeps. Slice filtering happens below via
        # ``slice_ids``/``flat_idx`` only. HBM footprint is therefore
        # proportional to FULL volumes; for corpora that don't fit,
        # preprocess offline instead.
        # staging is the online mode's one-time host cost (~3 GB of
        # k-space at 940-slice scale): parallelize the .h5 reads (thread
        # pool; h5py releases the GIL during IO), assemble into one
        # preallocated host buffer, and upload ONCE — per-volume device
        # stacking would transiently double the device footprint (every
        # volume + the stacked copy live simultaneously; r5 review)
        from concurrent.futures import ThreadPoolExecutor

        self.stems = [p.stem for p in paths]
        with ThreadPoolExecutor(max_workers=8) as ex:
            vols = list(ex.map(lambda p: kspace.to_ri(load_h5(p)), paths))
        shapes = {v.shape for v in vols}
        if len(shapes) != 1:
            raise ValueError(
                "online pipeline needs uniform volume shapes (one jitted "
                f"program); got {sorted(shapes)} — bucket or preprocess "
                "offline instead"
            )
        stack = np.empty((len(vols), *vols[0].shape), np.float32)
        for i, v in enumerate(vols):
            stack[i] = v
            vols[i] = None  # release each host copy as it is packed
        self._k = jnp.asarray(stack)  # (V, S, H, W, 2), one upload
        del stack
        nvol, nsl, h, w, _ = self._k.shape

        # slice subset with MRIDataset._select_rows' semantics: slice_num
        # filter first, then the seeded-choice subsample
        slice_ids = [
            (vi, si)
            for vi in range(nvol)
            for si in range(nsl)
            if max_slice_num is None or si <= max_slice_num
        ]
        if num_samples is not None and num_samples < len(slice_ids):
            rng = np.random.default_rng(seed)
            idx = rng.choice(len(slice_ids), size=num_samples, replace=False)
            slice_ids = [slice_ids[i] for i in sorted(idx)]
        self.slice_ids = slice_ids
        self._flat_idx = jnp.asarray(
            [vi * nsl + si for vi, si in slice_ids], jnp.int32
        )
        self.grid = tiling.grid_shape(h, w, inner_patch_size)
        self.patches_per_slice = self.grid[0] * self.grid[1]

        # stable per-volume mask keys: epoch 0 (or remask off) reproduces
        # the offline pipeline's masks exactly
        self._mask_seeds = jnp.asarray(
            [_stable_seed(s, self.cf, self.acc) for s in self.stems],
            jnp.uint32,
        )

        self._tile_fn = self._build()
        self._fully = None  # (N*, P, outer, outer), materialized once
        self._under_cache: tuple[int, jax.Array] | None = None

    # ------------------------------------------------------------------
    def _build(self):
        cf, acc = self.cf, self.acc
        outer, inner = self.outer, self.inner
        flat_idx = self._flat_idx
        mask_seeds = self._mask_seeds

        recon = kspace.reconstruct_magnitude_ri

        def images(k, epoch, masked):
            nvol, nsl, h, w, _ = k.shape
            if masked:
                def vol_mask(seed):
                    key = jax.random.key(seed)
                    if self.remask:
                        key = jax.random.fold_in(key, epoch)
                    return kspace.random_mask(key, w, cf, acc)

                masks = jax.vmap(vol_mask)(mask_seeds)  # (V, W)
                k = k * masks[:, None, None, :, None].astype(k.dtype)
            imgs = recon(k)  # (V, S, H, W)
            lo = jnp.min(imgs, axis=(1, 2, 3), keepdims=True)
            hi = jnp.max(imgs, axis=(1, 2, 3), keepdims=True)
            # all-constant (zero-padded/corrupt) volumes have hi == lo;
            # map them to zeros instead of NaN-poisoning every tile (the
            # online path ingests raw .h5 with no preprocessing step where
            # this would otherwise surface)
            imgs = jnp.where(hi > lo, (imgs - lo) / (hi - lo), 0.0)
            imgs = imgs.reshape(nvol * nsl, h, w)
            return jnp.take(imgs, flat_idx, axis=0)

        def tile_all(k, epoch, masked):
            imgs = images(k, epoch, masked)
            patches = jax.vmap(
                lambda im: tiling.image_to_patches(im, outer, inner)
            )(imgs)  # (N, P, outer, outer)
            return patches.reshape(-1, outer, outer), imgs

        # separate images-only program: the eval sweep needs the (N, H, W)
        # stacks but not the ~4x larger training tile stacks — materializing
        # tiles for a pure eval run would waste HBM (1.7 GB/stack at
        # 940x320x320) and compute
        self._imgs_fn = jax.jit(images, static_argnums=(2,))
        return jax.jit(tile_all, static_argnums=(2,))

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.slice_ids) * self.patches_per_slice

    def materialize(self, epoch: int):
        """(fully_tiles, under_tiles) device arrays for this epoch's masks
        (fresh per epoch when ``remask_each_epoch``; fixed otherwise)."""
        if self._fully is None:
            self._fully, self._fully_imgs = self._tile_fn(
                self._k, jnp.int32(0), False
            )
        e = int(epoch) if self.remask else 0
        if self._under_cache is None or self._under_cache[0] != e:
            # the epoch-e under IMAGES are deliberately discarded: eval
            # consumers (snapshots, samplers, device_image_stacks) promise
            # epoch-0 masks and read the dedicated *_imgs0 stash below —
            # caching the current epoch's here once served them stale masks
            # during remask training (r5 review finding)
            under, _ = self._tile_fn(self._k, jnp.int32(e), True)
            self._under_cache = (e, under)
        return self._fully, self._under_cache[1]

    def batches(
        self, batch_size: int, seed: int, shuffle: bool = True, prefetch: int = 0
    ):
        """Host-loop compatibility: materialize (mask epoch = ``seed``, the
        trainer passes the epoch there) then yield wrapped static-shape
        batches with :class:`MRIDataset` epoch semantics
        (:func:`epoch_index_batches`)."""
        from mri_inr_tpu.data.dataset import epoch_index_batches, prefetch_iter

        fully, under = self.materialize(seed)
        fully = np.asarray(fully)
        under = np.asarray(under)

        def generate():
            for idx in epoch_index_batches(
                fully.shape[0], batch_size, seed, shuffle
            ):
                yield fully[idx], under[idx]

        if prefetch > 0:
            return prefetch_iter(generate(), depth=prefetch)
        return generate()

    def device_image_stacks(self) -> tuple[jax.Array, jax.Array]:
        """The HBM-resident (N, H, W) fully/under image stacks (epoch-0
        masks) — the device-resident eval sweep's input. NO host transfer
        happens here or downstream: the sweep feeds these straight into the
        scanned tile->forward->fold->metrics program and fetches one (3, N)
        metric array (round-4 weakness: ``prefetch_host_images`` pulled the
        whole stack to numpy and the chunked sweep re-uploaded it, leaving
        the pipeline relay-transfer-bound at ~1/25th of its compute rate)."""
        self.materialize_images()
        return self._fully_imgs0, self._under_imgs0

    def materialize_images(self) -> None:
        """Fill the epoch-0 (fully, under) IMAGE stacks without computing
        the training tile stacks (eval-only consumers). Kept separate from
        ``materialize``'s per-epoch state so remask training can never
        leak epoch-e masks into the epoch-0 eval contract."""
        if getattr(self, "_fully_imgs0", None) is None:
            if getattr(self, "_fully_imgs", None) is not None:
                self._fully_imgs0 = self._fully_imgs  # mask-independent
            else:
                self._fully_imgs0 = self._imgs_fn(self._k, jnp.int32(0), False)
        if getattr(self, "_under_imgs0", None) is None:
            self._under_imgs0 = self._imgs_fn(self._k, jnp.int32(0), True)

    def prefetch_host_images(self) -> None:
        """Fetch the WHOLE epoch-0 image stack to the host in one transfer
        and cache it. Call before serving many slices (the eval sweep's
        :class:`OnlineSampler` does when it will serve >= 64): per-slice
        fetches pay one relay round trip each (2x940 over the no-disk 940
        sweep — measured 238.7 s vs 108.5 s with the bulk fetch), while a
        bulk fetch of a small corpus would waste host RAM (the stack is
        ~0.8 MB/slice at 320x320)."""
        if getattr(self, "_imgs_np", None) is None:
            self.materialize_images()
            self._imgs_np = (
                np.asarray(self._fully_imgs0),
                np.asarray(self._under_imgs0),
            )

    def get_slice(self, index: int) -> SlicePair:
        """Full (fully, under) images for snapshot rendering / the online
        eval sampler (epoch-0 masks). Returns fresh arrays (same contract
        as ``MRISampler.next_sample``'s per-call ``np.load``) — callers may
        mutate them without corrupting the cache."""
        i = index % len(self.slice_ids)
        vi, si = self.slice_ids[i]
        if getattr(self, "_imgs_np", None) is not None:
            fully, under = self._imgs_np[0][i], self._imgs_np[1][i]
        else:
            self.materialize_images()
            cache = getattr(self, "_slice_np_cache", None)
            if cache is None:
                cache = self._slice_np_cache = {}
            if i not in cache:
                cache[i] = (
                    np.asarray(self._fully_imgs0[i]),
                    np.asarray(self._under_imgs0[i]),
                )
            fully, under = cache[i]
        return SlicePair(
            slice_id=f"{self.stems[vi]}_{si}",
            fully_sampled=fully.copy(),
            undersampled=under.copy(),
        )

    def write_manifest(self, path: str | pathlib.Path) -> None:
        lines = [
            f"{self.stems[vi]}_{si} (online k-space)"
            for vi, si in self.slice_ids
        ]
        pathlib.Path(path).write_text("\n".join(lines) + "\n")


class OnlineSampler:
    """Evaluation sampler over an :class:`OnlineKspaceDataset` — the
    no-disk analog of :class:`mri_inr_tpu.data.dataset.MRISampler`: raw
    ``.h5`` k-space -> device mask+IFFT -> full (fully, under) slices,
    shuffled once with the reference's seed-42 semantics and served
    sequentially, with the same ``shard(i, n)`` contract for pod-parallel
    sweeps. Masks are the stable epoch-0 keys (``remask_each_epoch=False``
    in the dataset), so metrics equal the offline pipeline's (tested)."""

    def __init__(self, dataset: OnlineKspaceDataset, seed: int = 42,
                 num_samples: int | None = None,
                 host_prefetch: bool | None = None):
        """``host_prefetch``: None (auto) bulk-fetches the image stack to
        the host when the sampler will serve >= 64 slices — right for the
        per-slice/chunked HOST sweep paths. Pass False when the consumer is
        the device-resident sweep (``evaluate_files_device``), which never
        needs host copies: the bulk D2H would be pure waste."""
        from mri_inr_tpu.data.dataset import sampler_order

        self.dataset = dataset
        self._order = sampler_order(len(dataset.slice_ids), seed, num_samples)
        self._counter = 0
        if host_prefetch is None:
            host_prefetch = len(self._order) >= 64
        if host_prefetch:
            # sweep-scale host consumer: one bulk D2H transfer instead of
            # per-slice relay round trips (see prefetch_host_images)
            dataset.prefetch_host_images()

    def device_stacks(
        self, num_samples: int | None = None
    ) -> tuple[list[str], jax.Array, jax.Array]:
        """(slice_ids, fully, under) with the stacks as DEVICE arrays in
        this sampler's serving order — consumed by
        ``evaluate_files_device`` (zero host round trips).

        Consumes the sampler exactly like ``num_samples`` calls of
        ``next_sample`` (starts at the current ``_counter``, wraps modulo
        the order length, advances the counter) so a visual pass that
        partially consumed the sampler leaves the device sweep scoring the
        SAME slice subset as the host sweep paths would (r5 review)."""
        ds = self.dataset
        fully, under = ds.device_image_stacks()
        total = len(self._order) if num_samples is None else min(
            num_samples, len(self._order)
        )
        order = [
            self._order[(self._counter + i) % len(self._order)]
            for i in range(total)
        ]
        self._counter += total
        ids = [
            f"{ds.stems[ds.slice_ids[i][0]]}_{ds.slice_ids[i][1]}"
            for i in order
        ]
        idx = jnp.asarray(order, jnp.int32)
        return ids, jnp.take(fully, idx, axis=0), jnp.take(under, idx, axis=0)

    def __len__(self) -> int:
        return len(self._order)

    def next_sample(self) -> SlicePair:
        idx = self._order[self._counter % len(self._order)]
        self._counter += 1
        return self.dataset.get_slice(idx)

    def shard(self, index: int, count: int) -> "OnlineSampler":
        import copy

        out = copy.copy(self)
        out._order = self._order[index::count]
        out._counter = 0
        return out
