"""Host-side datasets over preprocessed slices.

Capability parity with the reference (``src/data/mri_dataset.py`` and
``src/data/mri_sampler.py``, studied not copied):

- ``MRIDataset``: reads ``metadata.csv``, filters by MRI type and
  ``slice_num <= max_slice_num`` (reference filters ``<= 10`` and "Flair",
  ``mri_dataset.py:80-82``), optional file subsetting with a fixed seed
  (31415, ``mri_dataset.py:87-90``), eagerly tiles every slice into
  overlapping outer patches and serves (fully-sampled, undersampled) patch
  pairs; also exposes whole slices for snapshot rendering.
- ``MRISampler``: evaluation sampler that shuffles the file list once with
  seed 42 and serves full slices sequentially (``mri_sampler.py:15-90``).

Design deltas (deliberate, documented in SURVEY appendix):
- the reference's black-patch filter is a silent no-op for training data
  (``mri_dataset.py:144-148``); here filtering is a real opt-in
  (``filter_black=True``) computed once at load;
- batches are drawn with a numpy PRNG per epoch and padded/dropped to a
  static shape so the jitted train step never recompiles.
"""

from __future__ import annotations

import csv
import pathlib
import queue
import threading
from dataclasses import dataclass

import numpy as np

from mri_inr_tpu import native
from mri_inr_tpu.data.preprocessing import undersample_column

BLACK_PATCH_THRESHOLD = 1e-10


def tile_image_np(
    image: np.ndarray, outer_patch_size: int, inner_patch_size: int
) -> tuple[np.ndarray, tuple[int, int]]:
    """Host-side twin of :func:`mri_inr_tpu.ops.tiling.image_to_patches`
    (native C++/OpenMP when available, numpy otherwise — exact-equal paths,
    see tests/test_native.py). Returns (patches (nv*nh, P, P), (nv, nh))."""
    return native.tile_image(image, outer_patch_size, inner_patch_size)


def prefetch_iter(iterable, depth: int = 2):
    """Run an iterator in a background thread with a bounded queue — batch
    assembly (gather + host->device copy setup) overlaps device compute,
    the TPU-side equivalent of the reference's DataLoader worker processes
    (``training.py:82-94``)."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()

    def producer():
        try:
            for item in iterable:
                q.put(item)
            q.put(sentinel)
        except BaseException as exc:  # propagate into the consumer
            q.put(exc)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def epoch_index_batches(
    n: int, batch_size: int, seed: int, shuffle: bool = True
) -> list[np.ndarray]:
    """The ONE definition of epoch batch composition, shared by
    ``MRIDataset.batches``, ``OnlineKspaceDataset.batches`` and the scan
    epoch's ``make_epoch_perm``: shuffled order, ceil(n/batch) batches,
    trailing partial batch wrapped with indices from the epoch start so
    nothing is dropped and every batch is static-shape. NOTE this is a
    deliberate (small) deviation from the reference's DataLoader
    drop_last=False (``training.py:82-94``), which emits a SMALLER final
    batch: here the wrapped duplicate rows get double gradient weight
    within their epoch (at the default 400-row batches that is <1 extra
    pass over <1% of tiles per epoch; see PARITY.md). Returns int batches
    of exactly ``batch_size`` rows. ``n == 0`` yields no batches."""
    if n <= 0:
        return []
    order = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    num_batches = max(1, -(-n // batch_size))
    batches = []
    for b in range(num_batches):
        idx = order[b * batch_size : (b + 1) * batch_size]
        if len(idx) < batch_size:
            idx = np.concatenate([idx, np.resize(order, batch_size - len(idx))])
        batches.append(idx)
    return batches


def sampler_order(n: int, seed: int, num_samples: int | None) -> list[int]:
    """The ONE definition of the eval sampler's serving order (reference
    semantics: shuffle once with seed 42, then truncate) — shared by
    :class:`MRISampler` and the online :class:`~mri_inr_tpu.data.online.
    OnlineSampler` so their slice orders (and therefore the offline/online
    metric equivalence, tested) stay in lock-step."""
    order = np.random.default_rng(seed).permutation(n)
    if num_samples is not None:
        order = order[:num_samples]
    return [int(i) for i in order]


def read_metadata(metadata_path: str | pathlib.Path) -> list[dict]:
    with open(metadata_path, newline="") as f:
        return list(csv.DictReader(f))


def _select_rows(
    rows: list[dict],
    mri_type: str | None,
    max_slice_num: int | None,
    num_samples: int | None,
    seed: int,
) -> list[dict]:
    if mri_type:
        rows = [r for r in rows if r["mri_type"] == mri_type]
    if max_slice_num is not None:
        rows = [r for r in rows if int(r["slice_num"]) <= max_slice_num]
    if num_samples is not None and num_samples < len(rows):
        rng = np.random.default_rng(seed)
        idx = rng.choice(len(rows), size=num_samples, replace=False)
        rows = [rows[i] for i in sorted(idx)]
    return rows


@dataclass
class SlicePair:
    slice_id: str
    fully_sampled: np.ndarray
    undersampled: np.ndarray


class MRIDataset:
    """Eagerly-tiled training dataset of (fully-sampled, undersampled)
    outer-patch pairs."""

    def __init__(
        self,
        metadata_path: str | pathlib.Path,
        center_fraction: float = 0.05,
        acceleration: int = 6,
        mri_type: str | None = "Flair",
        max_slice_num: int | None = 10,
        num_samples: int | None = None,
        seed: int = 31415,
        outer_patch_size: int = 32,
        inner_patch_size: int = 16,
        filter_black: bool = False,
    ):
        self.outer_patch_size = outer_patch_size
        self.inner_patch_size = inner_patch_size
        self.undersampled_col = undersample_column(center_fraction, acceleration)

        rows = _select_rows(
            read_metadata(metadata_path), mri_type, max_slice_num, num_samples, seed
        )
        if not rows:
            raise ValueError(f"No slices selected from {metadata_path}")
        self.rows = rows

        fully, under = [], []
        for row in rows:
            full_img = np.load(row["path_fullysampled"]).astype(np.float32)
            under_img = np.load(row[self.undersampled_col]).astype(np.float32)
            f_tiles, _ = tile_image_np(full_img, outer_patch_size, inner_patch_size)
            u_tiles, _ = tile_image_np(under_img, outer_patch_size, inner_patch_size)
            fully.append(f_tiles)
            under.append(u_tiles)
        self.fully_tiles = np.concatenate(fully)
        self.under_tiles = np.concatenate(under)

        if filter_black:
            keep = native.patch_means(self.fully_tiles) >= BLACK_PATCH_THRESHOLD
            self.fully_tiles = self.fully_tiles[keep]
            self.under_tiles = self.under_tiles[keep]

    def __len__(self) -> int:
        return self.fully_tiles.shape[0]

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        return self.fully_tiles[idx], self.under_tiles[idx]

    def batches(
        self, batch_size: int, seed: int, shuffle: bool = True, prefetch: int = 0
    ):
        """Yield static-shape (fully, under) batches; the trailing remainder
        is wrapped around (so every batch has exactly ``batch_size`` rows and
        the jitted step never recompiles). ``prefetch > 0`` assembles batches
        in a background thread (native gather) ``prefetch`` deep."""

        def generate():
            for idx in epoch_index_batches(len(self), batch_size, seed, shuffle):
                yield native.gather_pairs(self.fully_tiles, self.under_tiles, idx)

        if prefetch > 0:
            return prefetch_iter(generate(), depth=prefetch)
        return generate()

    def get_slice(self, index: int) -> SlicePair:
        row = self.rows[index % len(self.rows)]
        return SlicePair(
            slice_id=row["slice_id"],
            fully_sampled=np.load(row["path_fullysampled"]).astype(np.float32),
            undersampled=np.load(row[self.undersampled_col]).astype(np.float32),
        )

    def get_random_slice(self, rng: np.random.Generator | None = None) -> SlicePair:
        rng = rng or np.random.default_rng()
        return self.get_slice(int(rng.integers(len(self.rows))))

    def write_manifest(self, path: str | pathlib.Path) -> None:
        """Write the data manifest of files actually used (the reference's
        ``processed_files.txt``, ``mri_dataset.py:102-113``)."""
        lines = [r["path_fullysampled"] for r in self.rows]
        pathlib.Path(path).write_text("\n".join(lines) + "\n")


class MRIDatasetLowMemory:
    """Low-memory variant: holds only row metadata + per-slice patch counts;
    slices are loaded, tiled and gathered per batch on demand (with a small
    LRU over tiled slices). Capability parity with the reference's
    ``MRIDatasetLowMemory`` (``mri_dataset.py:197-343``) minus its bugs: it
    serves (fully, undersampled) *pairs* with the same interface as
    :class:`MRIDataset` (the reference's returns a bare undersampled tensor
    that crashes its own Trainer, SURVEY appendix)."""

    def __init__(
        self,
        metadata_path: str | pathlib.Path,
        center_fraction: float = 0.05,
        acceleration: int = 6,
        mri_type: str | None = "Flair",
        max_slice_num: int | None = 10,
        num_samples: int | None = None,
        seed: int = 31415,
        outer_patch_size: int = 32,
        inner_patch_size: int = 16,
        cache_slices: int = 16,
        filter_black: bool = False,
    ):
        self.outer_patch_size = outer_patch_size
        self.inner_patch_size = inner_patch_size
        self.undersampled_col = undersample_column(center_fraction, acceleration)
        rows = _select_rows(
            read_metadata(metadata_path), mri_type, max_slice_num, num_samples, seed
        )
        if not rows:
            raise ValueError(f"No slices selected from {metadata_path}")
        self.rows = rows
        self.cache_slices = cache_slices
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

        # per-slice kept-patch index maps. Without filtering these are None
        # and counts come from metadata width/height (no file reads). With
        # ``filter_black`` each fully-sampled slice is scanned ONCE at init
        # for its non-black patch indices (the reference's low-memory
        # dataset stores exactly this, ``mri_dataset.py:197-343``) — memory
        # stays O(indices), not O(tiles).
        self.filter_black = filter_black
        self._keep: list[np.ndarray | None] = [None] * len(rows)
        counts = []
        for i, row in enumerate(rows):
            if filter_black:
                img = np.load(row["path_fullysampled"]).astype(np.float32)
                tiles, _ = tile_image_np(img, outer_patch_size, inner_patch_size)
                keep = np.flatnonzero(
                    native.patch_means(tiles) >= BLACK_PATCH_THRESHOLD
                )
                self._keep[i] = keep
                counts.append(len(keep))
            else:
                nv = -(-int(row["height"]) // inner_patch_size)
                nh = -(-int(row["width"]) // inner_patch_size)
                counts.append(nv * nh)
        self._counts = np.asarray(counts)
        self._offsets = np.concatenate([[0], np.cumsum(self._counts)])

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def _tiles_for(self, slice_idx: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self._cache.pop(slice_idx, None)
        if hit is None:
            row = self.rows[slice_idx]
            f, _ = tile_image_np(
                np.load(row["path_fullysampled"]).astype(np.float32),
                self.outer_patch_size, self.inner_patch_size,
            )
            u, _ = tile_image_np(
                np.load(row[self.undersampled_col]).astype(np.float32),
                self.outer_patch_size, self.inner_patch_size,
            )
            hit = (f, u)
        self._cache[slice_idx] = hit  # (re)insert as most-recent
        while len(self._cache) > self.cache_slices:
            self._cache.pop(next(iter(self._cache)))
        return hit

    def _kept_tiles_for(self, slice_idx: int) -> tuple[np.ndarray, np.ndarray]:
        f, u = self._tiles_for(slice_idx)
        keep = self._keep[slice_idx]
        if keep is not None:
            f, u = f[keep], u[keep]
        return f, u

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        slice_idx = int(np.searchsorted(self._offsets, idx, "right") - 1)
        local = idx - int(self._offsets[slice_idx])
        f, u = self._kept_tiles_for(slice_idx)
        return f[local], u[local]

    def batches(
        self, batch_size: int, seed: int, shuffle: bool = True, prefetch: int = 0
    ):
        """Static-shape batches like :class:`MRIDataset.batches`. Shuffling
        is slice-major (slices shuffled, patches within a slice contiguous)
        so each batch touches ~batch/patches_per_slice files, keeping the
        LRU effective.  The trailing partial batch is wrapped with patches
        from the epoch start (same epoch semantics as
        :class:`MRIDataset.batches`: ceil(n/batch) batches, nothing
        dropped — with ``shuffle=False`` the two classes yield identical
        epochs, tested)."""

        def generate():
            if len(self) == 0:
                return
            order = np.arange(len(self.rows))
            if shuffle:
                np.random.default_rng(seed).shuffle(order)
            num_batches = max(1, -(-len(self) // batch_size))
            emitted = 0
            buf_f, buf_u = [], []
            have = 0
            while emitted < num_batches:
                for slice_idx in order:
                    if have >= batch_size or emitted >= num_batches:
                        break
                    f, u = self._kept_tiles_for(int(slice_idx))
                    buf_f.append(f)
                    buf_u.append(u)
                    have += f.shape[0]
                    while have >= batch_size and emitted < num_batches:
                        cat_f = np.concatenate(buf_f)
                        cat_u = np.concatenate(buf_u)
                        yield cat_f[:batch_size], cat_u[:batch_size]
                        emitted += 1
                        buf_f, buf_u = [cat_f[batch_size:]], [cat_u[batch_size:]]
                        have = buf_f[0].shape[0]
                # loop back over ``order`` only for the wrapped remainder
                if emitted >= num_batches:
                    break

        if prefetch > 0:
            return prefetch_iter(generate(), depth=prefetch)
        return generate()

    def get_slice(self, index: int) -> SlicePair:
        row = self.rows[index % len(self.rows)]
        return SlicePair(
            slice_id=row["slice_id"],
            fully_sampled=np.load(row["path_fullysampled"]).astype(np.float32),
            undersampled=np.load(row[self.undersampled_col]).astype(np.float32),
        )

    write_manifest = MRIDataset.write_manifest


class MRISampler:
    """Evaluation sampler: shuffles the slice list once (seed 42, like the
    reference) then serves full slices sequentially.

    ``test_files``: optional explicit file selection for the visual pass —
    keeps only slices whose ``stem`` or ``slice_id`` is listed (the
    reference's ``config.data.test_files`` -> ``MRISampler`` path,
    ``test_mod_siren.py:124-128`` / ``mri_sampler.py:15-45``)."""

    def __init__(
        self,
        metadata_path: str | pathlib.Path,
        center_fraction: float = 0.05,
        acceleration: int = 6,
        mri_type: str | None = "Flair",
        max_slice_num: int | None = 10,
        num_samples: int | None = None,
        seed: int = 42,
        test_files: list[str] | None = None,
    ):
        self.undersampled_col = undersample_column(center_fraction, acceleration)
        rows = _select_rows(
            read_metadata(metadata_path), mri_type, max_slice_num, None, seed
        )
        if test_files:
            wanted = set(test_files)
            rows = [
                r
                for r in rows
                if r.get("stem") in wanted or r.get("slice_id") in wanted
            ]
        if not rows:
            raise ValueError(f"No slices selected from {metadata_path}")
        self.rows = [rows[i] for i in sampler_order(len(rows), seed, num_samples)]
        self._counter = 0

    def __len__(self) -> int:
        return len(self.rows)

    def next_sample(self) -> SlicePair:
        row = self.rows[self._counter % len(self.rows)]
        self._counter += 1
        return SlicePair(
            slice_id=row["slice_id"],
            fully_sampled=np.load(row["path_fullysampled"]).astype(np.float32),
            undersampled=np.load(row[self.undersampled_col]).astype(np.float32),
        )

    def shard(self, index: int, count: int) -> "MRISampler":
        """Deterministic file shard for pod-parallel evaluation: host
        ``index`` of ``count`` evaluates every count-th slice."""
        import copy

        other = copy.copy(self)
        other.rows = self.rows[index::count]
        other._counter = 0
        return other
