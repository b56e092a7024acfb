"""Native (C++/OpenMP) host-side data-pipeline kernels with numpy fallback.

Builds ``tileops.cpp`` into a shared library on first use (g++, cached next
to the source; rebuilt when the source is newer) and binds it via ctypes —
the image has no pybind11. Every entry point has a numpy fallback so the
package works without a toolchain; ``HAVE_NATIVE`` reports which path is
active and tests assert exact equality between the two.

API:
- ``tile_image(image, outer, inner)`` -> (nv*nh, outer, outer), (nv, nh)
- ``gather_pairs(fully, under, idx)`` -> (batch_fully, batch_under)
- ``patch_means(patches)`` -> (n,) means (black-patch classification)
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_SRC = pathlib.Path(__file__).parent / "tileops.cpp"
_LIB_PATH = pathlib.Path(__file__).parent / "_tileops.so"

_lib = None


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-fopenmp",
        "-o", str(_LIB_PATH), str(_SRC),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("MRI_INR_TPU_NO_NATIVE"):
        return None
    try:
        stale = (
            not _LIB_PATH.exists()
            or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime
        )
        if stale and not _build():
            return None
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i64 = ctypes.c_int64
    lib.tile_f32.argtypes = [f32p, i64, i64, i64, i64, f32p]
    lib.gather_pairs_f32.argtypes = [f32p, f32p, i64p, i64, i64, f32p, f32p]
    lib.patch_means_f32.argtypes = [f32p, i64, i64, f32p]
    lib.omp_max_threads.restype = ctypes.c_int
    _lib = lib
    return lib


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def have_native() -> bool:
    return _load() is not None


# backwards-compatible module constant (resolved lazily on first call instead
# would complicate imports; computing it here triggers the one-time build)
HAVE_NATIVE = have_native()


# ---------------------------------------------------------------------------
# numpy fallbacks
# ---------------------------------------------------------------------------


def _tile_np(image: np.ndarray, outer: int, inner: int):
    height, width = image.shape
    pad = (outer - inner) // 2
    vpad = (inner - height % inner) % inner
    hpad = (inner - width % inner) % inner
    padded = np.pad(image, ((pad, pad + vpad), (pad, pad + hpad)), mode="reflect")
    windows = np.lib.stride_tricks.sliding_window_view(padded, (outer, outer))[
        ::inner, ::inner
    ]
    nv, nh = windows.shape[:2]
    return windows.reshape(nv * nh, outer, outer).copy(), (nv, nh)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def tile_image(image: np.ndarray, outer: int, inner: int):
    """Reflect-pad + overlapping-window extraction of one (H, W) image.
    Returns ((nv*nh, outer, outer) float32, (nv, nh))."""
    lib = _load()
    image = np.ascontiguousarray(image, np.float32)
    if lib is None:
        return _tile_np(image, outer, inner)
    height, width = image.shape
    nv = -(-height // inner)
    nh = -(-width // inner)
    out = np.empty((nv * nh, outer, outer), np.float32)
    lib.tile_f32(_f32p(image), height, width, outer, inner, _f32p(out))
    return out, (nv, nh)


def gather_pairs(fully: np.ndarray, under: np.ndarray, idx: np.ndarray):
    """Gather rows ``idx`` from two parallel (N, P, P) pools into fresh
    contiguous batch arrays."""
    lib = _load()
    if lib is None:
        return fully[idx], under[idx]
    idx = np.ascontiguousarray(idx, np.int64)
    n = idx.shape[0]
    patch_elems = int(np.prod(fully.shape[1:]))
    out_f = np.empty((n,) + fully.shape[1:], np.float32)
    out_u = np.empty((n,) + under.shape[1:], np.float32)
    lib.gather_pairs_f32(
        _f32p(fully), _f32p(under), _i64p(idx), n, patch_elems,
        _f32p(out_f), _f32p(out_u),
    )
    return out_f, out_u


def patch_means(patches: np.ndarray) -> np.ndarray:
    """Per-patch mean over a (N, P, P) float32 pool."""
    lib = _load()
    if lib is None:
        return patches.mean(axis=(-2, -1), dtype=np.float64).astype(np.float32)
    patches = np.ascontiguousarray(patches, np.float32)
    n = patches.shape[0]
    patch_elems = int(np.prod(patches.shape[1:]))
    out = np.empty((n,), np.float32)
    lib.patch_means_f32(_f32p(patches), n, patch_elems, _f32p(out))
    return out
