"""Synthetic fastMRI-like data for tests and benchmarks.

Generates ellipse-phantom "brain" volumes, transforms them to k-space with
the centered orthonormal FFT, and can write ``.h5`` files with the same
layout the reference consumes (a ``kspace`` dataset of shape (S, H, W),
reference ``src/data/preprocessing.py:18-30``) so the full preprocessing ->
dataset -> train -> eval chain is exercisable without the real fastMRI
download.
"""

from __future__ import annotations

import pathlib

import numpy as np


def phantom_slice(
    rng: np.random.Generator, height: int, width: int, num_ellipses: int = 8
) -> np.ndarray:
    """One smooth synthetic magnitude slice in [0, 1] with elliptical
    structures (crude brain stand-in; enough texture for SIREN fitting)."""
    yy, xx = np.mgrid[0:height, 0:width]
    yy = (yy - height / 2) / (height / 2)
    xx = (xx - width / 2) / (width / 2)
    img = np.zeros((height, width), np.float32)
    # skull-like outer ellipse
    outer = ((yy / 0.9) ** 2 + (xx / 0.7) ** 2) < 1.0
    img += 0.35 * outer
    for _ in range(num_ellipses):
        cy, cx = rng.uniform(-0.5, 0.5, 2)
        ry, rx = rng.uniform(0.08, 0.4, 2)
        theta = rng.uniform(0, np.pi)
        amp = rng.uniform(-0.4, 0.6)
        yr = (yy - cy) * np.cos(theta) + (xx - cx) * np.sin(theta)
        xr = -(yy - cy) * np.sin(theta) + (xx - cx) * np.cos(theta)
        img += amp * (((yr / ry) ** 2 + (xr / rx) ** 2) < 1.0)
    img *= outer
    img -= img.min()
    if img.max() > 0:
        img /= img.max()
    return img.astype(np.float32)


def phantom_volume(
    seed: int, num_slices: int = 12, height: int = 320, width: int = 320
) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return np.stack(
        [phantom_slice(rng, height, width) for _ in range(num_slices)]
    )


def volume_to_kspace(volume: np.ndarray) -> np.ndarray:
    """Image-space magnitude volume -> centered k-space (numpy, host-side;
    matches ``fft2c`` semantics)."""
    shifted = np.fft.ifftshift(volume, axes=(-2, -1))
    k = np.fft.fft2(shifted, axes=(-2, -1), norm="ortho")
    return np.fft.fftshift(k, axes=(-2, -1)).astype(np.complex64)


def write_synthetic_h5(
    directory: str | pathlib.Path,
    num_files: int = 3,
    num_slices: int = 12,
    height: int = 320,
    width: int = 320,
    seed: int = 0,
) -> list[pathlib.Path]:
    """Write fastMRI-layout ``.h5`` files (``kspace`` dataset, FLAIR brain
    filenames so the reference's filename-metadata parser logic applies)."""
    import h5py

    directory = pathlib.Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    paths = []
    for i in range(num_files):
        vol = phantom_volume(seed + i, num_slices, height, width)
        k = volume_to_kspace(vol)
        path = directory / f"file_brain_AXFLAIR_{seed + i:06d}.h5"
        with h5py.File(path, "w") as f:
            f.create_dataset("kspace", data=k)
        paths.append(path)
    return paths
