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
    rng: np.random.Generator,
    height: int,
    width: int,
    num_ellipses: int = 8,
    texture: float = 0.0,
) -> np.ndarray:
    """One synthetic magnitude slice in [0, 1] with elliptical structures
    (crude brain stand-in; enough structure for SIREN fitting).

    ``texture > 0`` superimposes band-limited random texture inside the
    skull (FFT low-pass-filtered white noise) — real FLAIR slices carry
    fine-scale tissue texture that the piecewise-constant ellipses lack,
    and that texture is what gives the reference's SSIM distribution its
    low tail (README.md:34-41, SSIM min ~0.72)."""
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
    if texture > 0.0:
        # low-pass-filter white noise in the frequency domain (numpy-only
        # gaussian blur): keep spatial frequencies below ~1/8 Nyquist
        noise = rng.normal(size=(height, width))
        fy = np.fft.fftfreq(height)[:, None]
        fx = np.fft.fftfreq(width)[None, :]
        lp = np.exp(-((fy**2 + fx**2) / (2 * 0.06**2)))
        smooth = np.fft.ifft2(np.fft.fft2(noise) * lp).real
        smooth /= max(np.abs(smooth).max(), 1e-12)
        img += texture * smooth.astype(np.float32)
    img *= outer
    img -= img.min()
    if img.max() > 0:
        img /= img.max()
    return img.astype(np.float32)


def phantom_volume(
    seed: int,
    num_slices: int = 12,
    height: int = 320,
    width: int = 320,
    texture: float = 0.0,
) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return np.stack(
        [phantom_slice(rng, height, width, texture=texture)
         for _ in range(num_slices)]
    )


def random_phase_map(
    rng: np.random.Generator, height: int, width: int, components: int = 4
) -> np.ndarray:
    """Smooth low-frequency phase map in radians (sum of random 2-D
    cosines, <= ~2 cycles across the FOV). Real single-coil MRI magnitude
    images come from COMPLEX images with slowly-varying phase (B0
    inhomogeneity, coil phase); with a non-trivial phase the masked k-space
    loses conjugate symmetry and undersampling artifacts behave like the
    reference's real fastMRI inputs."""
    yy, xx = np.mgrid[0:height, 0:width]
    yy = yy / height
    xx = xx / width
    phi = np.zeros((height, width))
    for _ in range(components):
        fy, fx = rng.uniform(-2.0, 2.0, 2)
        amp = rng.uniform(0.4, 1.6)
        phi += amp * np.cos(2 * np.pi * (fy * yy + fx * xx)
                            + rng.uniform(0, 2 * np.pi))
    return phi.astype(np.float32)


def volume_to_kspace(
    volume: np.ndarray,
    phase: np.ndarray | None = None,
    noise_rng: np.random.Generator | None = None,
    snr_db: float | None = None,
) -> np.ndarray:
    """Image-space magnitude volume -> centered k-space (numpy, host-side;
    matches ``fft2c`` semantics).

    ``phase``: per-slice (S, H, W) radian maps multiplied in as
    ``exp(i*phase)`` before the FFT (complex image model).
    ``snr_db`` (+ ``noise_rng``): add complex white Gaussian noise in
    k-space at the given SNR relative to the k-space RMS signal — the
    measurement-noise model that gives reconstructed magnitudes their
    Rician noise floor."""
    img = volume.astype(np.complex64)
    if phase is not None:
        img = img * np.exp(1j * phase.astype(np.float32))
    shifted = np.fft.ifftshift(img, axes=(-2, -1))
    k = np.fft.fft2(shifted, axes=(-2, -1), norm="ortho")
    k = np.fft.fftshift(k, axes=(-2, -1)).astype(np.complex64)
    if snr_db is not None:
        if noise_rng is None:
            noise_rng = np.random.default_rng(0)
        rms = np.sqrt(np.mean(np.abs(k) ** 2))
        # float32 sigma: a float64 scalar would promote the sum to
        # complex128 under NumPy 2's dtype rules, doubling the .h5 size
        # and breaking the fastMRI complex64 layout (r5 review)
        sigma = np.float32(rms / (10.0 ** (snr_db / 20.0)) / np.sqrt(2.0))
        k = (k + sigma * (
            noise_rng.normal(size=k.shape) + 1j * noise_rng.normal(size=k.shape)
        ).astype(np.complex64)).astype(np.complex64)
    return k


def write_synthetic_h5(
    directory: str | pathlib.Path,
    num_files: int = 3,
    num_slices: int = 12,
    height: int = 320,
    width: int = 320,
    seed: int = 0,
    phase: bool = False,
    snr_db: float | None = None,
    texture: float = 0.0,
) -> list[pathlib.Path]:
    """Write fastMRI-layout ``.h5`` files (``kspace`` dataset, FLAIR brain
    filenames so the reference's filename-metadata parser logic applies).

    Defaults reproduce the original smooth real-valued phantoms (r1-r4
    corpora, bit-stable). ``phase=True`` + ``snr_db`` + ``texture`` are
    the r5 "hard mode" (see the helpers above): complex phase, k-space
    measurement noise, and tissue-like texture, which together push the
    metric spreads toward the reference's real-fastMRI distributions
    (README.md:34-41: PSNR std ~2, SSIM min ~0.72)."""
    import h5py

    directory = pathlib.Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    paths = []
    for i in range(num_files):
        vol = phantom_volume(seed + i, num_slices, height, width,
                             texture=texture)
        rng = np.random.default_rng(10_000_019 * (seed + i) + 7)
        phase_maps = (
            np.stack([random_phase_map(rng, height, width)
                      for _ in range(num_slices)])
            if phase else None
        )
        k = volume_to_kspace(
            vol, phase=phase_maps,
            noise_rng=rng if snr_db is not None else None,
            snr_db=snr_db,
        )
        path = directory / f"file_brain_AXFLAIR_{seed + i:06d}.h5"
        with h5py.File(path, "w") as f:
            f.create_dataset("kspace", data=k)
        paths.append(path)
    return paths
