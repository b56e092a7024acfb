"""Image/plot artifact rendering (matplotlib, headless).

Capability parity with the reference's ``src/util/visualization.py``
(studied, not copied): per-image min-max-normalized grayscale PNG saves,
4-panel comparison figures, metric boxplots and density plots.
"""

from __future__ import annotations

import pathlib

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def normalize_image(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img, np.float32)
    lo, hi = img.min(), img.max()
    if hi > lo:
        img = (img - lo) / (hi - lo)
    return img


def save_image(img, name: str, output_dir: str | pathlib.Path, dpi: int = 300):
    output_dir = pathlib.Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    fig, ax = plt.subplots()
    ax.imshow(normalize_image(np.asarray(img)), cmap="gray")
    ax.axis("off")
    fig.savefig(output_dir / f"{name}.png", dpi=dpi, bbox_inches="tight")
    plt.close(fig)


def save_image_comparison(
    images: list, titles: list[str], name: str, output_dir: str | pathlib.Path
):
    output_dir = pathlib.Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    fig, axes = plt.subplots(1, len(images), figsize=(4 * len(images), 4))
    if len(images) == 1:
        axes = [axes]
    for ax, img, title in zip(axes, images, titles):
        ax.imshow(normalize_image(np.asarray(img)), cmap="gray")
        ax.set_title(title)
        ax.axis("off")
    fig.savefig(output_dir / f"{name}.png", dpi=150, bbox_inches="tight")
    plt.close(fig)


def metrics_boxplot(values: dict[str, np.ndarray], output_dir: str | pathlib.Path):
    output_dir = pathlib.Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    for name, arr in values.items():
        fig, ax = plt.subplots()
        ax.boxplot(np.asarray(arr))
        ax.set_title(f"{name} boxplot")
        ax.set_ylabel(name)
        fig.savefig(output_dir / f"{name.lower()}_boxplot.png", dpi=150)
        plt.close(fig)


def metrics_density_plot(values: dict[str, np.ndarray], output_dir: str | pathlib.Path):
    output_dir = pathlib.Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    for name, arr in values.items():
        arr = np.asarray(arr)
        fig, ax = plt.subplots()
        ax.hist(arr, bins=40, density=True, alpha=0.6)
        if arr.std() > 0:
            # light Gaussian KDE without scipy
            grid = np.linspace(arr.min(), arr.max(), 200)
            bw = 1.06 * arr.std() * len(arr) ** (-1 / 5)
            kde = np.exp(
                -0.5 * ((grid[:, None] - arr[None, :]) / bw) ** 2
            ).sum(axis=1) / (len(arr) * bw * np.sqrt(2 * np.pi))
            ax.plot(grid, kde)
        ax.set_title(f"{name} density")
        ax.set_xlabel(name)
        fig.savefig(output_dir / f"{name.lower()}_density.png", dpi=150)
        plt.close(fig)
