"""Plotting / image-grid utilities for eval artifacts.

Rebuild of the reference's matplotlib-based diagnostics
(reference: utils_d3roma/camera.py:782-1017): error maps, uncertainty
maps, loss-term curves, denoised-image grids, and colormapped depth
export. All take numpy/JAX arrays (channel-last)."""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

CMAP_JET = plt.get_cmap("jet")
CMAP_MAGMA = plt.get_cmap("magma")
CMAP_SPECTRAL = plt.get_cmap("Spectral")


def colorize(
    x: np.ndarray, cmap=CMAP_SPECTRAL, vmin=None, vmax=None
) -> np.ndarray:
    """Scalar map [H,W] -> uint8 RGB via a colormap (the Spectral pred.png
    contract — reference: inference.py:307-311)."""
    x = np.asarray(x, np.float32)
    vmin = np.nanmin(x) if vmin is None else vmin
    vmax = np.nanmax(x) if vmax is None else vmax
    nx = (x - vmin) / max(vmax - vmin, 1e-12)
    return (cmap(np.clip(nx, 0, 1))[..., :3] * 255).astype(np.uint8)


def save_colorized(path: str, x: np.ndarray, cmap=CMAP_SPECTRAL, vmin=None, vmax=None):
    from PIL import Image

    Image.fromarray(colorize(x, cmap, vmin, vmax)).save(path)


def plot_error_map(
    gt: np.ndarray, pred: np.ndarray, mask: Optional[np.ndarray], path: str,
    vmax: Optional[float] = None,
) -> None:
    """|gt - pred| over the mask as a jet map (reference: camera.py:782-800)."""
    err = np.abs(np.asarray(gt, np.float32) - np.asarray(pred, np.float32))
    if mask is not None:
        err = err * np.asarray(mask, np.float32)
    fig, ax = plt.subplots(figsize=(8, 5))
    im = ax.imshow(err, cmap="jet", vmax=vmax)
    fig.colorbar(im, ax=ax)
    ax.set_axis_off()
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def plot_uncertainties(unc: np.ndarray, path: str) -> None:
    """Multi-round sigma map (reference: camera.py:815-838)."""
    fig, ax = plt.subplots(figsize=(8, 5))
    im = ax.imshow(np.asarray(unc, np.float32), cmap="magma")
    fig.colorbar(im, ax=ax)
    ax.set_axis_off()
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def plot_loss_terms(curves: Dict[str, Sequence[float]], path: str) -> None:
    """Per-timestep loss/weight curves (reference: camera.py:802-812)."""
    fig, ax = plt.subplots(figsize=(8, 5))
    for name, ys in curves.items():
        ax.plot(list(ys), label=name)
    ax.legend()
    ax.set_xlabel("t")
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def plot_denoised_images(
    images: Sequence[np.ndarray], path: str, ncols: int = 4, cmap=CMAP_SPECTRAL
) -> None:
    """Grid of intermediate x_hat0 frames (reference: camera.py:840-900)."""
    n = len(images)
    if n == 0:
        return  # nothing to plot (subplots(0, ...) raises)
    ncols = min(ncols, max(1, n))
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(3 * ncols, 2 * nrows))
    axes = np.atleast_1d(axes).ravel()
    for i, ax in enumerate(axes):
        ax.set_axis_off()
        if i < n:
            ax.imshow(np.asarray(images[i], np.float32).squeeze(), cmap=cmap)
            ax.set_title(f"step {i}", fontsize=8)
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)


def make_image_grid(
    images: List[np.ndarray], rows: int, cols: int
) -> np.ndarray:
    """Tile uint8 RGB images into one canvas (reference: camera.py:959-1017)."""
    assert len(images) <= rows * cols
    h = max(im.shape[0] for im in images)
    w = max(im.shape[1] for im in images)
    canvas = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i, im in enumerate(images):
        if im.ndim == 2:
            im = np.stack([im] * 3, axis=-1)
        r, c = divmod(i, cols)
        canvas[r * h : r * h + im.shape[0], c * w : c * w + im.shape[1]] = im[..., :3]
    return canvas


def plot_intermediate_metrics(
    metric_curves: Dict[str, Sequence[float]], path: str
) -> None:
    """Metric-vs-denoise-step curves (reference: evaluate.py:263-295)."""
    n = len(metric_curves)
    if n == 0:
        return  # nothing to plot (subplots(1, 0) raises)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 3))
    axes = np.atleast_1d(axes)
    for ax, (name, ys) in zip(axes, metric_curves.items()):
        ax.plot(list(ys))
        ax.set_title(name)
        ax.set_xlabel("denoise step")
    fig.savefig(path, bbox_inches="tight")
    plt.close(fig)
