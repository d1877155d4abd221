"""Matplotlib (Agg) visual report helpers.

Parity: /root/reference/common/utils.py:12-83 — 2D/3D scatter and heatmap
rendered to HWC uint8 arrays, plus JPEG save and an image-grid composer
(replacing torchvision.utils.make_grid).
"""
from __future__ import annotations

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _fig_to_array(fig) -> np.ndarray:
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    return buf.copy()


def scatter_plot(xs, ys, zs=None, colors=None, title="") -> np.ndarray:
    fig = plt.figure(figsize=(6, 6), dpi=100)
    if zs is None:
        ax = fig.add_subplot(111)
        ax.scatter(xs, ys, c=colors, cmap="viridis", s=2)
        ax.set_xlim(-1.1, 1.1)
        ax.set_ylim(-1.1, 1.1)
    else:
        ax = fig.add_subplot(111, projection="3d")
        ax.scatter(xs, ys, zs, c=colors, cmap="viridis", s=2)
    ax.set_title(title)
    return _fig_to_array(fig)


def image_plot(values: np.ndarray, title="", extent=(-1, 1, -1, 1)) -> np.ndarray:
    fig = plt.figure(figsize=(6, 6), dpi=100)
    ax = fig.add_subplot(111)
    im = ax.imshow(values, cmap="viridis", extent=extent)
    fig.colorbar(im, ax=ax)
    ax.set_title(title)
    return _fig_to_array(fig)


def make_grid(images: np.ndarray, nrow: int = 8, pad: int = 1,
              pad_value: float = 1.0) -> np.ndarray:
    """(N, H, W, C) float [0,1] -> single (H', W', C) grid array."""
    n, h, w, c = images.shape
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    grid = np.full((nrows * (h + pad) + pad, ncol * (w + pad) + pad, c),
                   pad_value, dtype=np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        y0 = pad + r * (h + pad)
        x0 = pad + col * (w + pad)
        grid[y0:y0 + h, x0:x0 + w] = images[i]
    return grid


def assemble_gif(frame_paths, out_path: str, duration_ms: int = 200) -> bool:
    """Training-progress movie from saved report frames (parity with the
    reference's results/density/<model>/movie.gif)."""
    from PIL import Image

    frames = [Image.open(p).convert("P") for p in frame_paths]
    if not frames:
        return False
    frames[0].save(out_path, save_all=True, append_images=frames[1:],
                   duration=duration_ms, loop=0)
    return True


def save_image(path: str, array: np.ndarray) -> None:
    from PIL import Image

    arr = np.asarray(array)
    if arr.dtype != np.uint8:
        arr = np.clip(arr * 255.0 if arr.max() <= 1.5 else arr, 0, 255).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path, quality=90)
