"""Visual report pipeline: data/latent/sample scatters, density heatmap,
image grids.

Parity: Model.report at /root/reference/main.py:135-284, with the
``save_files``-vs-``save_image`` truthiness bug fixed (SURVEY.md §5.5):
image files are written only when ``save_files`` is True; TensorBoard/JSONL
panels are emitted on every report tick.
"""
from __future__ import annotations

import os
import shutil

import jax
import numpy as np

from ..core.bijector import Ctx
from ..utils import plotting
from .metrics import MetricWriter


def _save(run_dir, name, step, image, save_files):
    if not save_files:
        return
    out = os.path.join(run_dir, f"{name}_{step:06d}.jpg")
    plotting.save_image(out, image)
    shutil.copyfile(out, os.path.join(run_dir, f"{name}_latest.jpg"))


def report(trainer, ts, writer: MetricWriter, y_data: np.ndarray, step: int,
           run_dir: str, save_files: bool = False, name: str = "flow"):
    if jax.process_index() != 0:
        return
    y_data = np.asarray(y_data)
    if y_data.ndim == 2 and y_data.shape[1] == 2:
        dtype = "2d"
    elif y_data.ndim == 2 and y_data.shape[1] == 3:
        dtype = "3d"
    else:
        dtype = "image"
    title = f"{name}_{step}_steps"
    n = y_data.shape[0]

    if dtype == "2d":
        img = plotting.scatter_plot(y_data[:, 0], y_data[:, 1], title=title)
        writer.image("2d/data/y", img, step)
        _save(run_dir, "y_data", step, img, save_files)

        z, _ = trainer.forward(ts, y_data)
        z = np.asarray(z)
        pz = np.exp(-0.5 * (z ** 2).sum(1) - np.log(2 * np.pi))
        img = plotting.scatter_plot(z[:, 0], z[:, 1], colors=pz, title=title)
        writer.image("2d/train/z", img, step)
        _save(run_dir, "z_sample", step, img, save_files)

        y, py = trainer.sample(ts, jax.random.PRNGKey(step), max(100, n))
        y, py = np.asarray(y), np.asarray(py)
        img = plotting.scatter_plot(y[:, 0], y[:, 1], colors=py, title=title)
        writer.image("2d/test/y", img, step)
        _save(run_dir, "y_sample", step, img, save_files)

        # 256x256 density heatmap over [-1, 1]^2
        m = 256
        ix = (np.arange(m) + 0.5) / m * 2.0 - 1.0
        iy = (np.arange(m) + 0.5) / m * -2.0 + 1.0
        gx, gy = np.meshgrid(ix, iy)
        grid = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.float32)
        logp = np.asarray(trainer.log_prob(ts, grid))
        py_map = np.exp(logp).reshape(m, m)
        img = plotting.image_plot(py_map, title=title, extent=[-1, 1, -1, 1])
        writer.image("2d/test/map", img, step)
        _save(run_dir, "y_dist", step, img, save_files)

    elif dtype == "3d":
        z, _ = trainer.forward(ts, y_data)
        z = np.asarray(z)
        pz = np.exp(-0.5 * (z ** 2).sum(1) - 1.5 * np.log(2 * np.pi))
        img = plotting.scatter_plot(z[:, 0], z[:, 1], z[:, 2], colors=pz, title=title)
        writer.image("3d/train/z", img, step)
        _save(run_dir, "z_sample", step, img, save_files)

        y, py = trainer.sample(ts, jax.random.PRNGKey(step), max(100, n))
        y, py = np.asarray(y), np.asarray(py)
        img = plotting.scatter_plot(y[:, 0], y[:, 1], y[:, 2], colors=py, title=title)
        writer.image("3d/test/y", img, step)
        _save(run_dir, "y_sample", step, img, save_files)

    else:  # image
        grid = plotting.make_grid(np.clip(y_data[:64], 0.0, 1.0))
        writer.image("image/test/data", (grid * 255).astype(np.uint8), step)
        _save(run_dir, "y_data", step, grid, save_files)

        y, _ = trainer.sample(ts, jax.random.PRNGKey(step), 64)
        y = np.clip(np.asarray(y), 0.0, 1.0)
        grid = plotting.make_grid(y)
        writer.image("image/test/sample", (grid * 255).astype(np.uint8), step)
        _save(run_dir, "y_image", step, grid, save_files)
