"""Image dataset readers: MNIST (IDX) and CIFAR-10 (binary batches).

Mirrors the reference's torchvision pipeline contract
(/root/reference/flows/dataset.py:67-79: MNIST zero-padded 28->32,
CIFAR-10 as-is, pixel values scaled to [0, 1]) but reads the raw on-disk
formats directly — no torchvision dependency — and lays images out NHWC
(the TPU-native layout; the reference uses NCHW).

When the dataset files are absent under ``data_root`` (this image has no
network egress), a deterministic synthetic generator with the same
shapes/dtype/value-range keeps the full pipeline runnable and testable.
"""
from __future__ import annotations

import gzip
import os
import struct

import numpy as np

MNIST_DIMS = (32, 32, 1)
CIFAR10_DIMS = (32, 32, 3)


def _maybe_open(path: str):
    if os.path.exists(path):
        return open(path, "rb")
    if os.path.exists(path + ".gz"):
        return gzip.open(path + ".gz", "rb")
    return None


def _read_idx_images(f) -> np.ndarray:
    magic, n, rows, cols = struct.unpack(">IIII", f.read(16))
    if magic != 2051:
        raise ValueError(f"bad IDX image magic {magic:#x}")
    buf = f.read(n * rows * cols)
    return np.frombuffer(buf, dtype=np.uint8).reshape(n, rows, cols)


def load_mnist(data_root: str, train: bool = True) -> np.ndarray | None:
    """float32[N,32,32,1] in [0,1], 28x28 zero-padded to 32x32; None if
    the IDX files are not on disk."""
    stem = "train-images-idx3-ubyte" if train else "t10k-images-idx3-ubyte"
    for sub in ("MNIST/raw", "mnist", ""):
        f = _maybe_open(os.path.join(data_root, sub, stem))
        if f is not None:
            with f:
                raw = _read_idx_images(f)
            x = raw.astype(np.float32) / 255.0
            x = np.pad(x, ((0, 0), (2, 2), (2, 2)))
            return x[..., None]
    return None


def load_cifar10(data_root: str, train: bool = True) -> np.ndarray | None:
    """float32[N,32,32,3] in [0,1]; None if the binary batches are not on
    disk."""
    names = ([f"data_batch_{i}.bin" for i in range(1, 6)]
             if train else ["test_batch.bin"])
    chunks = []
    for sub in ("cifar-10-batches-bin", "cifar10", ""):
        base = os.path.join(data_root, sub)
        if not all(os.path.exists(os.path.join(base, n)) for n in names):
            continue
        for n in names:
            raw = np.fromfile(os.path.join(base, n), dtype=np.uint8)
            rec = raw.reshape(-1, 3073)[:, 1:]  # drop label byte
            chw = rec.reshape(-1, 3, 32, 32)
            chunks.append(np.transpose(chw, (0, 2, 3, 1)))
        return np.concatenate(chunks).astype(np.float32) / 255.0
    return None


def synthetic_images(name: str, n: int, seed: int) -> np.ndarray:
    """Deterministic structured stand-in images (smooth blobs + digit-ish
    strokes), same shape/dtype/range contract as the real datasets."""
    dims = MNIST_DIMS if name == "mnist" else CIFAR10_DIMS
    h, w, c = dims
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cx = rng.uniform(8, w - 8, size=(n, 1, 1)).astype(np.float32)
    cy = rng.uniform(8, h - 8, size=(n, 1, 1)).astype(np.float32)
    sig = rng.uniform(2.0, 5.0, size=(n, 1, 1)).astype(np.float32)
    blob = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * sig ** 2))
    phase = rng.uniform(0, 2 * np.pi, size=(n, 1, 1)).astype(np.float32)
    stroke = 0.5 + 0.5 * np.sin(0.5 * (xx + 2 * yy) + phase)
    img = np.clip(0.7 * blob + 0.3 * blob * stroke, 0.0, 1.0)
    out = np.repeat(img[..., None], c, axis=-1)
    if c == 3:  # decorrelate channels a bit
        tint = rng.uniform(0.5, 1.0, size=(n, 1, 1, 3)).astype(np.float32)
        out = out * tint
    # quantize to the 8-bit grid: the real datasets are uint8/255, and a
    # continuous stand-in makes the image NLL unbounded (differential
    # entropy -> -inf), so bits/dim would be meaningless
    out = np.round(out * 255.0) / 255.0
    return out.astype(np.float32)


IMAGE_DATASETS = {
    "mnist": MNIST_DIMS,
    "cifar10": CIFAR10_DIMS,
    # 2x-subsampled variants (16x16): the budget tier for the iterative /
    # ODE image models (resflow/ffjord conv stacks), same 8-bit grid
    "mnist16": (16, 16, 1),
    "cifar16": (16, 16, 3),
}


def load_images(name: str, data_root: str, seed: int = 0,
                synthetic_n: int = 8192) -> tuple[np.ndarray, bool]:
    """Returns (images NHWC float32 in [0,1], is_real)."""
    if name not in IMAGE_DATASETS:
        raise KeyError(name)
    sub = name.endswith("16")
    base = {"mnist": "mnist", "mnist16": "mnist",
            "cifar10": "cifar10", "cifar16": "cifar10"}[name]
    if base == "mnist":
        x = load_mnist(data_root)
    elif base == "cifar10":
        x = load_cifar10(data_root)
    else:
        raise KeyError(name)
    if x is None:
        x, is_real = synthetic_images(base, synthetic_n, seed), False
    else:
        is_real = True
    if sub:
        # pixel subsampling stays on the 8-bit grid (vs averaging, which
        # would leave the grid and break the discrete bits/dim accounting)
        x = np.ascontiguousarray(x[:, ::2, ::2, :])
    return x, is_real
