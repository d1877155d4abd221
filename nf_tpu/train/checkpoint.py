"""Checkpoint save/restore: single-pytree, host-0 writes, atomic replace.

Behavior parity: /root/reference/main.py:94-107 ('net' + 'optim' + 'step' in
one file, resume returns the step) — done as one flattened-pytree .npz so it
is framework-neutral and includes ALL mutable state (BatchNorm stats, MADE
masks, ActNorm initialized flag — fixing the reference's lost-flag resume
quirk, SURVEY.md §5.4) plus the optimizer state.
"""
from __future__ import annotations

import io
import json
import os
import tempfile
from typing import Any, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_checkpoint(path: str, tree: Any, step: int) -> None:
    """Serialize ``tree`` (any pytree of arrays/scalars) to ``path``.

    Only process 0 writes (multi-host safe); the write is atomic
    (tmp + rename) so a preemption never leaves a torn file.
    """
    if jax.process_index() != 0:
        return
    flat, treedef = _flatten_with_paths(jax.device_get(tree))
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    payload["__step__"] = np.asarray(step)
    buf = io.BytesIO()
    np.savez(buf, **payload)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)),
                               suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def load_checkpoint(path: str, like: Any) -> Tuple[Any, int]:
    """Restore a pytree with the same structure as ``like``; returns
    (tree, step)."""
    data = np.load(path, allow_pickle=False)
    flat_like, treedef = _flatten_with_paths(like)
    n = len(flat_like)
    flat = [data[f"leaf_{i}"] for i in range(n)]
    flat = [np.asarray(x, dtype=np.asarray(l).dtype).reshape(np.shape(l))
            for x, l in zip(flat, flat_like)]
    step = int(data["__step__"])
    return jax.tree_util.tree_unflatten(treedef, flat), step
