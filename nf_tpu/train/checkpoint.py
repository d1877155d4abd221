"""Checkpoint save/restore: single-pytree, host-0 writes, atomic replace.

Behavior parity: /root/reference/main.py:94-107 ('net' + 'optim' + 'step' in
one file, resume returns the step) — done as one flattened-pytree .npz so it
is framework-neutral and includes ALL mutable state (BatchNorm stats, MADE
masks, ActNorm initialized flag — fixing the reference's lost-flag resume
quirk, SURVEY.md §5.4) plus the optimizer state.

Beyond-parity safety: every checkpoint embeds a structure fingerprint
(key path + shape + dtype per leaf).  Loading into a tree whose structure
differs — e.g. a reordered layer stack where shapes happen to coincide —
fails loudly instead of silently loading the wrong weights.
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


def _structure_fingerprint(tree) -> list:
    """[[keypath, shape, dtype], ...] — one entry per leaf, in flatten
    order.  The keypath string pins layer identity, so reordered stacks
    with coincidentally matching shapes are caught at load."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = []
    for path, leaf in leaves:
        a = np.asarray(leaf)
        out.append([jax.tree_util.keystr(path), list(a.shape), str(a.dtype)])
    return out


def save_checkpoint(path: str, tree: Any, step: int) -> None:
    """Serialize ``tree`` (any pytree of arrays/scalars) to ``path``.

    Only process 0 writes (multi-host safe); the write is atomic
    (tmp + rename) so a preemption never leaves a torn file.
    """
    if jax.process_index() != 0:
        return
    tree = jax.device_get(tree)
    flat, treedef = _flatten_with_paths(tree)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    payload["__step__"] = np.asarray(step)
    payload["__structure__"] = np.asarray(
        json.dumps(_structure_fingerprint(tree)))
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
    (tree, step).  Raises ValueError when the checkpoint's structure
    fingerprint does not match ``like`` (wrong model config / layer
    reorder), instead of silently loading misassigned weights."""
    data = np.load(path, allow_pickle=False)
    flat_like, treedef = _flatten_with_paths(like)
    n = len(flat_like)
    if "__structure__" in data:
        saved = json.loads(str(data["__structure__"]))
        current = _structure_fingerprint(like)
        if saved != current:
            diffs = [f"  leaf {i}: saved {s} != current {c}"
                     for i, (s, c) in enumerate(zip(saved, current))
                     if s != c]
            if len(saved) != len(current):
                diffs.append(f"  leaf count: saved {len(saved)} != "
                             f"current {len(current)}")
            raise ValueError(
                f"checkpoint structure mismatch for {path!r} "
                f"(different model config or layer order?):\n"
                + "\n".join(diffs[:20]))
    flat = [data[f"leaf_{i}"] for i in range(n)]
    flat = [np.asarray(x, dtype=np.asarray(l).dtype).reshape(np.shape(l))
            for x, l in zip(flat, flat_like)]
    step = int(data["__step__"])
    return jax.tree_util.tree_unflatten(treedef, flat), step
