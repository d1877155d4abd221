"""Planar flow model builder.

Behavior parity: /root/reference/flows/planar.py:71-93 — n_layers stacked
planar transforms over the flattened dimension.  (The reference constructs a
BatchNorm per layer but never appends it — planar.py:81, a latent bug; we
deliberately do not replicate it, per SURVEY.md §7.)
"""
from __future__ import annotations

import numpy as np

from ..bijectors.planar import PlanarTransform
from ..core.bijector import Chain, scan_repeated
from .base import FlowModel


def build_planar(dims, datatype=None, cfg=None) -> FlowModel:
    dim = int(np.prod(dims))
    layers = [PlanarTransform(dim) for _ in range(cfg.layers)]
    remat = getattr(cfg, "remat", False)
    if getattr(cfg, "scan", False):
        return FlowModel("planar", scan_repeated(layers, 1, remat=remat), dims)
    return FlowModel("planar", Chain(layers, remat=remat), dims)
