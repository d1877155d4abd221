"""FFJORD model builder.

Behavior parity: /root/reference/flows/ffjord.py:10-42 — n x [ActNorm ->
CNF(times, solver, trace)] with the time grid linspace(t0, t1,
ceil((t1-t0)/stepsize)+1); image data unsupported in the reference
(ffjord.py:24-26).
"""
from __future__ import annotations

import numpy as np

from ..bijectors.cnf import CNF
from ..bijectors.norm import ActNorm
from ..core.bijector import Chain, scan_repeated
from .base import FlowModel


def build_ffjord(dims, datatype=None, cfg=None) -> FlowModel:
    if datatype == "image":
        raise NotImplementedError(
            "FFJORD for image data is not supported "
            "(parity: reference flows/ffjord.py:24-26)")
    steps = int(np.ceil((cfg.t1 - cfg.t0) / cfg.stepsize)) + 1
    times = np.linspace(cfg.t0, cfg.t1, steps, dtype=np.float32)
    layers = []
    for _ in range(cfg.layers):
        layers.append(ActNorm(dims[-1]))
        layers.append(CNF(dims, times=times, solver=cfg.solver,
                          trace_estimator=cfg.trace, backprop=cfg.backprop,
                          base_filters=cfg.base_filters))
    remat = getattr(cfg, "remat", False)
    if getattr(cfg, "scan", False):
        return FlowModel("ffjord", scan_repeated(layers, 2, remat=remat), dims)
    return FlowModel("ffjord", Chain(layers, remat=remat), dims)
