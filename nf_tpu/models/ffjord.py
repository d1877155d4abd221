"""FFJORD model builder.

Behavior parity: /root/reference/flows/ffjord.py:10-42 — n x [ActNorm ->
CNF(times, solver, trace)] with the time grid linspace(t0, t1,
ceil((t1-t0)/stepsize)+1); image data unsupported in the reference
(ffjord.py:24-26) and raises here too unless ``cfg.allow_image`` opts in.

Beyond-parity (cfg.allow_image): image mode wires the conv ODENet the
reference ships but never uses (flows/cnf.py:55-65): Logit(0.01) input
transform -> n x [ActNorm -> CNF(conv dynamics over NHWC)].
"""
from __future__ import annotations

import numpy as np

from ..bijectors.cnf import CNF
from ..bijectors.elementwise import Logit
from ..bijectors.norm import ActNorm
from ..core.bijector import Chain, scan_repeated
from .base import FlowModel


def build_ffjord(dims, datatype=None, cfg=None) -> FlowModel:
    is_image = datatype == "image"
    if is_image and not getattr(cfg, "allow_image", False):
        raise NotImplementedError(
            "FFJORD for image data is not supported by the reference "
            "(flows/ffjord.py:24-26); opt in to the conv-ODENet variant "
            "with network.allow_image=true")
    steps = int(np.ceil((cfg.t1 - cfg.t0) / cfg.stepsize)) + 1
    times = np.linspace(cfg.t0, cfg.t1, steps, dtype=np.float32)
    rtol = getattr(cfg, "rtol", None)
    atol = getattr(cfg, "atol", None)
    layers = [Logit(eps=0.01, compress=True)] if is_image else []
    for _ in range(cfg.layers):
        layers.append(ActNorm(dims[-1]))
        layers.append(CNF(dims, times=times, solver=cfg.solver,
                          trace_estimator=cfg.trace, backprop=cfg.backprop,
                          base_filters=cfg.base_filters,
                          rtol=rtol, atol=atol))
    remat = getattr(cfg, "remat", False)
    if getattr(cfg, "scan", False) and not is_image:
        return FlowModel("ffjord", scan_repeated(layers, 2, remat=remat), dims)
    return FlowModel("ffjord", Chain(layers, remat=remat), dims)
