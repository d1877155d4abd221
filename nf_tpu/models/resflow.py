"""Residual Flow model builder.

Behavior parity: /root/reference/flows/resflow.py:9-38 — n x [ActNorm ->
InvertibleResLinear(coeff=cfg.spnorm_coeff, estimator=cfg.logdet)];
image data unsupported in the reference (resflow.py:17-19) and raises here
too unless ``cfg.allow_image`` opts in.

Beyond-parity (cfg.allow_image): image mode wires the conv residual block
the reference ships but never uses (flows/iresblock.py:281-301) into a
Residual-Flow-style stack: Logit(0.01) input transform -> Squeeze2d (gives
the convs 4C channels) -> n x [ActNorm -> InvertibleResConv2d] ->
Unsqueeze2d back to the input resolution.
"""
from __future__ import annotations

from ..bijectors.elementwise import Logit
from ..bijectors.iresblock import InvertibleResConv2d, InvertibleResLinear
from ..bijectors.norm import ActNorm
from ..bijectors.squeeze import Squeeze2d, Unsqueeze2d
from ..core.bijector import Chain, scan_repeated
from .base import FlowModel


def build_resflow(dims, datatype=None, cfg=None) -> FlowModel:
    remat = getattr(cfg, "remat", False)
    scan = getattr(cfg, "scan", False)
    if datatype == "image":
        if not getattr(cfg, "allow_image", False):
            raise NotImplementedError(
                "ResFlow for image data is not supported by the reference "
                "(flows/resflow.py:17-19); opt in to the conv variant with "
                "network.allow_image=true")
        c4 = dims[-1] * 4
        spatial = (dims[0] // 2, dims[1] // 2)
        stage = []
        for _ in range(cfg.layers):
            stage.append(ActNorm(c4))
            stage.append(InvertibleResConv2d(
                c4, c4, base_filters=cfg.base_filters,
                coeff=cfg.spnorm_coeff, logdet_estimator=cfg.logdet,
                spatial=spatial))
        if scan:
            stage = [scan_repeated(stage, 2, remat=remat)]
        layers = ([Logit(eps=0.01, compress=True), Squeeze2d(odd=False)] + stage
                  + [Unsqueeze2d(odd=False)])
        return FlowModel("resflow", Chain(layers, remat=remat and not scan),
                         dims)
    layers = []
    for _ in range(cfg.layers):
        layers.append(ActNorm(dims[-1]))
        layers.append(InvertibleResLinear(
            dims[-1], dims[-1], base_filters=cfg.base_filters,
            coeff=cfg.spnorm_coeff, logdet_estimator=cfg.logdet))
    if scan:
        return FlowModel("resflow", scan_repeated(layers, 2, remat=remat), dims)
    return FlowModel("resflow", Chain(layers, remat=remat), dims)
