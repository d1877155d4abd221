"""Glow model builder.

Behavior parity: /root/reference/flows/glow.py:10-68 —
  * density: n x [ActNorm -> InvertibleConv1x1 -> AffineCoupling(alt odd)];
  * image: Logit(0.01) then the same multi-scale skeleton as RealNVP with
    ActNorm + 1x1 conv before every coupling.
"""
from __future__ import annotations

from ..bijectors.conv1x1 import InvertibleConv1x1
from ..bijectors.coupling import AffineCoupling
from ..bijectors.elementwise import Logit
from ..bijectors.norm import ActNorm
from ..bijectors.squeeze import Squeeze2d, Unsqueeze2d
from ..core.bijector import Chain
from .base import FlowModel


def build_glow(dims, datatype=None, cfg=None) -> FlowModel:
    n_layers = cfg.layers
    bf = getattr(cfg, "base_filters", 32)
    layers = []
    if datatype == "image":
        h, w, c = dims
        layers.append(Logit(eps=0.01))
        mid = (h, w, c)
        while max(mid[0], mid[1]) > 8:
            for i in range(n_layers):
                layers.append(ActNorm(mid[2]))
                layers.append(InvertibleConv1x1(mid[2]))
                layers.append(AffineCoupling(mid, masking="checkerboard",
                                             odd=i % 2 != 0, base_filters=bf))
            layers.append(Squeeze2d(odd=False))
            mid = (mid[0] // 2, mid[1] // 2, mid[2] * 4)
            for i in range(n_layers):
                layers.append(ActNorm(mid[2]))
                layers.append(InvertibleConv1x1(mid[2]))
                layers.append(AffineCoupling(mid, masking="channelwise",
                                             odd=i % 2 != 0, base_filters=bf))
        for i in range(n_layers + 1):
            layers.append(ActNorm(mid[2]))
            layers.append(InvertibleConv1x1(mid[2]))
            layers.append(AffineCoupling(mid, masking="checkerboard",
                                         odd=i % 2 != 0, base_filters=bf))
        while mid[0] != h or mid[1] != w:
            layers.append(Unsqueeze2d(odd=False))
            mid = (mid[0] * 2, mid[1] * 2, mid[2] // 4)
    else:
        for i in range(n_layers):
            layers.append(ActNorm(dims[-1]))
            layers.append(InvertibleConv1x1(dims[-1]))
            layers.append(AffineCoupling(dims, odd=i % 2 != 0, base_filters=bf))
    return FlowModel("glow", Chain(layers, remat=getattr(cfg, 'remat', False)), dims)
