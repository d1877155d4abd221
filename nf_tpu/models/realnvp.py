"""RealNVP model builder.

Behavior parity: /root/reference/flows/realnvp.py:9-63 —
  * density mode: n x [BatchNorm(affine=False) -> AffineCoupling(alt odd)];
  * image mode: Logit(0.01) input transform, then the multi-scale loop
    (checkerboard couplings x n -> Squeeze2d -> channelwise couplings x n)
    until the spatial size is <= 8, a final checkerboard block of n+1
    couplings, and Unsqueeze2d back to the original resolution.
"""
from __future__ import annotations

from ..bijectors.coupling import AffineCoupling
from ..bijectors.elementwise import Logit
from ..bijectors.norm import BatchNorm
from ..bijectors.squeeze import Squeeze2d, Unsqueeze2d
from ..core.bijector import Chain
from .base import FlowModel


def build_realnvp(dims, datatype=None, cfg=None) -> FlowModel:
    n_layers = cfg.layers
    bf = getattr(cfg, "base_filters", 32)
    layers = []
    if datatype == "image":
        h, w, c = dims
        layers.append(Logit(eps=0.01))
        mid = (h, w, c)
        while max(mid[0], mid[1]) > 8:
            for i in range(n_layers):
                layers.append(BatchNorm(mid[2], affine=False))
                layers.append(AffineCoupling(mid, masking="checkerboard",
                                             odd=i % 2 != 0, base_filters=bf))
            layers.append(Squeeze2d(odd=False))
            mid = (mid[0] // 2, mid[1] // 2, mid[2] * 4)
            for i in range(n_layers):
                layers.append(BatchNorm(mid[2], affine=False))
                layers.append(AffineCoupling(mid, masking="channelwise",
                                             odd=i % 2 != 0, base_filters=bf))
        for i in range(n_layers + 1):
            layers.append(BatchNorm(mid[2], affine=False))
            layers.append(AffineCoupling(mid, masking="checkerboard",
                                         odd=i % 2 != 0, base_filters=bf))
        while mid[0] != h or mid[1] != w:
            layers.append(Unsqueeze2d(odd=False))
            mid = (mid[0] * 2, mid[1] * 2, mid[2] // 4)
    else:
        for i in range(n_layers):
            layers.append(BatchNorm(dims[-1], affine=False))
            layers.append(AffineCoupling(dims, odd=i % 2 != 0, base_filters=bf))
    return FlowModel("realnvp", Chain(layers, remat=getattr(cfg, 'remat', False)), dims)
