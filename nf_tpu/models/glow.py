"""Glow model builder.

Behavior parity: /root/reference/flows/glow.py:10-68 —
  * density: n x [ActNorm -> InvertibleConv1x1 -> AffineCoupling(alt odd)];
  * image: Logit(0.01) then the same multi-scale skeleton as RealNVP with
    ActNorm + 1x1 conv before every coupling.

With ``cfg.scan`` each homogeneous stage folds into a ``lax.scan`` over
stacked block parameters (see core.bijector.ScannedChain): O(1) compile
time in depth.
"""
from __future__ import annotations

from ..bijectors.conv1x1 import InvertibleConv1x1
from ..bijectors.coupling import AffineCoupling
from ..bijectors.elementwise import Logit
from ..bijectors.norm import ActNorm
from ..bijectors.squeeze import Squeeze2d, Unsqueeze2d
from ..core.bijector import Chain, scan_repeated
from .base import FlowModel

# structure repeats every two [ActNorm, InvConv1x1, Coupling] steps
# because the coupling parity alternates
_PERIOD = 6


def build_glow(dims, datatype=None, cfg=None) -> FlowModel:
    n_layers = cfg.layers
    bf = getattr(cfg, "base_filters", 32)
    cd = getattr(cfg, "compute_dtype", "float32")
    cd = None if cd in (None, "float32") else cd
    remat = getattr(cfg, "remat", False)
    scan = getattr(cfg, "scan", False)
    layers = []

    def emit(stage):
        if scan:
            layers.append(scan_repeated(stage, _PERIOD, remat=remat))
        else:
            layers.extend(stage)

    if datatype == "image":
        h, w, c = dims
        layers.append(Logit(eps=0.01, compress=True))
        mid = (h, w, c)
        while max(mid[0], mid[1]) > 8:
            emit([l for i in range(n_layers) for l in (
                ActNorm(mid[2]),
                InvertibleConv1x1(mid[2]),
                AffineCoupling(mid, masking="checkerboard",
                               odd=i % 2 != 0, base_filters=bf,
                               compute_dtype=cd))])
            layers.append(Squeeze2d(odd=False))
            mid = (mid[0] // 2, mid[1] // 2, mid[2] * 4)
            emit([l for i in range(n_layers) for l in (
                ActNorm(mid[2]),
                InvertibleConv1x1(mid[2]),
                AffineCoupling(mid, masking="channelwise",
                               odd=i % 2 != 0, base_filters=bf,
                               compute_dtype=cd))])
        emit([l for i in range(n_layers + 1) for l in (
            ActNorm(mid[2]),
            InvertibleConv1x1(mid[2]),
            AffineCoupling(mid, masking="checkerboard",
                           odd=i % 2 != 0, base_filters=bf,
                               compute_dtype=cd))])
        while mid[0] != h or mid[1] != w:
            layers.append(Unsqueeze2d(odd=False))
            mid = (mid[0] * 2, mid[1] * 2, mid[2] // 4)
    else:
        emit([l for i in range(n_layers) for l in (
            ActNorm(dims[-1]),
            InvertibleConv1x1(dims[-1]),
            AffineCoupling(dims, odd=i % 2 != 0, base_filters=bf,
                               compute_dtype=cd))])
    if scan and len(layers) == 1:
        return FlowModel("glow", layers[0], dims)
    return FlowModel("glow", Chain(layers, remat=remat and not scan), dims)
