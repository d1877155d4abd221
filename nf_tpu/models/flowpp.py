"""Flow++ model builder.

Behavior parity: /root/reference/flows/flowpp.py:9-78 —
  * density: n x [ActNorm -> MixLogAttnCoupling];
  * image: Logit(0.01), multi-scale loop with ActNorm + InvertibleConv1x1 +
    MixLogAttnCoupling per step (checkerboard / channelwise as RealNVP/Glow).

Beyond-parity (cfg.var_dequant, image mode): the Flow++ paper's
variational dequantization replaces the fixed Logit-only input handling —
a conditional flow q(u|x) over the dequantization noise trained by the
ELBO (bijectors/vardequant.py).  The reference has only the Logit(0.01)
transform (flows/flowpp.py:22).
"""
from __future__ import annotations

from ..bijectors.conv1x1 import InvertibleConv1x1
from ..bijectors.elementwise import Logit
from ..bijectors.flowpp_coupling import MixLogAttnCoupling
from ..bijectors.norm import ActNorm
from ..bijectors.squeeze import Squeeze2d, Unsqueeze2d
from ..bijectors.vardequant import VariationalDequant
from ..core.bijector import Chain, scan_repeated
from .base import FlowModel


def build_flowpp(dims, datatype=None, cfg=None) -> FlowModel:
    n_layers = cfg.layers
    bf = getattr(cfg, "base_filters", 32)
    K = cfg.mixtures
    remat = getattr(cfg, "remat", False)
    scan = getattr(cfg, "scan", False)
    layers = []

    def emit(stage, period):
        if scan:
            layers.append(scan_repeated(stage, period, remat=remat))
        else:
            layers.extend(stage)

    if datatype == "image":
        h, w, c = dims
        if getattr(cfg, "var_dequant", False):
            layers.append(VariationalDequant((h, w, c), base_filters=bf))
        layers.append(Logit(eps=0.01, compress=True))
        mid = (h, w, c)
        while max(mid[0], mid[1]) > 8:
            emit([l for i in range(n_layers) for l in (
                ActNorm(mid[2]),
                InvertibleConv1x1(mid[2]),
                MixLogAttnCoupling(mid, masking="checkerboard",
                                   odd=i % 2 != 0, base_filters=bf,
                                   n_mixtures=K))], 6)
            layers.append(Squeeze2d(odd=False))
            mid = (mid[0] // 2, mid[1] // 2, mid[2] * 4)
            emit([l for i in range(n_layers) for l in (
                ActNorm(mid[2]),
                InvertibleConv1x1(mid[2]),
                MixLogAttnCoupling(mid, masking="channelwise",
                                   odd=i % 2 != 0, base_filters=bf,
                                   n_mixtures=K))], 6)
        emit([l for i in range(n_layers + 1) for l in (
            ActNorm(mid[2]),
            InvertibleConv1x1(mid[2]),
            MixLogAttnCoupling(mid, masking="checkerboard",
                               odd=i % 2 != 0, base_filters=bf,
                               n_mixtures=K))], 6)
        while mid[0] != h or mid[1] != w:
            layers.append(Unsqueeze2d(odd=False))
            mid = (mid[0] * 2, mid[1] * 2, mid[2] // 4)
    else:
        emit([l for i in range(n_layers) for l in (
            ActNorm(dims[-1]),
            MixLogAttnCoupling(dims, odd=i % 2 != 0, base_filters=bf,
                               n_mixtures=K))], 4)
    if scan and len(layers) == 1:
        return FlowModel("flow++", layers[0], dims)
    return FlowModel("flow++", Chain(layers, remat=remat and not scan), dims)
