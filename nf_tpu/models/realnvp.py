"""RealNVP model builder.

Behavior parity: /root/reference/flows/realnvp.py:9-63 —
  * density mode: n x [BatchNorm(affine=False) -> AffineCoupling(alt odd)];
  * image mode: Logit(0.01) input transform, then the multi-scale loop
    (checkerboard couplings x n -> Squeeze2d -> channelwise couplings x n)
    until the spatial size is <= 8, a final checkerboard block of n+1
    couplings, and Unsqueeze2d back to the original resolution.

With ``cfg.scan`` the repeated [norm, coupling(even), norm, coupling(odd)]
pattern is folded into a ``lax.scan`` over stacked block parameters
(per multi-scale stage in image mode, where shapes are homogeneous):
compile time becomes O(1) in depth instead of O(layers).
"""
from __future__ import annotations

from ..bijectors.coupling import AffineCoupling
from ..bijectors.elementwise import Logit
from ..bijectors.norm import BatchNorm
from ..bijectors.squeeze import Squeeze2d, Unsqueeze2d
from ..core.bijector import Chain, scan_repeated
from .base import FlowModel

# the structure repeats every two (norm, coupling) steps because the
# coupling parity alternates — see core.bijector.scan_repeated
_PERIOD = 4


def build_realnvp(dims, datatype=None, cfg=None) -> FlowModel:
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
                BatchNorm(mid[2], affine=False),
                AffineCoupling(mid, masking="checkerboard",
                               odd=i % 2 != 0, base_filters=bf,
                               compute_dtype=cd))])
            layers.append(Squeeze2d(odd=False))
            mid = (mid[0] // 2, mid[1] // 2, mid[2] * 4)
            emit([l for i in range(n_layers) for l in (
                BatchNorm(mid[2], affine=False),
                AffineCoupling(mid, masking="channelwise",
                               odd=i % 2 != 0, base_filters=bf,
                               compute_dtype=cd))])
        emit([l for i in range(n_layers + 1) for l in (
            BatchNorm(mid[2], affine=False),
            AffineCoupling(mid, masking="checkerboard",
                           odd=i % 2 != 0, base_filters=bf,
                               compute_dtype=cd))])
        while mid[0] != h or mid[1] != w:
            layers.append(Unsqueeze2d(odd=False))
            mid = (mid[0] * 2, mid[1] * 2, mid[2] // 4)
    else:
        emit([l for i in range(n_layers) for l in (
            BatchNorm(dims[-1], affine=False),
            AffineCoupling(dims, odd=i % 2 != 0, base_filters=bf,
                               compute_dtype=cd))])
    if scan and len(layers) == 1:
        return FlowModel("realnvp", layers[0], dims)
    return FlowModel("realnvp", Chain(layers, remat=remat and not scan), dims)
