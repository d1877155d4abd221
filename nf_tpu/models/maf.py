"""MAF model builder.

Behavior parity: /root/reference/flows/maf.py:122-148 — n x
[BatchNorm(affine=False) -> AutoregressiveTransform]; image data is
unsupported in the reference (maf.py:131-132) and raises here explicitly.
"""
from __future__ import annotations

from ..bijectors.made import AutoregressiveTransform
from ..bijectors.norm import BatchNorm
from ..core.bijector import Chain, scan_repeated
from .base import FlowModel


def build_maf(dims, datatype=None, cfg=None) -> FlowModel:
    if datatype == "image":
        raise NotImplementedError("MAF for image data is not supported "
                                  "(parity: reference flows/maf.py:131-132)")
    layers = []
    for _ in range(cfg.layers):
        layers.append(BatchNorm(dims[-1], affine=False))
        layers.append(AutoregressiveTransform(dims[-1],
                                              base_filters=cfg.base_filters))
    remat = getattr(cfg, "remat", False)
    if getattr(cfg, "scan", False):
        return FlowModel("maf", scan_repeated(layers, 2, remat=remat), dims)
    return FlowModel("maf", Chain(layers, remat=remat), dims)
