"""MAF model builder.

Behavior parity: /root/reference/flows/maf.py:122-148 — n x
[BatchNorm(affine=False) -> AutoregressiveTransform]; image data is
unsupported in the reference (maf.py:131-132) and raises here too unless
``cfg.allow_image`` opts in.

Beyond-parity (cfg.allow_image): image mode runs the autoregressive stack
over the flattened pixel vector — Logit(0.01) -> Flatten -> n x [BatchNorm
-> AutoregressiveTransform(D=H*W*C)] -> Unflatten (so the latent keeps the
image shape for the base-measure sampler).  Sampling costs D sequential
MADE passes, inherent to MAF's inverse (reference flows/maf.py:109-119).
"""
from __future__ import annotations

from ..bijectors.elementwise import Logit
from ..bijectors.made import AutoregressiveTransform
from ..bijectors.norm import BatchNorm
from ..bijectors.squeeze import Flatten
from ..core.bijector import Chain, Inverted, scan_repeated
from .base import FlowModel


def build_maf(dims, datatype=None, cfg=None) -> FlowModel:
    remat = getattr(cfg, "remat", False)
    scan = getattr(cfg, "scan", False)
    if datatype == "image":
        if not getattr(cfg, "allow_image", False):
            raise NotImplementedError(
                "MAF for image data is not supported by the reference "
                "(flows/maf.py:131-132); opt in to the flattened-pixel "
                "variant with network.allow_image=true")
        d = dims[0] * dims[1] * dims[2]
        stage = []
        for _ in range(cfg.layers):
            stage.append(BatchNorm(d, affine=False))
            stage.append(AutoregressiveTransform(
                d, base_filters=cfg.base_filters))
        if scan:
            stage = [scan_repeated(stage, 2, remat=remat)]
        layers = ([Logit(eps=0.01, compress=True), Flatten(dims)] + stage
                  + [Inverted(Flatten(dims))])
        return FlowModel("maf", Chain(layers, remat=remat and not scan), dims)
    layers = []
    for _ in range(cfg.layers):
        layers.append(BatchNorm(dims[-1], affine=False))
        layers.append(AutoregressiveTransform(
            dims[-1], base_filters=cfg.base_filters,
            resample_masks=getattr(cfg, "resample_masks", False)))
    if scan:
        return FlowModel("maf", scan_repeated(layers, 2, remat=remat), dims)
    return FlowModel("maf", Chain(layers, remat=remat), dims)
