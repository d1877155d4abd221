"""Model zoo registry.

Parity: the ``networks`` dict at /root/reference/main.py:19-27. Builders are
registered lazily as model families land; ``build_model`` is the single
construction entry point.
"""
from __future__ import annotations

from .base import FlowModel  # noqa: F401
from .ffjord import build_ffjord
from .flowpp import build_flowpp
from .glow import build_glow
from .maf import build_maf
from .planar import build_planar
from .realnvp import build_realnvp
from .resflow import build_resflow

_REGISTRY = {
    "planar": build_planar,
    "realnvp": build_realnvp,
    "glow": build_glow,
    "flow++": build_flowpp,
    "maf": build_maf,
    "resflow": build_resflow,
    "ffjord": build_ffjord,
}


def register(name, builder):
    _REGISTRY[name] = builder


def available_models():
    return sorted(_REGISTRY)


def _apply_matmul_precision(cfg, datatype):
    """Set XLA's default matmul/conv precision for this process.

    On TPU the XLA default runs f32 convs as multi-pass MXU products; the
    image-tier train step is 2.4x faster with single-pass bf16 inputs
    (IMG_MFU_PROBE.json A/B, identical loss trajectory to f32 at the
    probe's resolution).  Policy: ``cfg.matmul_precision`` if set
    ("bfloat16" | "float32" | "highest"); otherwise AUTO = "bfloat16"
    for image stacks on TPU, untouched elsewhere (CPU tests and the 2D
    zoo keep XLA defaults; the committed 2D parity numbers are f32).
    Flow/logdet math is unaffected — this selects the MXU pass count,
    not tensor dtypes.
    """
    import jax

    p = getattr(cfg, "matmul_precision", None) if cfg is not None else None
    if p is None:
        if datatype == "image" and jax.devices()[0].platform == "tpu":
            p = "bfloat16"
        else:
            return None
    jax.config.update("jax_default_matmul_precision", p)
    return p


def build_model(name: str, dims, datatype=None, cfg=None) -> FlowModel:
    if name not in _REGISTRY:
        raise ValueError(f"unknown network {name!r}; available: {available_models()}")
    _apply_matmul_precision(cfg, datatype)
    return _REGISTRY[name](dims, datatype=datatype, cfg=cfg)
