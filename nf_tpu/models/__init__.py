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


def build_model(name: str, dims, datatype=None, cfg=None) -> FlowModel:
    if name not in _REGISTRY:
        raise ValueError(f"unknown network {name!r}; available: {available_models()}")
    return _REGISTRY[name](dims, datatype=datatype, cfg=cfg)
