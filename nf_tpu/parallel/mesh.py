"""Device mesh construction.

The reference is single-device (/root/reference/main.py:40-43 — no
torch.distributed anywhere); this framework is mesh-first (SURVEY.md §2.4):
one global mesh with a 'data' axis for batch/data parallelism and a 'model'
axis for sharding wide conditioner layers (tensor parallelism).
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(devices: Optional[Sequence] = None, model_axis: int = 1) -> Mesh:
    """Build a ('data', 'model') mesh over the given (or all) devices.

    ``model_axis`` devices are assigned to the model axis (1 = pure data
    parallelism); the rest form the data axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_axis != 0:
        raise ValueError(f"{n} devices not divisible by model_axis={model_axis}")
    arr = np.array(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))
