"""Golden-value NLL regression: fixed seeds, fixed data, pinned values.

Catches silent math changes in any bijector/model.  Goldens were produced
by this same code on the CPU backend (see _compute below); regenerate with:
    python -m pytest tests/test_golden_nll.py --regen-goldens
"""
import json
import os

import jax
import numpy as np
import pytest

from nf_tpu.config import Config, NetworkConfig
from nf_tpu.core import Ctx
from nf_tpu.models import build_model
from nf_tpu.ops.math import standard_normal_logprob

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens.json")

CONFIGS = {
    "planar": dict(layers=4),
    "realnvp": dict(layers=4, base_filters=16),
    "glow": dict(layers=4, base_filters=16),
    "flow++": dict(layers=2, base_filters=8, mixtures=4),
    "maf": dict(layers=3, base_filters=16),
    "resflow": dict(layers=2, base_filters=16, logdet="exact",
                    spnorm_coeff=0.9),
    "ffjord": dict(layers=1, base_filters=16, stepsize=0.25,
                   solver="dopri5", backprop="adjoint", trace="exact"),
}


def _compute(name):
    cfg = Config()
    cfg.network = NetworkConfig(name=name, **CONFIGS[name])
    model = build_model(name, (2,), datatype="2d", cfg=cfg.network)
    key = jax.random.PRNGKey(1234)
    var = model.init(key)
    x = jax.random.normal(jax.random.fold_in(key, 1), (32, 2)) * 0.5
    z, ld, _ = model.forward(var, x, Ctx(rng=None, train=False))
    nll = -float(np.mean(np.asarray(standard_normal_logprob(z) + ld)))
    return nll


def pytest_addoption_unused():  # documented hook name; see conftest note
    pass


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_golden_nll(name):
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("goldens.json missing; run scripts/regen_goldens.py")
    with open(GOLDEN_PATH) as f:
        goldens = json.load(f)
    if name not in goldens:
        pytest.skip(f"no golden for {name}")
    got = _compute(name)
    assert abs(got - goldens[name]) < 1e-3, (name, got, goldens[name])
