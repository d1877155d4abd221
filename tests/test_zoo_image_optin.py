"""Opt-in image variants of MAF / ResFlow / FFJORD (cfg.allow_image).

The reference raises NotImplementedError for these (flows/maf.py:131-132,
flows/resflow.py:17-19, flows/ffjord.py:24-26); nf_tpu wires the classes it
ships but never uses (conv residual block iresblock.py:281-301, conv ODENet
cnf.py:55-65) behind an explicit flag.  Tests: the flag gate, round trip,
logdet antisymmetry, one train step on tiny shapes.
"""
import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from nf_tpu.config import Config, NetworkConfig
from nf_tpu.core import Ctx
from nf_tpu.models import build_model
from nf_tpu.train import Trainer

OPTIN_ZOO = {
    "maf": (dict(layers=2, base_filters=8, allow_image=True), (8, 8, 1)),
    "resflow": (dict(layers=2, base_filters=8, spnorm_coeff=0.9,
                     logdet="exact", allow_image=True), (8, 8, 1)),
    "ffjord": (dict(layers=1, base_filters=8, t0=0.0, t1=1.0, stepsize=0.25,
                    solver="dopri5", backprop="adjoint", trace="hutchinson",
                    allow_image=True), (8, 8, 1)),
}
# ffjord round trip = two adaptive dopri5 solves at default tolerances;
# resflow inverse = fixed-point iteration to ftol=1e-4
ROUNDTRIP_ATOL = {"ffjord": 6e-2, "resflow": 1e-3}
LOGDET_ATOL = {"ffjord": 2e-2, "resflow": 2e-3}


def cfg_for(name):
    cfg = Config()
    overrides, dims = OPTIN_ZOO[name]
    cfg.network = NetworkConfig(name=name, **overrides)
    return cfg, dims


@pytest.mark.parametrize("name", sorted(OPTIN_ZOO))
def test_image_raises_without_flag(name):
    cfg, dims = cfg_for(name)
    cfg.network.allow_image = False
    with pytest.raises(NotImplementedError):
        build_model(name, dims, datatype="image", cfg=cfg.network)


@pytest.mark.parametrize("name", sorted(OPTIN_ZOO))
def test_optin_image_roundtrip(name, rng):
    cfg, dims = cfg_for(name)
    model = build_model(name, dims, datatype="image", cfg=cfg.network)
    var = model.init(rng)
    ctx = Ctx(rng=jax.random.fold_in(rng, 7), train=False)
    x = jax.random.uniform(jax.random.fold_in(rng, 1), (4,) + dims,
                           minval=0.05, maxval=0.95)
    z, ld_f, _ = model.forward(var, x, ctx)
    assert z.shape == x.shape
    x2, ld_i, _ = model.inverse(var, z, ctx)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x),
                               atol=ROUNDTRIP_ATOL.get(name, 1e-4))
    np.testing.assert_allclose(np.asarray(ld_f), -np.asarray(ld_i),
                               atol=LOGDET_ATOL.get(name, 1e-3))


@pytest.mark.parametrize("name", sorted(OPTIN_ZOO))
def test_optin_image_train_step(name, rng):
    cfg, dims = cfg_for(name)
    model = build_model(name, dims, datatype="image", cfg=cfg.network)
    tr = Trainer(model, cfg.optimizer, seed=0)
    batch = np.asarray(jax.random.uniform(rng, (8,) + dims,
                                          minval=0.05, maxval=0.95))
    ts = tr.init_state(rng, batch)
    ts, loss1 = tr.train_step(ts, batch)
    ts, loss2 = tr.train_step(ts, batch)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
