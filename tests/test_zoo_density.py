"""Model-zoo density-mode consistency: forward/inverse round trip, exact
logdet vs autodiff, short training convergence on toys."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf_tpu.config import Config, NetworkConfig
from nf_tpu.core import Ctx
from nf_tpu.data import FlowDataLoader
from nf_tpu.models import available_models, build_model
from nf_tpu.train import Trainer

# models buildable so far in density mode, with small test configs
ZOO = {
    "planar": dict(layers=4),
    "realnvp": dict(layers=4, base_filters=16),
    "glow": dict(layers=4, base_filters=16),
    "maf": dict(layers=3, base_filters=16),
}


def cfg_for(name):
    cfg = Config()
    cfg.network = NetworkConfig(name=name, **ZOO[name])
    return cfg


def autodiff_logdet(fn, x):
    def single(xi):
        J = jax.jacfwd(fn)(xi).reshape(xi.size, xi.size)
        return jnp.linalg.slogdet(J)[1]
    return jax.vmap(single)(x)


@pytest.mark.parametrize("name", sorted(ZOO))
def test_forward_inverse_roundtrip(name, rng):
    cfg = cfg_for(name)
    model = build_model(name, (2,), datatype="2d", cfg=cfg.network)
    var = model.init(rng)
    ctx = Ctx(train=False)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (16, 2)) * 0.5
    z, ld_f, _ = model.forward(var, x, ctx)
    x2, ld_i, _ = model.inverse(var, z, ctx)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(ld_f), -np.asarray(ld_i), atol=2e-4)


@pytest.mark.parametrize("name", sorted(ZOO))
def test_logdet_matches_autodiff(name, rng):
    cfg = cfg_for(name)
    model = build_model(name, (2,), datatype="2d", cfg=cfg.network)
    var = model.init(rng)
    ctx = Ctx(train=False)
    x = jax.random.normal(jax.random.fold_in(rng, 2), (6, 2)) * 0.5
    _, ld, _ = model.forward(var, x, ctx)
    ld_exact = autodiff_logdet(
        lambda v: model.forward(var, v[None], ctx)[0][0], x)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ld_exact),
                               atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("name", sorted(ZOO))
def test_short_training_reduces_nll(name, rng):
    cfg = cfg_for(name)
    cfg.optimizer.lr = 1e-3
    model = build_model(name, (2,), datatype="2d", cfg=cfg.network)
    tr = Trainer(model, cfg.optimizer, seed=0)
    dl = FlowDataLoader("circles", batch_size=256, total_steps=120, seed=0)
    ts = tr.init_state(rng, dl.next_batch())
    losses = []
    for b in dl:
        ts, loss = tr.train_step(ts, b)
        losses.append(float(loss))
    assert np.isfinite(losses).all(), name
    assert np.mean(losses[-15:]) < np.mean(losses[:5]), (
        name, np.mean(losses[:5]), np.mean(losses[-15:]))


def test_maf_permutation_roundtrip(rng):
    """Dedicated D>2 check for the sequential MAF inverse."""
    cfg = cfg_for("maf")
    model = build_model("maf", (5,), datatype="2d", cfg=cfg.network)
    var = model.init(rng)
    ctx = Ctx(train=False)
    x = jax.random.normal(jax.random.fold_in(rng, 3), (8, 5)) * 0.5
    z, ld_f, _ = model.forward(var, x, ctx)
    x2, ld_i, _ = model.inverse(var, z, ctx)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_f), -np.asarray(ld_i), atol=1e-4)


def test_conv1x1_image_roundtrip(rng):
    from nf_tpu.bijectors.conv1x1 import InvertibleConv1x1

    bij = InvertibleConv1x1(8)
    var = bij.init(rng)
    ctx = Ctx(train=False)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (2, 4, 4, 8))
    y, ld_f, _ = bij.forward(var, x, ctx)
    x2, ld_i, _ = bij.inverse(var, y, ctx)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    # logdet scales with pixel count
    assert abs(float(ld_f[0]) / 16.0 + float(ld_i[0]) / 16.0) < 1e-5
