"""Image-mode (multi-scale) model tests: RealNVP / Glow / Flow++ on small
NHWC images — round trip, logdet antisymmetry, one train step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from nf_tpu.config import Config, NetworkConfig
from nf_tpu.core import Ctx
from nf_tpu.models import build_model
from nf_tpu.train import Trainer

IMG_ZOO = {
    "realnvp": dict(layers=2, base_filters=8),
    "glow": dict(layers=2, base_filters=8),
    "flow++": dict(layers=1, base_filters=8, mixtures=2),
}
DIMS = (16, 16, 1)  # exercises one squeeze level (16 -> 8)


def cfg_for(name):
    cfg = Config()
    cfg.network = NetworkConfig(name=name, **IMG_ZOO[name])
    return cfg


def _data(rng, n=4):
    return jax.random.uniform(rng, (n,) + DIMS, minval=0.05, maxval=0.95)


@pytest.mark.parametrize("name", sorted(IMG_ZOO))
def test_image_roundtrip(name, rng):
    cfg = cfg_for(name)
    model = build_model(name, DIMS, datatype="image", cfg=cfg.network)
    var = model.init(rng)
    ctx = Ctx(train=False)
    x = _data(jax.random.fold_in(rng, 1))
    z, ld_f, _ = model.forward(var, x, ctx)
    assert z.shape == x.shape
    x2, ld_i, _ = model.inverse(var, z, ctx)
    atol = 1e-3 if name == "flow++" else 1e-4
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=atol)
    np.testing.assert_allclose(np.asarray(ld_f), -np.asarray(ld_i),
                               rtol=1e-4, atol=1e-2)


@pytest.mark.parametrize("name", sorted(IMG_ZOO))
def test_image_train_step(name, rng):
    cfg = cfg_for(name)
    model = build_model(name, DIMS, datatype="image", cfg=cfg.network)
    tr = Trainer(model, cfg.optimizer, seed=0)
    batch = np.asarray(_data(rng, 8))
    ts = tr.init_state(rng, batch)
    ts, loss1 = tr.train_step(ts, batch)
    ts, loss2 = tr.train_step(ts, batch)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))


def test_image_model_bits_per_dim_sane(rng):
    """Untrained flow on uniform noise: NLL should be finite and O(D)."""
    cfg = cfg_for("realnvp")
    model = build_model("realnvp", DIMS, datatype="image", cfg=cfg.network)
    tr = Trainer(model, cfg.optimizer, seed=0)
    batch = np.asarray(_data(rng, 8))
    ts = tr.init_state(rng, batch)
    logp = np.asarray(tr.log_prob(ts, batch))
    d = np.prod(DIMS)
    bpd = -logp / (d * np.log(2.0))
    assert np.isfinite(bpd).all()
    assert np.abs(bpd).max() < 100.0


@pytest.mark.parametrize("name", sorted(IMG_ZOO))
def test_image_roundtrip_3channel(name, rng):
    """3-channel multi-scale stacks (the cifar shape family): round trip +
    logdet antisymmetry at (8, 8, 3)."""
    dims3 = (8, 8, 3)
    cfg = cfg_for(name)
    model = build_model(name, dims3, datatype="image", cfg=cfg.network)
    var = model.init(rng)
    ctx = Ctx(train=False)
    x = jax.random.uniform(jax.random.fold_in(rng, 1), (4,) + dims3,
                           minval=0.05, maxval=0.95)
    z, ld_f, _ = model.forward(var, x, ctx)
    x2, ld_i, _ = model.inverse(var, z, ctx)
    atol = 1e-3 if name == "flow++" else 1e-4
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=atol)
    np.testing.assert_allclose(np.asarray(ld_f), -np.asarray(ld_i),
                               rtol=1e-4, atol=1e-2)


def test_flowpp_vardequant_3channel_train_step(rng):
    """The queue's north-star config in miniature: flow++ 3-channel image
    with variational dequantization, scan+remat — two train steps."""
    cfg = cfg_for("flow++")
    cfg.network.var_dequant = True
    cfg.network.scan = True
    cfg.network.remat = True
    cfg.network.layers = 2
    dims3 = (8, 8, 3)
    model = build_model("flow++", dims3, datatype="image", cfg=cfg.network)
    tr = Trainer(model, cfg.optimizer, seed=0)
    x = np.asarray(jax.random.uniform(rng, (8,) + dims3))
    x = np.round(x * 255.0) / 255.0
    ts = tr.init_state(rng, x)
    ts, loss1 = tr.train_step(ts, x)
    ts, loss2 = tr.train_step(ts, x)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
