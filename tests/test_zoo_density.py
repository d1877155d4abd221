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

# full zoo in density mode, with small test configs.
# (roundtrip_atol, logdet via exact estimators where stochastic ones exist)
ZOO = {
    "planar": dict(layers=4),
    "realnvp": dict(layers=4, base_filters=16),
    "glow": dict(layers=4, base_filters=16),
    "flow++": dict(layers=2, base_filters=8, mixtures=4),
    "maf": dict(layers=3, base_filters=16),
    "resflow": dict(layers=2, base_filters=16, logdet="exact", spnorm_coeff=0.9),
    "ffjord": dict(layers=1, base_filters=16, t0=0.0, t1=1.0, stepsize=0.25,
                   solver="dopri5", backprop="adjoint", trace="exact"),
}

# ffjord: two dopri5 solves at the reference's loose rtol=atol=1e-2
# (flows/odeint.py:140) bound the roundtrip at the few-percent level
ROUNDTRIP_ATOL = {"flow++": 1e-3, "resflow": 1e-3, "ffjord": 6e-2}
LOGDET_ATOL = {"ffjord": 2e-2}


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
    atol = ROUNDTRIP_ATOL.get(name, 2e-4)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=atol)
    np.testing.assert_allclose(np.asarray(ld_f), -np.asarray(ld_i), atol=max(atol, 2e-3))


@pytest.mark.parametrize("name", sorted(ZOO))
def test_logdet_matches_autodiff(name, rng):
    cfg = cfg_for(name)
    if name == "ffjord":
        # jacfwd cannot cross the adjoint custom_vjp; the adjoint-vs-normal
        # gradient equivalence is covered in test_odeint.py
        cfg.network.backprop = "normal"
    model = build_model(name, (2,), datatype="2d", cfg=cfg.network)
    var = model.init(rng)
    ctx = Ctx(train=False)
    x = jax.random.normal(jax.random.fold_in(rng, 2), (6, 2)) * 0.5
    _, ld, _ = model.forward(var, x, ctx)
    ld_exact = autodiff_logdet(
        lambda v: model.forward(var, v[None], ctx)[0][0], x)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ld_exact),
                               atol=LOGDET_ATOL.get(name, 2e-3), rtol=1e-3)


@pytest.mark.parametrize("name", sorted(ZOO))
def test_short_training_reduces_nll(name, rng):
    cfg = cfg_for(name)
    cfg.optimizer.lr = 1e-3
    # resflow's 1-probe Russian-roulette logdet makes the training signal
    # noisy; give it more steps and average over longer windows
    steps = 400 if name == "resflow" else 120
    head, tail = (20, 50) if name == "resflow" else (5, 15)
    model = build_model(name, (2,), datatype="2d", cfg=cfg.network)
    tr = Trainer(model, cfg.optimizer, seed=0)
    dl = FlowDataLoader("circles", batch_size=256, total_steps=steps, seed=0)
    ts = tr.init_state(rng, dl.next_batch())
    losses = []
    for b in dl:
        ts, loss = tr.train_step(ts, b)
        losses.append(float(loss))
    assert np.isfinite(losses).all(), name
    assert np.mean(losses[-tail:]) < np.mean(losses[:head]), (
        name, np.mean(losses[:head]), np.mean(losses[-tail:]))


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


def test_made_resample_masks_mode(rng):
    """Behavioral-parity flag: per-forward mask redraw stays autoregressive."""
    from nf_tpu.bijectors.made import MADE

    made = MADE(4, num_hidden=2, base_filters=8, resample_masks=True)
    var = made.init(rng)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (8, 4))
    y1, _ = made.apply(var, x, Ctx(rng=jax.random.PRNGKey(1), train=False))
    y2, _ = made.apply(var, x, Ctx(rng=jax.random.PRNGKey(2), train=False))
    y1b, _ = made.apply(var, x, Ctx(rng=jax.random.PRNGKey(1), train=False))
    assert not np.allclose(np.asarray(y1), np.asarray(y2))  # masks differ
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y1b))  # det per key
    # autoregressive: output 0 never depends on any input
    J = jax.jacfwd(lambda v: made.apply(
        var, v[None], Ctx(rng=jax.random.PRNGKey(3)))[0][0])(x[0])
    np.testing.assert_allclose(np.asarray(J[0]), 0.0, atol=1e-7)
