"""Variational dequantization head (Flow++ image mode, cfg.var_dequant).

Beyond-parity feature (the reference has only Logit(0.01) —
flows/flowpp.py:22).  Tests: the ELBO wiring trains, q(u|x) is a
normalized density over the noise cube (its logdet contribution is a
proper ELBO term, so the model's "log_prob" must LOWER-bound what the
same flow assigns with exact uniform dequantization... checked here via
sanity properties: finite losses that improve, u in [0,1), and the
dequantized y staying inside the quantization bin of x).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf_tpu.bijectors.vardequant import VariationalDequant
from nf_tpu.config import Config, NetworkConfig
from nf_tpu.core import Ctx
from nf_tpu.models import build_model
from nf_tpu.train import Trainer

DIMS = (8, 8, 1)


def _images(rng, n=8):
    # quantized 8-bit-style pixels in [0, 1)
    x = jax.random.randint(rng, (n,) + DIMS, 0, 256)
    return np.asarray(x, np.float32) / 256.0


def test_vardequant_stays_in_bin(rng):
    vd = VariationalDequant(DIMS, base_filters=8)
    var = vd.init(rng)
    x = jnp.asarray(_images(jax.random.fold_in(rng, 1)))
    y, ld, _ = vd.forward(var, x, Ctx(rng=jax.random.fold_in(rng, 2),
                                      train=True))
    # y must land inside x's quantization bin: y in [x, x + 1/256)
    assert float(jnp.min(y - x)) >= 0.0
    assert float(jnp.max(y - x)) < 1.0 / 256.0 + 1e-6
    assert np.isfinite(np.asarray(ld)).all()


def test_vardequant_elbo_penalty_included(rng):
    """ld must include the -D log 256 discretization constant and the
    -log q(u|x) entropy term: at init (near-unit sigma) it should sit
    within a few nats/dim of -D log 256, not at 0."""
    vd = VariationalDequant(DIMS, base_filters=8)
    var = vd.init(rng)
    x = jnp.asarray(_images(jax.random.fold_in(rng, 1)))
    _, ld, _ = vd.forward(var, x, Ctx(rng=jax.random.fold_in(rng, 2),
                                      train=True))
    d = int(np.prod(DIMS))
    base = -d * np.log(256.0)
    assert abs(float(jnp.mean(ld)) - base) < 3.0 * d, (float(jnp.mean(ld)), base)


@pytest.mark.slow
def test_flowpp_vardequant_trains(rng):
    cfg = Config()
    cfg.network = NetworkConfig(name="flow++", layers=1, base_filters=8,
                                mixtures=2, var_dequant=True)
    model = build_model("flow++", DIMS, datatype="image", cfg=cfg.network)
    tr = Trainer(model, cfg.optimizer, seed=0)
    batch = _images(rng)
    ts = tr.init_state(rng, batch)
    losses = []
    for _ in range(3):
        ts, loss = tr.train_step(ts, batch)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    # sampling still works (vardequant inverse is pass-through)
    y, logp = tr.sample(ts, jax.random.fold_in(rng, 3), 4)
    assert y.shape == (4,) + DIMS
    assert np.isfinite(np.asarray(logp)).all()


def test_vardequant_requires_rng(rng):
    """Eval without an rng must fail loudly, not silently reuse one fixed
    dequantization sample (round-2 review finding)."""
    vd = VariationalDequant(DIMS, base_filters=8)
    var = vd.init(rng)
    x = jnp.asarray(_images(jax.random.fold_in(rng, 1)))
    with pytest.raises(ValueError, match="requires ctx.rng"):
        vd.forward(var, x, Ctx(rng=None, train=False))


@pytest.mark.slow
def test_trainer_log_prob_threads_eval_rng(rng):
    """Trainer.log_prob(rng=...) is the supported eval path for stochastic
    (vardequant) models: fresh keys give different single-sample ELBOs,
    the same key reproduces."""
    cfg = Config()
    cfg.network = NetworkConfig(name="flow++", layers=1, base_filters=8,
                                mixtures=2, var_dequant=True)
    model = build_model("flow++", DIMS, datatype="image", cfg=cfg.network)
    tr = Trainer(model, cfg.optimizer, seed=0)
    batch = _images(rng)
    ts = tr.init_state(rng, batch)
    k1, k2 = jax.random.split(jax.random.fold_in(rng, 7))
    lp1 = np.asarray(tr.log_prob(ts, batch, rng=k1))
    lp1b = np.asarray(tr.log_prob(ts, batch, rng=k1))
    lp2 = np.asarray(tr.log_prob(ts, batch, rng=k2))
    assert np.isfinite(lp1).all() and np.isfinite(lp2).all()
    np.testing.assert_array_equal(lp1, lp1b)
    assert np.abs(lp1 - lp2).max() > 0.0  # different noise -> different ELBO


def test_vardequant_elbo_matches_manual_accounting(rng):
    """The head's forward logdet must equal -log q(u|x) - D log 256 so
    that -log_prob is the discrete single-sample ELBO directly — the
    accounting scripts/eval_image_nll.py's vardequant mode relies on
    (no external -D log 256 correction)."""
    import numpy as np
    from nf_tpu.bijectors.vardequant import VariationalDequant
    from nf_tpu.core.bijector import Ctx

    dims = (4, 4, 1)
    vd = VariationalDequant(dims, base_filters=8)
    var = vd.init(rng)
    x = np.round(np.random.default_rng(0).random((8,) + dims) * 255) / 255
    x = x.astype(np.float32)
    ctx = Ctx(rng=jax.random.fold_in(rng, 1), train=False)
    y, ld, _ = vd.forward(var, x, ctx)
    d = int(np.prod(dims))
    # y is the dequantized pixel in the raw pixel's 1/256 bin
    lo = np.floor(np.asarray(x) * 256.0) / 256.0
    assert (np.asarray(y) >= lo - 1e-6).all()
    assert (np.asarray(y) <= lo + 1.0 / 256.0 + 1e-6).all()
    # ld + D log 256 = -log q(u|x); re-derive -log q via the internal flow
    # on the same eps draw and compare
    eps = jax.random.normal(ctx.rng, x.shape, jnp.float32)
    u, logq, _ = vd._flow(var, jnp.asarray(x), eps, ctx)
    np.testing.assert_allclose(np.asarray(ld),
                               np.asarray(-logq) - d * np.log(256.0),
                               rtol=1e-5, atol=1e-3)
