"""ScannedChain: lax.scan composition must be numerically identical to the
unrolled Chain — outputs, logdets, states, data-dependent init, and
gradients — and the cfg.scan builder path must preserve the invertibility
contract across the zoo."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf_tpu.bijectors.conv1x1 import InvertibleConv1x1
from nf_tpu.bijectors.coupling import AffineCoupling
from nf_tpu.bijectors.norm import ActNorm, BatchNorm
from nf_tpu.config import Config, NetworkConfig
from nf_tpu.core import Ctx
from nf_tpu.core.bijector import Chain, ScannedChain, scan_repeated
from nf_tpu.models import build_model


def glow_layers(n_steps, dim=2, bf=8):
    out = []
    for i in range(n_steps):
        out += [ActNorm(dim), InvertibleConv1x1(dim),
                AffineCoupling((dim,), odd=i % 2 != 0, base_filters=bf)]
    return out


def restack(chain_var, period):
    """Map unrolled Chain variables into the scan_repeated layout."""
    n = len(chain_var["params"])
    nb = n // period
    blocks = [{"params": list(chain_var["params"][i * period:(i + 1) * period]),
               "state": list(chain_var["state"][i * period:(i + 1) * period])}
              for i in range(nb)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    tail_p = list(chain_var["params"][nb * period:])
    tail_s = list(chain_var["state"][nb * period:])
    if tail_p:
        return {"params": [stacked["params"]] + tail_p,
                "state": [stacked["state"]] + tail_s}
    return stacked


def scanned_equiv(layers, period, rng, x, train=False, remat=False):
    chain = Chain(layers)
    scanned = scan_repeated(layers, period, remat=remat)
    var_c = chain.init(rng)
    var_s = restack(var_c, period)
    ctx = Ctx(rng=None, train=train)
    y_c, ld_c, st_c = chain.forward(var_c, x, ctx)
    y_s, ld_s, _ = scanned.forward(var_s, x, ctx)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_c),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld_s), np.asarray(ld_c),
                               rtol=1e-6, atol=1e-6)
    xi_c, ldi_c, _ = chain.inverse(var_c, y_c, ctx)
    xi_s, ldi_s, _ = scanned.inverse(var_s, y_c, ctx)
    np.testing.assert_allclose(np.asarray(xi_s), np.asarray(xi_c),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ldi_s), np.asarray(ldi_c),
                               rtol=1e-6, atol=1e-6)
    return chain, scanned, var_c, var_s


@pytest.mark.parametrize("n_steps", [4, 5])  # 5 exercises the plain tail
def test_forward_inverse_match_chain(n_steps, rng):
    x = jax.random.normal(jax.random.fold_in(rng, 7), (16, 2))
    scanned_equiv(glow_layers(n_steps), 6, rng, x)


def test_remat_matches_chain(rng):
    x = jax.random.normal(jax.random.fold_in(rng, 7), (16, 2))
    scanned_equiv(glow_layers(4), 6, rng, x, remat=True)


def test_batchnorm_train_states_match(rng):
    layers = []
    for i in range(4):
        layers += [BatchNorm(2, affine=False),
                   AffineCoupling((2,), odd=i % 2 != 0, base_filters=8)]
    chain = Chain(layers)
    scanned = scan_repeated(layers, 4)
    var_c = chain.init(rng)
    var_s = restack(var_c, 4)
    x = jax.random.normal(jax.random.fold_in(rng, 3), (32, 2))
    ctx = Ctx(rng=None, train=True)
    y_c, ld_c, st_c = chain.forward(var_c, x, ctx)
    y_s, ld_s, st_s = scanned.forward(var_s, x, ctx)
    # batch-variance reductions reassociate differently between the
    # unrolled and scanned XLA programs: f32 agreement is ~1e-4, not 1e-6
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_c),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ld_s), np.asarray(ld_c),
                               rtol=2e-4, atol=2e-4)
    # running-stat updates must match the unrolled layout after restacking
    st_c_stacked = restack({"params": st_c, "state": st_c}, 4)["state"]
    for a, b in zip(jax.tree.leaves(st_s), jax.tree.leaves(st_c_stacked)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_dd_init_matches_chain(rng):
    layers = glow_layers(4)
    chain = Chain(layers)
    scanned = scan_repeated(layers, 6)
    var_c = chain.init(rng)
    var_s = restack(var_c, 6)
    x = jax.random.normal(jax.random.fold_in(rng, 3), (64, 2)) * 2.0 + 1.0
    ctx = Ctx(rng=None, train=True)
    nv_c, y_c = chain.dd_init(var_c, x, ctx)
    nv_s, y_s = scanned.dd_init(var_s, x, ctx)
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_c),
                               rtol=1e-5, atol=1e-5)
    nv_c_stacked = restack(nv_c, 6)
    for a, b in zip(jax.tree.leaves(nv_s), jax.tree.leaves(nv_c_stacked)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_grads_match_chain(rng):
    layers = glow_layers(4)
    chain = Chain(layers)
    scanned = scan_repeated(layers, 6)
    var_c = chain.init(rng)
    var_s = restack(var_c, 6)
    x = jax.random.normal(jax.random.fold_in(rng, 3), (32, 2))
    ctx = Ctx(rng=None, train=True)

    def loss(bij):
        def f(params, state):
            z, ld, _ = bij.forward({"params": params, "state": state}, x, ctx)
            return -jnp.mean(-0.5 * jnp.sum(z * z, -1) + ld)
        return f

    g_c = jax.grad(loss(chain))(var_c["params"], var_c["state"])
    g_s = jax.grad(loss(scanned))(var_s["params"], var_s["state"])
    g_c_stacked = restack({"params": g_c, "state": var_c["state"]}, 6)["params"]
    for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_c_stacked)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_block_structure_mismatch_raises(rng):
    blocks = [Chain([ActNorm(2)]), Chain([ActNorm(3)])]
    with pytest.raises(Exception):
        ScannedChain(blocks).init(rng)


SCAN_ZOO = {
    "planar": dict(layers=4),
    "realnvp": dict(layers=4, base_filters=16),
    "glow": dict(layers=5, base_filters=16),
    "flow++": dict(layers=2, base_filters=8, mixtures=4),
    "maf": dict(layers=3, base_filters=16),
    "resflow": dict(layers=2, base_filters=16, logdet="exact",
                    spnorm_coeff=0.9),
    "ffjord": dict(layers=2, base_filters=16, t0=0.0, t1=1.0, stepsize=0.25,
                   solver="rk4", backprop="adjoint", trace="exact"),
}
SCAN_ATOL = {"flow++": 1e-3, "resflow": 1e-3, "ffjord": 6e-2}


@pytest.mark.parametrize("name", sorted(SCAN_ZOO))
def test_builder_scan_roundtrip(name, rng):
    cfg = Config()
    cfg.network = NetworkConfig(name=name, scan=True, **SCAN_ZOO[name])
    model = build_model(name, (2,), datatype="2d", cfg=cfg.network)
    var = model.init(rng)
    ctx = Ctx(train=False)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (16, 2)) * 0.5
    z, ld_f, _ = model.forward(var, x, ctx)
    assert np.all(np.isfinite(np.asarray(z)))
    assert np.all(np.isfinite(np.asarray(ld_f)))
    x2, ld_i, _ = model.inverse(var, z, ctx)
    atol = SCAN_ATOL.get(name, 2e-4)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=atol)
    np.testing.assert_allclose(np.asarray(ld_f), -np.asarray(ld_i),
                               atol=max(atol, 2e-3))


def test_builder_scan_image_roundtrip(rng):
    cfg = Config()
    cfg.network = NetworkConfig(name="glow", layers=2, base_filters=8,
                                scan=True)
    model = build_model("glow", (16, 16, 1), datatype="image",
                        cfg=cfg.network)
    var = model.init(rng)
    ctx = Ctx(train=False)
    x = jax.random.uniform(jax.random.fold_in(rng, 1), (4, 16, 16, 1),
                           minval=0.05, maxval=0.95)
    z, ld_f, _ = model.forward(var, x, ctx)
    x2, ld_i, _ = model.inverse(var, z, ctx)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_f), -np.asarray(ld_i), atol=1e-2)
