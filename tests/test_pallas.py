"""Pallas kernel validation against jnp reference implementations.

Kernels run in interpreter mode here (CPU CI); the same code compiles via
Mosaic on TPU.  Every kernel must have a jnp reference and match it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf_tpu.ops.pallas.attention import (attention_pallas,
                                         attention_reference)


def test_attention_reference_matches_legacy_einsum(rng):
    """attention(q=K, k=V, v=Q) == the reference's softmax(V^T K) @ Q."""
    B, h, L, D = 2, 4, 16, 2
    kq, kk, kv = jax.random.split(rng, 3)
    V = jax.random.normal(kv, (B, h, L, D))
    K = jax.random.normal(kk, (B, h, L, D))
    Q = jax.random.normal(kq, (B, h, L, D))

    scores = jnp.einsum("bhld,bhmd->bhlm", V, K) / np.sqrt(D)
    W = jax.nn.softmax(scores, axis=2)
    legacy = jnp.einsum("bhld,bhlm->bhmd", Q, W)

    got = attention_reference(K.reshape(B * h, L, D), V.reshape(B * h, L, D),
                              Q.reshape(B * h, L, D)).reshape(B, h, L, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(legacy),
                               atol=1e-5, rtol=1e-5)


def test_attention_pallas_matches_reference(rng):
    bh, L, D = 8, 64, 8
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (bh, L, D))
    k = jax.random.normal(kk, (bh, L, D))
    v = jax.random.normal(kv, (bh, L, D))
    ref = attention_reference(q, k, v)
    got = attention_pallas(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_attention_grad_path(rng):
    """custom_vjp backward (jnp recompute) must differentiate cleanly."""
    from nf_tpu.ops.pallas.attention import attention

    bh, L, D = 2, 8, 4
    q = jax.random.normal(rng, (bh, L, D))
    loss = lambda x: jnp.sum(attention(x, x, x) ** 2)
    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()


def test_coupling_kernel_matches_reference(rng):
    from nf_tpu.ops.pallas.coupling import (coupling_fwd_pallas,
                                            coupling_fwd_reference,
                                            coupling_inv_pallas,
                                            coupling_inv_reference)

    B, N = 16, 256
    ks = jax.random.split(rng, 5)
    z0 = jax.random.normal(ks[0], (B, N))
    t = jax.random.normal(ks[1], (B, N))
    raw = jax.random.normal(ks[2], (B, N))
    gain = jax.random.normal(ks[3], (1,)) * 0.1
    bias = jax.random.normal(ks[4], (1,)) * 0.1

    yr, ldr = coupling_fwd_reference(z0, t, raw, gain, bias)
    yp, ldp = coupling_fwd_pallas(z0, t, raw, gain, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yr), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldp), np.asarray(ldr), atol=1e-4)

    xr, ldr = coupling_inv_reference(yr, t, raw, gain, bias)
    xp, ldp = coupling_inv_pallas(yr, t, raw, gain, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(xp), np.asarray(xr), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldp), np.asarray(ldr), atol=1e-4)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(z0), atol=1e-5)


def test_coupling_fused_gradients_match(rng):
    from nf_tpu.ops.pallas.coupling import (_cf_bwd, _cf_fwd,
                                            coupling_fwd_reference)

    B, N = 4, 8
    ks = jax.random.split(rng, 5)
    z0 = jax.random.normal(ks[0], (B, N))
    t = jax.random.normal(ks[1], (B, N))
    raw = jax.random.normal(ks[2], (B, N))
    gain = jax.random.normal(ks[3], (1,)) * 0.1
    bias = jax.random.normal(ks[4], (1,)) * 0.1

    def loss_ref(args):
        y, ld = coupling_fwd_reference(*args)
        return jnp.sum(y ** 2) + jnp.sum(ld * 3.0)

    g_ref = jax.grad(loss_ref)((z0, t, raw, gain, bias))

    # analytic bwd applied to the same cotangents
    y, ld = coupling_fwd_reference(z0, t, raw, gain, bias)
    cts = (2.0 * y, jnp.full((B,), 3.0))
    g_an = _cf_bwd((z0, raw, gain, bias), cts)
    for a, b in zip(g_ref, g_an):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_mixlogcdf_bisect_kernel_matches_reference(rng):
    from nf_tpu.bijectors.mixlogcdf import (mix_log_cdf_forward,
                                            mix_log_cdf_inverse)
    from nf_tpu.ops.pallas.mixlogcdf import mix_log_cdf_inverse_pallas

    B, N, K = 4, 128, 8
    ks = jax.random.split(rng, 4)
    x = jax.random.normal(ks[0], (B, N)) * 2.0
    logpi = jax.nn.log_softmax(jax.random.normal(ks[1], (B, N, K)), axis=-1)
    mu = jax.random.normal(ks[2], (B, N, K))
    s = jax.random.normal(ks[3], (B, N, K)) * 0.3

    y, _ = mix_log_cdf_forward(x, logpi, mu, s)
    x_ref, ld_ref = mix_log_cdf_inverse(y, logpi, mu, s)
    x_pl, ld_pl = mix_log_cdf_inverse_pallas(y, logpi, mu, s,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x_ref),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_pl), np.asarray(ld_ref),
                               atol=1e-3, rtol=1e-4)
    # true round trip
    np.testing.assert_allclose(np.asarray(x_pl), np.asarray(x), atol=1e-3)


@pytest.mark.parametrize("name", ["realnvp", "glow"])
@pytest.mark.parametrize("D", [2, 3])
def test_fused_stack_matches_chain(name, D, rng):
    """Whole-stack fused eval kernel (interpret mode) vs the Chain path."""
    from nf_tpu.config import Config, NetworkConfig
    from nf_tpu.core import Ctx
    from nf_tpu.models import build_model
    from nf_tpu.ops.pallas.fused_stack import (extract_stack_spec,
                                               fused_stack_forward,
                                               fused_stack_inverse)

    cfg = Config()
    cfg.network = NetworkConfig(name=name, layers=4)
    model = build_model(name, (D,), datatype="2d", cfg=cfg.network)
    var = model.init(rng)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (64, D))
    # move running stats off their init values so the test has teeth
    var = model.data_dependent_init(var, x)
    ctx_t = Ctx(rng=jax.random.fold_in(rng, 2), train=True)
    for _ in range(3):
        _, _, st = model.bijector.forward(var, x * 1.3, ctx_t)
        var = {"params": var["params"], "state": st}

    spec = extract_stack_spec(model.bijector, model.dims)
    assert spec is not None
    ctx = Ctx(rng=None, train=False)
    z_ref, ld_ref, _ = model.bijector.forward(var, x, ctx)
    z_f, ld_f = fused_stack_forward(model.bijector, spec, var, x,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld_f), np.asarray(ld_ref),
                               atol=2e-5)

    y_ref, ldi_ref, _ = model.bijector.inverse(var, z_ref, ctx)
    y_f, ldi_f = fused_stack_inverse(model.bijector, spec, var, z_ref,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ldi_f), np.asarray(ldi_ref),
                               atol=2e-5)


def test_fused_stack_spec_rejects_nonmatching(rng):
    from nf_tpu.config import Config, NetworkConfig
    from nf_tpu.models import build_model
    from nf_tpu.ops.pallas.fused_stack import extract_stack_spec

    # MAF repeats are [BatchNorm, AutoregressiveTransform] -> no match
    cfg = Config()
    cfg.network = NetworkConfig(name="maf", layers=4)
    model = build_model("maf", (2,), datatype="2d", cfg=cfg.network)
    assert extract_stack_spec(model.bijector, model.dims) is None
    # odd repeat count -> no match
    cfg.network = NetworkConfig(name="realnvp", layers=3)
    model = build_model("realnvp", (2,), datatype="2d", cfg=cfg.network)
    assert extract_stack_spec(model.bijector, model.dims) is None


def test_eval_program_cpu_fallback_matches_model(rng):
    """EvalProgram on CPU uses the jitted Chain; parity with model API."""
    from nf_tpu.config import Config, NetworkConfig
    from nf_tpu.core import Ctx
    from nf_tpu.models import build_model

    cfg = Config()
    cfg.network = NetworkConfig(name="realnvp", layers=4)
    model = build_model("realnvp", (2,), datatype="2d", cfg=cfg.network)
    var = model.init(rng)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (32, 2))
    prog = model.eval_program(var)
    ctx = Ctx(rng=None, train=False)
    z_ref, ld_ref, _ = model.forward(var, x, ctx)
    z, ld = prog.forward(x)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ld_ref), atol=1e-6)
    lp = prog.log_prob(x)
    lp_ref, _ = model.log_prob(var, x, ctx)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref),
                               atol=1e-5, rtol=1e-5)
    ys, lpy = prog.sample(jax.random.fold_in(rng, 2), 16)
    assert ys.shape == (16, 2) and np.isfinite(np.asarray(lpy)).all()


def test_fused_flowpp_matches_chain(rng):
    """Fused flow++ density stack (interpret mode) vs the Chain path:
    forward, inverse (in-kernel Newton), and logdets."""
    from nf_tpu.config import Config, NetworkConfig
    from nf_tpu.core import Ctx
    from nf_tpu.models import build_model
    from nf_tpu.ops.pallas.fused_flowpp import (extract_flowpp_spec,
                                                fused_flowpp_forward,
                                                fused_flowpp_inverse)

    cfg = Config()
    cfg.network = NetworkConfig(name="flow++", layers=4, mixtures=4)
    model = build_model("flow++", (2,), datatype="2d", cfg=cfg.network)
    var = model.init(rng)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (64, 2))
    var = model.data_dependent_init(var, x)

    spec = extract_flowpp_spec(model.bijector, model.dims)
    assert spec is not None and spec.kind == "flowpp"
    ctx = Ctx(rng=None, train=False)
    z_ref, ld_ref, _ = model.bijector.forward(var, x, ctx)
    z_f, ld_f = fused_flowpp_forward(model.bijector, spec, var, x,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_ref),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(ld_f), np.asarray(ld_ref),
                               atol=3e-5, rtol=1e-5)

    y_ref, ldi_ref, _ = model.bijector.inverse(var, z_ref, ctx)
    y_f, ldi_f = fused_flowpp_inverse(model.bijector, spec, var, z_ref,
                                      interpret=True)
    # the in-kernel Newton and the Chain's solver converge independently to
    # the same root within XTOL
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(ldi_f), np.asarray(ldi_ref),
                               atol=5e-3, rtol=1e-4)
    # and the fused inverse actually inverts the fused forward
    y_rt, _ = fused_flowpp_inverse(model.bijector, spec, var, z_f,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(y_rt), np.asarray(x), atol=5e-4)


def test_fused_flowpp_spec_rejects_nonmatching(rng):
    from nf_tpu.config import Config, NetworkConfig
    from nf_tpu.models import build_model
    from nf_tpu.ops.pallas.fused_flowpp import extract_flowpp_spec

    # wrong dimensionality (3D density unsupported: out_chs != 1)
    cfg = Config()
    cfg.network = NetworkConfig(name="flow++", layers=4, mixtures=4)
    m3 = build_model("flow++", (3,), datatype="2d", cfg=cfg.network)
    assert extract_flowpp_spec(m3.bijector, m3.dims) is None
    # realnvp stack is not a flow++ stack
    cfg.network = NetworkConfig(name="realnvp", layers=4)
    mr = build_model("realnvp", (2,), datatype="2d", cfg=cfg.network)
    assert extract_flowpp_spec(mr.bijector, mr.dims) is None


# --------------------------------------------------------------- resflow
def _build_resflow(layers=4):
    from nf_tpu.config import Config, NetworkConfig, NETWORK_DEFAULTS
    from nf_tpu.models import build_model
    cfg = Config()
    cfg.network = NetworkConfig(name="resflow",
                                **{**NETWORK_DEFAULTS["resflow"],
                                   "layers": layers})
    return cfg, build_model("resflow", (2,), datatype="2d", cfg=cfg.network)


def test_fused_resflow_solve_matches_chain(rng):
    """The fused fixed-point solve recovers the chain inverse's x (and the
    forward-replay logdet matches the chain inverse's logdet)."""
    from nf_tpu.core import Ctx
    from nf_tpu.ops.pallas.fused_resflow import (extract_resflow_spec,
                                                 fused_resflow_inverse_solve)
    cfg, model = _build_resflow(layers=4)
    spec = extract_resflow_spec(model.bijector, (2,))
    assert spec is not None and spec.kind == "resflow"
    assert spec.n_repeats == 4 and spec.dim == 2

    var = model.init(rng)
    x0 = jax.random.normal(jax.random.fold_in(rng, 1), (256, 2))
    train_ctx = Ctx(rng=None, train=True)
    var = jax.jit(
        lambda v, b: model.bijector.dd_init(v, b, train_ctx)[0])(var, x0)

    ctx = Ctx(rng=None, train=False)
    z, _, _ = model.forward(var, x0, ctx)
    x_chain, ld_chain, _ = model.inverse(var, z, ctx)
    x_fused = fused_resflow_inverse_solve(model.bijector, spec, var, z,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(x_fused), np.asarray(x_chain),
                               atol=5e-4)
    # forward replay at the solved x reproduces the inverse logdet
    _, ld_replay, _ = model.forward(var, x_fused, ctx)
    np.testing.assert_allclose(np.asarray(-ld_replay), np.asarray(ld_chain),
                               atol=1e-3)


def test_fused_resflow_logdet_matches_chain(rng):
    """The solve+logdet and forward+logdet kernels reproduce the chain
    paths' estimator VALUES (not just distribution): probes and RR series
    lengths are drawn XLA-side with the chain's exact key structure
    (fused_resflow.draw_unbias_probes), so the only differences are float
    reassociation and fixed-point tolerance."""
    from nf_tpu.core import Ctx
    from nf_tpu.ops.pallas.fused_resflow import (extract_resflow_spec,
                                                 fused_resflow_forward,
                                                 fused_resflow_inverse)
    cfg, model = _build_resflow(layers=4)
    spec = extract_resflow_spec(model.bijector, (2,))
    assert spec is not None and spec.estimator == "unbias"

    var = model.init(rng)
    x0 = jax.random.normal(jax.random.fold_in(rng, 1), (256, 2))
    train_ctx = Ctx(rng=None, train=True)
    var = jax.jit(
        lambda v, b: model.bijector.dd_init(v, b, train_ctx)[0])(var, x0)

    ctx = Ctx(rng=None, train=False)
    z_chain, ld_fwd_chain, _ = model.forward(var, x0, ctx)
    z_f, ld_fwd_f = fused_resflow_forward(model.bijector, spec, var, x0,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(z_f), np.asarray(z_chain),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_fwd_f),
                               np.asarray(ld_fwd_chain), atol=1e-4)

    x_chain, ld_chain, _ = model.inverse(var, z_chain, ctx)
    x_f, ld_f = fused_resflow_inverse(model.bijector, spec, var, z_chain,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_chain),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(ld_f), np.asarray(ld_chain),
                               atol=1e-3)


def test_resflow_spec_rejects_nonmatching(rng):
    from nf_tpu.ops.pallas.fused_resflow import extract_resflow_spec
    from nf_tpu.config import Config, NetworkConfig
    from nf_tpu.models import build_model
    cfg = Config()
    cfg.network = NetworkConfig(name="realnvp", layers=4)
    m = build_model("realnvp", (2,), datatype="2d", cfg=cfg.network)
    assert extract_resflow_spec(m.bijector, (2,)) is None
