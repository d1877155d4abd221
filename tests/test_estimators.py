"""Estimator accuracy: Hutchinson trace, power-series logdets, memory-saved
custom-vjp gradients.  Formalizes the reference's inline self-tests
(/root/reference/flows/cnf.py:176-198, flows/iresblock.py:304-329)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf_tpu.ops import estimators as est


def make_contractive(rng, d=4, seed=0):
    """Symmetric matrix with spectral norm < 1 (reference self-test setup)."""
    A = np.random.default_rng(seed).normal(size=(d, d)).astype(np.float32)
    A = A.T @ A
    eigval, eigvec = np.linalg.eigh(A)
    eigval = eigval / (np.max(np.abs(eigval)) + 2.0)
    return jnp.asarray(eigvec @ np.diag(eigval) @ eigvec.T)


def test_trace_exact_and_hutchinson(rng):
    A = make_contractive(rng)
    b = jax.random.normal(rng, (1, 4))
    f = lambda z: z @ A + b
    z = jax.random.normal(jax.random.fold_in(rng, 1), (1, 4))

    tr_true = float(jnp.trace(A))
    tr_exact = float(est.trace_exact(f, z)[0])
    tr_hutch = float(est.trace_hutchinson(f, z, rng, n_samples=1024)[0])

    assert abs(tr_exact - tr_true) < 1e-5
    assert abs(tr_hutch - tr_true) < 0.15


def test_logdet_series_estimators(rng):
    A = make_contractive(rng)
    g = lambda z: z @ A  # f(x) = x + g(x), J_g = A
    z = jax.random.normal(rng, (1, 4))

    ld_true = float(jnp.linalg.slogdet(jnp.eye(4) + A)[1])
    ld_exact = float(est.logdet_exact(g, z)[0])
    ld_fixed = float(est.logdet_fixed(g, z, rng, n_samples=500,
                                      n_power_series=10)[0])
    ld_unbias = float(est.logdet_unbias(g, z, jax.random.fold_in(rng, 2),
                                        n_samples=500, n_exact=10)[0])

    # MC std of the Hutchinson quadratic form with 500 probes is ~0.06 here
    assert abs(ld_exact - ld_true) < 1e-5
    assert abs(ld_fixed - ld_true) < 0.15
    assert abs(ld_unbias - ld_true) < 0.15


def test_geometric_sampler_mean(rng):
    keys = jax.random.split(rng, 4096)
    samples = jax.vmap(lambda k: est.geometric(k, 0.5))(keys)
    # E[Geom(0.5)] = 2
    assert abs(float(jnp.mean(samples.astype(jnp.float32))) - 2.0) < 0.15


@pytest.mark.slow
def test_memory_saved_gradients_match_exact(rng):
    """custom_vjp (Neumann) gradient ~= gradient of the exact logdet."""
    d = 3
    k1, k2 = jax.random.split(rng)
    W0 = 0.3 * jax.random.normal(k1, (d, d))

    def g_apply(params, x):
        return jnp.tanh(x @ params["W"])  # Lipschitz < 1 for small W

    x = jax.random.normal(k2, (8, d)) * 0.5
    params = {"W": W0}

    def loss_memsaved(p, key):
        g, logdet = est.iresblock_forward(g_apply, p, x, key)
        return jnp.mean(jnp.sum((x + g) ** 2, axis=1) + logdet)

    def loss_exact(p):
        g = g_apply(p, x)
        logdet = est.logdet_exact(lambda xx: g_apply(p, xx), x)
        return jnp.mean(jnp.sum((x + g) ** 2, axis=1) + logdet)

    g_exact = jax.grad(loss_exact)(params)["W"]
    # average the stochastic gradient over many keys
    keys = jax.random.split(rng, 256)
    g_ms = jnp.mean(jnp.stack(
        [jax.grad(loss_memsaved)(params, k)["W"] for k in keys[:64]]), 0)
    err = float(jnp.max(jnp.abs(g_ms - g_exact)))
    scale = float(jnp.max(jnp.abs(g_exact))) + 1e-8
    assert err / scale < 0.15, (err, scale)


@pytest.mark.slow
def test_memory_saved_per_sample_logdet_cotangent(rng):
    """Non-uniform per-sample logdet weights must reach the params gradient.

    The reference (iresblock.py:169-183) scales the saved params cotangent
    by a single scalar — correct only for mean losses.  nf_tpu weights the
    Neumann probe per sample in _iresblock_bwd, so weighted losses get
    exact parameter gradients too.
    """
    d = 3
    k1, k2, k3 = jax.random.split(rng, 3)
    W0 = 0.3 * jax.random.normal(k1, (d, d))

    def g_apply(params, x):
        return jnp.tanh(x @ params["W"])

    x = jax.random.normal(k2, (8, d)) * 0.5
    params = {"W": W0}
    # fixed non-uniform per-sample weights
    w = jnp.linspace(0.1, 2.0, 8)

    def loss_memsaved(p, key):
        _, logdet = est.iresblock_forward(g_apply, p, x, key)
        return jnp.sum(w * logdet)

    def loss_exact(p):
        logdet = est.logdet_exact(lambda xx: g_apply(p, xx), x)
        return jnp.sum(w * logdet)

    g_exact = jax.grad(loss_exact)(params)["W"]
    keys = jax.random.split(k3, 96)
    g_ms = jnp.mean(jnp.stack(
        [jax.grad(loss_memsaved)(params, k)["W"] for k in keys]), 0)
    err = float(jnp.max(jnp.abs(g_ms - g_exact)))
    scale = float(jnp.max(jnp.abs(g_exact))) + 1e-8
    assert err / scale < 0.15, (err, scale)

    # a uniform-weight run must also still match (regression vs the old path)
    def loss_mean(p, key):
        _, logdet = est.iresblock_forward(g_apply, p, x, key)
        return jnp.mean(logdet)

    def loss_mean_exact(p):
        logdet = est.logdet_exact(lambda xx: g_apply(p, xx), x)
        return jnp.mean(logdet)

    g_exact_u = jax.grad(loss_mean_exact)(params)["W"]
    g_ms_u = jnp.mean(jnp.stack(
        [jax.grad(loss_mean)(params, k)["W"] for k in keys]), 0)
    err_u = float(jnp.max(jnp.abs(g_ms_u - g_exact_u)))
    scale_u = float(jnp.max(jnp.abs(g_exact_u))) + 1e-8
    assert err_u / scale_u < 0.15, (err_u, scale_u)
