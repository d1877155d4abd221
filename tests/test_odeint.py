"""ODE solver correctness: closed-form linear ODEs, solver order, adjoint
gradients vs direct differentiation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf_tpu.ops.odeint import SOLVERS, odeint, odeint_adjoint


def test_exponential_decay_all_solvers(rng):
    # dx/dt = -x, x(0) = 1 -> x(1) = e^{-1}
    x0 = jnp.ones((4, 3))
    times = jnp.linspace(0.0, 1.0, 11)
    # tolerance per solver contract: bosha3 runs at atol=rtol=1e-3 and may
    # accumulate a few tenths of a percent over the interval
    for method in SOLVERS:
        x1 = odeint(lambda t, x: -x, x0, times, method)
        np.testing.assert_allclose(np.asarray(x1), np.exp(-1.0), rtol=5e-3,
                                   err_msg=method)


def test_pytree_state(rng):
    # coupled pytree state: dz/dt = a, da/dt = 0
    state0 = (jnp.zeros((2,)), jnp.ones((2,)))
    times = jnp.linspace(0.0, 2.0, 21)
    z, a = odeint(lambda t, s: (s[1], jnp.zeros_like(s[1])), state0, times, "rk4")
    np.testing.assert_allclose(np.asarray(z), 2.0, rtol=1e-5)


def test_rk4_order():
    # halving dt should cut error by ~2^4 for rk4 on a nonlinear ODE
    f = lambda t, x: jnp.sin(x) + t
    x0 = jnp.asarray([0.3])

    def err(n):
        times = jnp.linspace(0.0, 1.0, n + 1)
        ref_times = jnp.linspace(0.0, 1.0, 4097)
        x = odeint(f, x0, times, "rk4")
        xr = odeint(f, x0, ref_times, "rk4")
        return float(jnp.abs(x - xr)[0])

    e8, e16 = err(8), err(16)
    assert e8 / max(e16, 1e-14) > 8.0  # at least ~2^3 despite roundoff


def test_reverse_time_integration():
    # integrate forward then backward recovers the start point
    f = lambda t, x: jnp.sin(3.0 * x) * 0.5
    x0 = jnp.asarray([0.7, -0.2])
    fwd = jnp.linspace(0.0, 1.0, 11)
    x1 = odeint(f, x0, fwd, "dopri5")
    x0b = odeint(f, x1, jnp.flip(fwd), "dopri5")
    np.testing.assert_allclose(np.asarray(x0b), np.asarray(x0), atol=2e-3)


@pytest.mark.parametrize("method", ["rk4", "dopri5"])
def test_adjoint_matches_direct_grad(method, rng):
    params = {"A": 0.4 * jax.random.normal(rng, (3, 3))}
    x0 = jax.random.normal(jax.random.fold_in(rng, 1), (5, 3))
    times = jnp.linspace(0.0, 1.0, 11)

    def func(p, t, x):
        return jnp.tanh(x @ p["A"])

    def loss_adj(p, x):
        x1 = odeint_adjoint(func, p, x, times, method)
        return jnp.sum(x1 ** 2)

    def loss_dir(p, x):
        x1 = odeint(lambda t, xx: func(p, t, xx), x, times, method)
        return jnp.sum(x1 ** 2)

    ga, gxa = jax.grad(loss_adj, argnums=(0, 1))(params, x0)
    gd, gxd = jax.grad(loss_dir, argnums=(0, 1))(params, x0)
    np.testing.assert_allclose(np.asarray(ga["A"]), np.asarray(gd["A"]),
                               atol=2e-3, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(gxa), np.asarray(gxd),
                               atol=2e-3, rtol=2e-2)


def test_odeint_jits(rng):
    f = lambda t, x: -x
    x0 = jnp.ones((2, 2))
    times = jnp.linspace(0.0, 1.0, 6)
    out = jax.jit(lambda x: odeint(f, x, times, "dopri5"))(x0)
    np.testing.assert_allclose(np.asarray(out), np.exp(-1.0), rtol=5e-3)


@pytest.mark.parametrize("method", ["bosha3", "dopri5"])
def test_adaptive_solvers_tuple_state_accuracy(method):
    """Adaptive controllers must meet their tolerance on TUPLE states (the
    CNF's (z, logdet) shape).  Regression: the error-norm reduction once
    confused its (sumsq, count) tuples with tuple-structured states,
    rejecting every step and then silently truncating the integration."""
    # dz/dt = -z, dacc/dt = sum(z^2): z(t)=e^{-t} z0, acc(1)=sum(z0^2)(1-e^{-2})/2
    z0 = jnp.array([[1.0, -2.0], [0.5, 3.0]])
    acc0 = jnp.zeros((2,))
    times = jnp.linspace(0.0, 1.0, 11)
    f = lambda t, s: (-s[0], jnp.sum(s[0] ** 2, axis=1))
    z1, acc1 = odeint(f, (z0, acc0), times, method)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0) * np.exp(-1.0),
                               rtol=5e-3)
    np.testing.assert_allclose(
        np.asarray(acc1),
        np.sum(np.asarray(z0) ** 2, axis=1) * (1 - np.exp(-2.0)) / 2,
        rtol=5e-3)


@pytest.mark.parametrize("method", ["rk4", "dopri5"])
@pytest.mark.parametrize("reverse", [False, True])
def test_adjoint_tuple_state_grads(method, reverse, rng):
    """Adjoint == direct gradients for triangular tuple-state dynamics
    (logdet-style accumulator), both time directions."""
    params = {"A": 0.4 * jax.random.normal(rng, (2, 2))}
    z0 = jax.random.normal(jax.random.fold_in(rng, 1), (4, 2))
    acc0 = jnp.zeros((4,))
    times = jnp.linspace(0.0, 1.0, 11)
    if reverse:
        times = jnp.flip(times)

    def func(p, t, s):
        z, _ = s
        return (jnp.tanh(z @ p["A"]), jnp.sum(z * z, axis=1))

    def loss_adj(p):
        z1, a1 = odeint_adjoint(func, p, (z0, acc0), times, method)
        return jnp.sum(z1 ** 2) + 3.0 * jnp.sum(a1)

    def loss_dir(p):
        z1, a1 = odeint(lambda t, s: func(p, t, s), (z0, acc0), times, method)
        return jnp.sum(z1 ** 2) + 3.0 * jnp.sum(a1)

    np.testing.assert_allclose(float(loss_adj(params)),
                               float(loss_dir(params)), rtol=1e-6)
    ga = jax.grad(loss_adj)(params)["A"]
    gd = jax.grad(loss_dir)(params)["A"]
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gd),
                               atol=2e-3, rtol=2e-2)
