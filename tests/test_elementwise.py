"""Round-trip and exact-logdet property tests for elementwise bijectors.

Formalizes the implicit invariants of the reference protocol
(/root/reference/flows/modules.py:114-212): inverse(forward(x)) == x and the
returned logdet matches the autodiff Jacobian of the realized map.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nf_tpu.core import Chain, Ctx
from nf_tpu.bijectors import Arctanh, Identity, Logit, Sigmoid, Tanh

CASES = [
    (Identity(), lambda k: jax.random.normal(k, (16, 5))),
    (Sigmoid(), lambda k: jax.random.normal(k, (16, 5))),
    (Logit(), lambda k: jax.random.uniform(k, (16, 5), minval=0.05, maxval=0.95)),
    (Tanh(), lambda k: jax.random.normal(k, (16, 5)) * 0.8),
    (Arctanh(), lambda k: jax.random.uniform(k, (16, 5), minval=-0.9, maxval=0.9)),
]


def autodiff_logdet(fn, x):
    """Exact log|det J| per sample via dense jacobian (small dims only)."""
    def single(xi):
        J = jax.jacfwd(fn)(xi)
        return jnp.linalg.slogdet(J)[1]

    return jax.vmap(single)(x)


@pytest.mark.parametrize("bij,sampler", CASES, ids=lambda c: type(c).__name__)
def test_roundtrip_and_logdet(bij, sampler, rng):
    var = bij.init(rng)
    ctx = Ctx(rng=None, train=False)
    x = sampler(rng)

    y, ld_f, _ = bij.forward(var, x, ctx)
    x2, ld_i, _ = bij.inverse(var, y, ctx)

    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld_f), -np.asarray(ld_i), atol=1e-5)

    if not isinstance(bij, Identity):
        ld_exact = autodiff_logdet(lambda v: bij.forward(var, v[None], ctx)[0][0], x)
        np.testing.assert_allclose(np.asarray(ld_f), np.asarray(ld_exact), atol=1e-4)


def test_chain_accumulates(rng):
    chain = Chain([Tanh(), Arctanh()])
    var = chain.init(rng)
    ctx = Ctx()
    x = jax.random.normal(rng, (8, 3)) * 0.5
    y, ld, _ = chain.forward(var, x, ctx)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-5)


def test_chain_inverse_order(rng):
    chain = Chain([Sigmoid(), Logit(eps=1e-6)])
    var = chain.init(rng)
    ctx = Ctx()
    x = jax.random.normal(rng, (8, 4))
    y, ld_f, _ = chain.forward(var, x, ctx)
    x2, ld_i, _ = chain.inverse(var, y, ctx)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld_f + ld_i), 0.0, atol=1e-4)


def test_compressed_logit_is_bijective_at_boundaries(rng):
    """compress=True must round-trip exact 0/1 pixels (the clamped parity
    variant collapses [0, eps) and inflates image likelihoods unboundedly)."""
    from nf_tpu.bijectors.elementwise import Logit
    import numpy as np

    b = Logit(eps=0.01, compress=True)
    var = b.init(rng)
    x = jnp.asarray([[0.0, 0.001, 0.5, 0.999, 1.0]])
    y, ld_f, _ = b.forward(var, x, Ctx())
    x2, ld_i, _ = b.inverse(var, y, Ctx())
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld_f), -np.asarray(ld_i), rtol=1e-6)

    # logdet matches the autodiff Jacobian (normalized density guarantee)
    def f(v):
        y, _, _ = b.forward(var, v.reshape(1, -1), Ctx())
        return y.reshape(-1)

    J = jax.jacfwd(f)(x.reshape(-1))
    np.testing.assert_allclose(
        float(ld_f[0]), float(jnp.linalg.slogdet(J)[1]), rtol=1e-5)

    # the clamped variant really is non-injective below eps (regression doc)
    bc = Logit(eps=0.01, compress=False)
    y0, _, _ = bc.forward(var, jnp.asarray([[0.0]]), Ctx())
    y1, _, _ = bc.forward(var, jnp.asarray([[0.005]]), Ctx())
    assert float(jnp.abs(y0 - y1)[0, 0]) < 1e-12
