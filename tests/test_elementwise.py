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
