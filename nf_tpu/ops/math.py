"""Numerically stable log-derivative math for elementwise bijectors.

Functional parity targets (behavior, not code) in the reference:
/root/reference/flows/modules.py:19-97 — log-derivatives of sigmoid / logit /
tanh / arctanh and logistic-mixture log-pdf/log-cdf computed in log-space with
logsumexp.  All functions are shape-polymorphic, jit-safe, and defined purely
with jnp so they fuse on the VPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG2 = 0.6931471805599453


def softplus(x):
    return jax.nn.softplus(x)


def log_deriv_sigmoid(x):
    """log sigma'(x) = log sigma(x) + log(1 - sigma(x)) = x - 2*softplus(x)."""
    return x - 2.0 * jax.nn.softplus(x)


def deriv_sigmoid(x):
    return jnp.exp(log_deriv_sigmoid(x))


def logit(x):
    return jnp.log(x) - jnp.log1p(-x)


def log_deriv_logit(x, eps=1.0e-8):
    """log logit'(x); inverse-function derivative of sigmoid."""
    y = logit(jnp.clip(x, eps, 1.0 - eps))
    return -log_deriv_sigmoid(y)


def deriv_tanh(x):
    y = jnp.tanh(x)
    return 1.0 - y * y


def log_cosh(x):
    """Numerically stable log cosh(x)."""
    s = jnp.abs(x)
    return s + jnp.log1p(jnp.exp(-2.0 * s)) - _LOG2


def log_deriv_tanh(x):
    """log tanh'(x) = log(1 - tanh(x)^2) = -2 log cosh(x)."""
    return -2.0 * log_cosh(x)


def log_deriv_arctanh(x, eps=1.0e-8):
    """log arctanh'(x) = -log(1 - x^2), clamped away from |x| = 1."""
    x = jnp.clip(x, -1.0 + eps, 1.0 - eps)
    return -(jnp.log1p(-x) + jnp.log1p(x))


def logistic_logpdf(x, mu, s):
    """log pdf of Logistic(mu, exp(s)) at x (s is the log-scale)."""
    z = (x - mu) * jnp.exp(-s)
    return z - s - 2.0 * jax.nn.softplus(z)


def logistic_logcdf(x, mu, s):
    """log cdf of Logistic(mu, exp(s)) at x."""
    z = (x - mu) * jnp.exp(-s)
    return jax.nn.log_sigmoid(z)


def mix_logistic_logpdf(x, logpi, mu, s):
    """log pdf of a K-mixture of logistics.

    ``x``: (...); ``logpi, mu, s``: (..., K) with normalized logpi
    (log-softmax over the last axis).  Mixture on the minor-most axis keeps
    the logsumexp reduction in the TPU lane dimension.  Computed in
    log-space (parity: flows/modules.py:76-97).
    """
    x = x[..., None]
    return jax.scipy.special.logsumexp(logpi + logistic_logpdf(x, mu, s), axis=-1)


def mix_logistic_logcdf(x, logpi, mu, s):
    """log cdf of a K-mixture of logistics; same conventions as logpdf."""
    x = x[..., None]
    return jax.scipy.special.logsumexp(logpi + logistic_logcdf(x, mu, s), axis=-1)


def sum_except_batch(x):
    """Reduce all axes but the leading batch axis -> (B,)."""
    return jnp.sum(x.reshape(x.shape[0], -1), axis=1)


def standard_normal_logprob(z):
    """log N(z; 0, I) summed over non-batch dims -> (B,)."""
    d = z.reshape(z.shape[0], -1)
    return -0.5 * (d.shape[1] * jnp.log(2.0 * jnp.pi) + jnp.sum(d * d, axis=1))
