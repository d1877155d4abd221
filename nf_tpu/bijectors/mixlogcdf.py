"""Logistic-mixture CDF transform (Flow++ inner bijector).

Behavior parity: /root/reference/flows/modules.py:186-212 —
  * forward: y = MixLogisticCDF(x; pi, mu, s), logdet = log mixture pdf;
  * inverse: elementwise bisection on [-1e3, 1e3] (reference: 100 iters with
    early break at 1e-4; here a fixed 64-iteration fori_loop, which reaches
    ~2e3 / 2^64 — far below the reference tolerance — with a static TPU
    schedule).

These are conditional transforms: (logpi, mu, s) come from the coupling's
conditioner, mixture components on the LAST axis (lane dimension).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.bisect import bisect_monotone
from ..ops.math import (mix_logistic_logcdf, mix_logistic_logpdf,
                        sum_except_batch)


def mix_log_cdf_forward(x, logpi, mu, s):
    """Returns (y, per-sample logdet)."""
    ld = sum_except_batch(mix_logistic_logpdf(x, logpi, mu, s))
    y = jnp.exp(mix_logistic_logcdf(x, logpi, mu, s))
    return y, ld


def mix_log_cdf_inverse(y, logpi, mu, s, n_iters: int = 64):
    """Returns (x, per-sample logdet of the inverse)."""
    fn = lambda v: jnp.exp(mix_logistic_logcdf(v, logpi, mu, s))
    lo = jnp.full_like(y, -1.0e3)
    hi = jnp.full_like(y, 1.0e3)
    x = bisect_monotone(fn, y, lo, hi, n_iters=n_iters)
    ld = -sum_except_batch(mix_logistic_logpdf(x, logpi, mu, s))
    return x, ld
