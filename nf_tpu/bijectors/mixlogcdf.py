"""Logistic-mixture CDF transform (Flow++ inner bijector).

Behavior parity: /root/reference/flows/modules.py:186-212 —
  * forward: y = MixLogisticCDF(x; pi, mu, s), logdet = log mixture pdf;
  * inverse: elementwise root solve on [-1e3, 1e3].  The reference runs
    100 bisection iterations with a per-element early break at 1e-4; here
    a fixed-trip bracket-safeguarded Newton loop (rtsafe-style) in
    log-CDF space — quadratic convergence in ~5-8 steps, bisection
    fallback otherwise, and a per-element converged-freeze that plays the
    early-break role under a static TPU schedule.  Accuracy is at parity
    with 64-iteration pure bisection (both bounded by fp32/TPU CDF
    evaluation noise) at ~2.7x less compute — PROVIDED forward and solver
    evaluate the same CDF formula (see mix_cdf).
    A fused Pallas variant exists (ops/pallas/mixlogcdf.py) but the XLA
    path measured faster and is the default (kernel is opt-in).

These are conditional transforms: (logpi, mu, s) come from the coupling's
conditioner, mixture components on the LAST axis (lane dimension).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.math import mix_logistic_logpdf, sum_except_batch

SPAN = 1.0e3
N_ITERS = 24
XTOL = 1.0e-5   # x-space convergence freeze
TINY = 1.0e-38


def mix_cdf(x, logpi, mu, s):
    """Mixture CDF as a direct positively-weighted sum, sum(pi*sigmoid).

    Mathematically identical to exp(logsumexp(logpi + logcdf_k)) (the
    reference's route, flows/modules.py:76-97) but cheaper and — critically
    — the SAME formula the inverse solver evaluates: on TPU the two
    formulations disagree by ~1e-5 in fp32, which would shift the root the
    solver converges to (x-error = discrepancy / pdf, up to ~0.25 in
    low-density regions).  Forward/inverse consistency requires one
    formula for both.
    """
    return jnp.sum(jnp.exp(logpi)
                   * jax.nn.sigmoid((x[..., None] - mu) * jnp.exp(-s)),
                   axis=-1)


def mix_log_cdf_forward(x, logpi, mu, s):
    """Returns (y, per-sample logdet)."""
    ld = sum_except_batch(mix_logistic_logpdf(x, logpi, mu, s))
    y = mix_cdf(x, logpi, mu, s)
    return y, ld


def _newton_solve(y, logpi, mu, s, n_iters):
    """Safeguarded Newton for MixLogisticCDF(x) = y, elementwise.

    Newton runs in log-CDF space below the median and log-survival space
    above it (both near-linear in the tails, where probability-space
    Newton crawls).  Each iteration costs one batch of K sigmoids, which
    yields CDF and PDF together.  Proposals outside the open bracket, or
    failing the rtsafe step-halving test, fall back to the midpoint;
    converged elements freeze.
    """
    pi = jnp.exp(logpi)
    inv_scale = jnp.exp(-s)
    use_lo = y < 0.5
    ly = jnp.log(jnp.maximum(y, TINY))
    l1y = jnp.log(jnp.maximum(1.0 - y, TINY))

    def body(_, carry):
        x, lo, hi, dxold = carry
        sg = jax.nn.sigmoid((x[..., None] - mu) * inv_scale)
        cdf = jnp.sum(pi * sg, axis=-1)
        pdf = jnp.sum(pi * inv_scale * sg * (1.0 - sg), axis=-1)
        fraw = cdf - y
        lo = jnp.where(fraw < 0, x, lo)
        hi = jnp.where(fraw >= 0, x, hi)
        c = jnp.clip(cdf, TINY, 1.0 - 1.0e-7)
        f = jnp.where(use_lo, jnp.log(c) - ly, l1y - jnp.log1p(-c))
        df = jnp.maximum(jnp.where(use_lo, pdf / c, pdf / (1.0 - c)), TINY)
        dx = f / df
        xn = x - dx
        use_bis = ((xn <= lo) | (xn >= hi)
                   | (jnp.abs(2.0 * f) > jnp.abs(dxold * df))
                   | ~jnp.isfinite(xn))
        # converged-freeze on the x-space Newton step (the static-schedule
        # analog of the reference's per-element early break): |f| alone is
        # unsafe — in log-flat regions small f does not mean small x-error
        done = (jnp.abs(dx) <= XTOL) | ((hi - lo) <= XTOL)
        dx = jnp.where(use_bis, (hi - lo) * 0.5, dx)
        xn = jnp.where(use_bis, (lo + hi) * 0.5, xn)
        xn = jnp.where(done, x, xn)
        dx = jnp.where(done, 0.0, dx)
        return xn, lo, hi, dx

    lo = jnp.full_like(y, -SPAN)
    hi = jnp.full_like(y, SPAN)
    x, _, _, _ = jax.lax.fori_loop(
        0, n_iters, body,
        (jnp.zeros_like(y), lo, hi, jnp.full_like(y, 2.0 * SPAN)))
    return x


def mix_log_cdf_inverse(y, logpi, mu, s, n_iters: int = N_ITERS):
    """Returns (x, per-sample logdet of the inverse).

    Runs the XLA Newton loop by default; NF_TPU_PALLAS_BISECT=1 opts in
    to the fused Pallas kernel on TPU (see ops/pallas/mixlogcdf.py for
    the measurement behind this default).
    """
    from ..ops.pallas.mixlogcdf import (mix_log_cdf_inverse_pallas,
                                        use_pallas_bisect)

    def jnp_path(y, logpi, mu, s):
        x = _newton_solve(y, logpi, mu, s, n_iters)
        ld = -sum_except_batch(mix_logistic_logpdf(x, logpi, mu, s))
        return x, ld

    B = y.shape[0]
    y2 = y.reshape(B, -1)
    if not use_pallas_bisect(y2):
        return jnp_path(y, logpi, mu, s)

    def pallas_path(y, logpi, mu, s):
        K = logpi.shape[-1]
        x2, ld = mix_log_cdf_inverse_pallas(
            y.reshape(B, -1), logpi.reshape(B, -1, K),
            mu.reshape(B, -1, K), s.reshape(B, -1, K))
        return x2.reshape(y.shape), ld

    # platform picked at lowering time (see ops/pallas/attention.py)
    return jax.lax.platform_dependent(y, logpi, mu, s,
                                      tpu=pallas_path, default=jnp_path)


# --------------------------------------------------------------------------
# fused MixLogCDF -> Logit (the Flow++ composition), log-space throughout
# --------------------------------------------------------------------------
def _mix_logit_parts(x, logpi, mu, s):
    """u = log mixCDF(x), v = log(1 - mixCDF(x)), logpdf — all stable."""
    z = (x[..., None] - mu) * jnp.exp(-s)
    u = jax.scipy.special.logsumexp(logpi + jax.nn.log_sigmoid(z), axis=-1)
    v = jax.scipy.special.logsumexp(logpi + jax.nn.log_sigmoid(-z), axis=-1)
    logpdf = jax.scipy.special.logsumexp(
        logpi + (z - s - 2.0 * jax.nn.softplus(z)), axis=-1)
    return u, v, logpdf


def mix_log_cdf_logit_forward(x, logpi, mu, s):
    """y = logit(MixLogisticCDF(x)), fused in log space.

    Composing the two reference bijectors textually (MixLogCDF then Logit
    with a [eps, 1-eps] clamp — flows/coupling.py:184-188,
    flows/modules.py:141-150) has a saturation exploit: once the CDF
    rounds to 0/1 the clamp flattens the true map (true log-det -> -inf)
    while the accounting still adds log logit'(clamp edge) ~ +11.5 per
    coordinate — maximum-likelihood training then drives points INTO the
    clamp to collect free log-det (measured: claimed +3.1 vs true -14.0
    at trained parameters, held-out NLL below the distribution's entropy
    bound).  Fused in log space, y = logCDF - logSurvival and
    ld = logPDF - logCDF - logSurvival need no clamp, stay exact in the
    tails, and remove the exploit.  A deliberate improvement over the
    reference quirk, not a parity break: identical math in exact
    arithmetic.
    """
    u, v, logpdf = _mix_logit_parts(x, logpi, mu, s)
    return u - v, sum_except_batch(logpdf - u - v)


def mix_log_cdf_logit_inverse(y, logpi, mu, s, n_iters: int = N_ITERS):
    """Inverse of logit(MixLogisticCDF(x)) = y with its log-det.

    Same bracket-safeguarded Newton as `_newton_solve` but in logit space,
    where f(x) = logCDF - logSurvival - y is near-linear in BOTH tails —
    no probability-space underflow, no clamps.
    """

    def body(_, carry):
        x, lo, hi, dxold = carry
        u, v, logpdf = _mix_logit_parts(x, logpi, mu, s)
        f = (u - v) - y
        lo = jnp.where(f < 0, x, lo)
        hi = jnp.where(f >= 0, x, hi)
        df = jnp.maximum(jnp.exp(logpdf - u - v), TINY)
        dx = f / df
        xn = x - dx
        use_bis = ((xn <= lo) | (xn >= hi)
                   | (jnp.abs(2.0 * f) > jnp.abs(dxold * df))
                   | ~jnp.isfinite(xn))
        done = (jnp.abs(dx) <= XTOL) | ((hi - lo) <= XTOL)
        dx = jnp.where(use_bis, (hi - lo) * 0.5, dx)
        xn = jnp.where(use_bis, (lo + hi) * 0.5, xn)
        xn = jnp.where(done, x, xn)
        dx = jnp.where(done, 0.0, dx)
        return xn, lo, hi, dx

    lo = jnp.full_like(y, -SPAN)
    hi = jnp.full_like(y, SPAN)
    x, _, _, _ = jax.lax.fori_loop(
        0, n_iters, body,
        (jnp.zeros_like(y), lo, hi, jnp.full_like(y, 2.0 * SPAN)))
    u, v, logpdf = _mix_logit_parts(x, logpi, mu, s)
    return x, -sum_except_batch(logpdf - u - v)
