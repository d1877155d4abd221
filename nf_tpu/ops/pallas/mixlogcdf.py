"""Fused logistic-mixture-CDF bisection inverse kernel.

Inverting y = MixLogisticCDF(x; pi, mu, s) (the Flow++ sampling hot path,
reference semantics at /root/reference/flows/modules.py:196-212) is an
iterative elementwise solve, each iteration evaluating the full K-mixture
CDF.  Under XLA this is a ``lax.fori_loop`` whose body re-reads the three
(B, N, K) mixture-parameter tensors from HBM every iteration.  This
kernel pins (logpi, mu, s) in VMEM for the whole loop — one HBM read per
operand, one write per output — and replaces pure bisection with a
bracket-safeguarded Newton iteration (quadratic convergence at bisection
cost per step), with the final mixture log-pdf (the inverse log-det term)
fused into the same pass.

Layout: the mixture axis K is placed on the *sublane* axis — operands are
transposed to (B, K, N) before the call so the feature axis N stays in
lanes and the logsumexp over K reduces across sublanes.

Inference-only (sampling / density inversion); the forward (training)
direction never calls this.  The jnp path in nf_tpu/bijectors/mixlogcdf.py
remains the reference and the default (see use_pallas_bisect for the
measurement that decided this); the kernel is validated against it
(tests/test_pallas.py).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

_BLOCK_B = 32
SPAN = 1.0e3
N_ITERS = 24
XTOL = 1.0e-5
TINY = 1.0e-38


def _logsumexp_sublane(t):
    """logsumexp over axis -2 (the K sublane axis) of a (bb, K, N) tile."""
    m = jnp.max(t, axis=-2)
    return jnp.log(jnp.sum(jnp.exp(t - m[..., None, :]), axis=-2)) + m


def _bisect_kernel(y_ref, logpi_ref, mu_ref, s_ref, x_ref, ld_ref):
    y = y_ref[:]                      # (bb, N)
    logpi = logpi_ref[:]              # (bb, K, N)
    mu = mu_ref[:]
    s = s_ref[:]
    inv_scale = jnp.exp(-s)
    pi = jnp.exp(logpi)

    # Bracket-safeguarded Newton in log-CDF / log-survival space — the
    # same algorithm as the jnp fallback (bijectors/mixlogcdf.py
    # _newton_solve, where it is documented); mixture axis on sublanes.
    use_lo = y < 0.5
    ly = jnp.log(jnp.maximum(y, TINY))
    l1y = jnp.log(jnp.maximum(1.0 - y, TINY))

    def body(_, carry):
        x, lo, hi, dxold = carry
        sg = jax.nn.sigmoid((x[:, None, :] - mu) * inv_scale)
        cdf = jnp.sum(pi * sg, axis=-2)
        pdf = jnp.sum(pi * inv_scale * sg * (1.0 - sg), axis=-2)
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
        0, N_ITERS, body,
        (jnp.zeros_like(y), lo, hi, jnp.full_like(y, 2.0 * SPAN)))

    # fused inverse log-det: -sum_N log mixture-pdf(x)
    z = (x[:, None, :] - mu) * inv_scale
    logpdf = z - s - 2.0 * jax.nn.softplus(z)
    ld_row = _logsumexp_sublane(logpi + logpdf)

    x_ref[:] = x
    ld_ref[:] = -jnp.sum(ld_row, axis=1, keepdims=True)


def mix_log_cdf_inverse_pallas(y, logpi, mu, s, interpret=False):
    """y: (B, N); logpi/mu/s: (B, N, K) log-softmaxed mixture params.
    Returns (x, per-sample inverse logdet (B,))."""
    B, N = y.shape
    K = logpi.shape[-1]
    # K -> sublanes, N -> lanes
    tp = lambda t: jnp.swapaxes(t, -1, -2)
    bb = min(_BLOCK_B, B)
    grid = ((B + bb - 1) // bb,)
    vec = pl.BlockSpec((bb, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    mixp = pl.BlockSpec((bb, K, N), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    x, ld = pl.pallas_call(
        _bisect_kernel,
        grid=grid,
        in_specs=[vec, mixp, mixp, mixp],
        out_specs=[vec, pl.BlockSpec((bb, 1), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, N), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1), jnp.float32)],
        interpret=interpret,
    )(y.astype(jnp.float32), tp(logpi).astype(jnp.float32),
      tp(mu).astype(jnp.float32), tp(s).astype(jnp.float32))
    return x, ld[:, 0]


def use_pallas_bisect(y) -> bool:
    """Eligibility gate — OPT-IN via NF_TPU_PALLAS_BISECT=1 (the platform
    itself is selected at lowering time by the caller).

    Measured on TPU v5e (B=1024, N=512, K=8): this op is transcendental-
    compute-bound, not HBM-bound, and XLA already keeps the fori_loop body
    fused — the XLA Newton path runs 2.4 ms vs 3.8 ms for the kernel
    (which also pays (B,N,K)->(B,K,N) input transposes).  The kernel is
    kept as a validated alternative (its VMEM-resident layout wins if K
    grows toward lane width), but the XLA path is the default.
    """
    return (_HAS_PALLAS and os.environ.get("NF_TPU_PALLAS_BISECT") == "1"
            and y.ndim == 2 and y.shape[1] % 128 == 0)
