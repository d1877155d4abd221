"""Fixed-trip bisection root finding for monotone scalar inverses.

The reference inverts MixLogCDF and the planar transform with 100-iteration
bisection loops with an early-exit `break` (/root/reference/flows/modules.py:
196-212, /root/reference/flows/planar.py:51-62).  On TPU, data-dependent
early exit defeats static scheduling, so we run a fixed-trip
``lax.fori_loop``: each halving gains one bit, 2e3 span / 2^60 << 1e-4, so 60
iterations strictly dominate the reference's tolerance; we use 64.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def bisect_monotone(fn, target, lo, hi, n_iters: int = 64):
    """Solve fn(x) = target for monotone-increasing elementwise ``fn``.

    ``fn`` maps an array to an array of the same shape; ``lo``/``hi`` bracket
    the root.  Returns the midpoint estimate after ``n_iters`` halvings.
    """

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) * 0.5
        val = fn(mid)
        lo = jnp.where(val < target, mid, lo)
        hi = jnp.where(val >= target, mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, n_iters, body, (lo, hi))
    return (lo + hi) * 0.5

