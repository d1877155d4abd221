"""Numerical-debug utilities: NaN/Inf probes for bijector stacks.

Parity+: the reference's debug mode registers NaN/Inf forward hooks on all
modules and enables torch anomaly detection (/root/reference/main.py:308-313,
flows/misc.py:28-52 — note the reference hook itself crashes on trigger via
a ``self.___class__`` typo; not replicated).  TPU-native equivalents:
  * ``enable_nan_debugging()`` — jax_debug_nans (re-runs the failing op
    un-jitted and points at it);
  * ``checked_bijector`` — wraps a bijector so forward/inverse assert
    finite outputs in-graph via ``jax.debug`` callbacks (works under jit).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.bijector import Bijector


def enable_nan_debugging():
    jax.config.update("jax_debug_nans", True)


def _probe(tag: str, x, logdet):
    bad_x = jnp.logical_not(jnp.all(jnp.isfinite(x)))
    bad_ld = jnp.logical_not(jnp.all(jnp.isfinite(logdet)))

    def report(bx, bl):
        if bx or bl:
            raise FloatingPointError(
                f"non-finite output in {tag}: tensor_bad={bool(bx)} "
                f"logdet_bad={bool(bl)}")

    jax.debug.callback(report, bad_x, bad_ld)


class CheckedBijector(Bijector):
    """Wraps a bijector with in-graph NaN/Inf probes on both directions."""

    def __init__(self, inner: Bijector, tag: str = ""):
        self.inner = inner
        self.tag = tag or type(inner).__name__

    def init(self, key):
        return self.inner.init(key)

    def dd_init(self, var, x, ctx):
        return self.inner.dd_init(var, x, ctx)

    def forward(self, var, x, ctx):
        y, ld, state = self.inner.forward(var, x, ctx)
        _probe(f"{self.tag}.forward", y, ld)
        return y, ld, state

    def inverse(self, var, y, ctx):
        x, ld, state = self.inner.inverse(var, y, ctx)
        _probe(f"{self.tag}.inverse", x, ld)
        return x, ld, state


def check_chain(chain):
    """Wrap every layer of a Chain with probes (debug mode)."""
    from ..core.bijector import Chain

    if isinstance(chain, Chain):
        return Chain([CheckedBijector(l, f"layer{i}:{type(l).__name__}")
                      for i, l in enumerate(chain.layers)])
    return CheckedBijector(chain)
