"""Parameter-free elementwise bijectors with exact log-dets.

Behavior parity: /root/reference/flows/modules.py:114-212 (Identity, Sigmoid,
Logit, Tanh, Arctanh) including the clamp epsilons.  TPU-first: pure jnp
elementwise maps that XLA fuses into neighboring ops on the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.bijector import Bijector, empty_variables
from ..ops import math as fm


class Identity(Bijector):
    def forward(self, var, x, ctx):
        return x, jnp.zeros(x.shape[0], jnp.float32), var["state"]

    def inverse(self, var, y, ctx):
        return y, jnp.zeros(y.shape[0], jnp.float32), var["state"]


class Sigmoid(Bijector):
    """y = sigmoid(x); inverse clamps to [1e-8, 1-1e-8] before logit."""

    def forward(self, var, x, ctx):
        ld = fm.sum_except_batch(fm.log_deriv_sigmoid(x))
        return jnp.reciprocal(1.0 + jnp.exp(-x)), ld, var["state"]

    def inverse(self, var, y, ctx):
        y = jnp.clip(y, 1.0e-8, 1.0 - 1.0e-8)
        ld = fm.sum_except_batch(fm.log_deriv_logit(y))
        return fm.logit(y), ld, var["state"]


class Logit(Bijector):
    """y = logit(x) input transform.

    ``compress=False`` (reference parity): y = logit(clamp(x, eps, 1-eps))
    — flows/realnvp.py:19, flows/modules.py:141-155.  The clamp makes the
    map NON-INJECTIVE on [0, eps): every sub-eps pixel collapses to eps,
    so the "density" integrates to > 1 and image likelihoods are inflated
    without bound (8-bit background pixels dequantize to u/256 < 0.01 and
    sit squarely in the clamp).  Same exploit class as the reference's
    MixLogCDF clamp (see bijectors/mixlogcdf.py).

    ``compress=True`` (the image builders' default): the standard RealNVP
    treatment y = logit(eps + (1-2eps) x) — a true bijection of [0, 1]
    whose squash is paid for in the log-det (+ D log(1-2eps)), keeping the
    image NLL a normalized likelihood."""

    def __init__(self, eps: float = 1.0e-5, compress: bool = False):
        self.eps = eps
        self.compress = compress

    def forward(self, var, x, ctx):
        if self.compress:
            scale = 1.0 - 2.0 * self.eps
            x = self.eps + scale * x
            d = 1
            for s in x.shape[1:]:
                d *= s
            ld = fm.sum_except_batch(fm.log_deriv_logit(x)) \
                + d * jnp.log(scale)
            return fm.logit(x), ld, var["state"]
        x = jnp.clip(x, self.eps, 1.0 - self.eps)
        ld = fm.sum_except_batch(fm.log_deriv_logit(x))
        return fm.logit(x), ld, var["state"]

    def inverse(self, var, y, ctx):
        s = jnp.reciprocal(1.0 + jnp.exp(-y))
        ld = fm.sum_except_batch(fm.log_deriv_sigmoid(y))
        if self.compress:
            scale = 1.0 - 2.0 * self.eps
            d = 1
            for sh in s.shape[1:]:
                d *= sh
            return (s - self.eps) / scale, ld - d * jnp.log(scale), var["state"]
        return s, ld, var["state"]


class Tanh(Bijector):
    def forward(self, var, x, ctx):
        ld = fm.sum_except_batch(fm.log_deriv_tanh(x))
        return jnp.tanh(x), ld, var["state"]

    def inverse(self, var, y, ctx):
        ld = fm.sum_except_batch(fm.log_deriv_arctanh(y))
        y = jnp.clip(y, -1.0 + 1.0e-8, 1.0 - 1.0e-8)
        return jnp.arctanh(y), ld, var["state"]


class Arctanh(Bijector):
    def forward(self, var, x, ctx):
        ld = fm.sum_except_batch(fm.log_deriv_arctanh(x))
        x = jnp.clip(x, -1.0 + 1.0e-8, 1.0 - 1.0e-8)
        return jnp.arctanh(x), ld, var["state"]

    def inverse(self, var, y, ctx):
        ld = fm.sum_except_batch(fm.log_deriv_tanh(y))
        return jnp.tanh(y), ld, var["state"]
