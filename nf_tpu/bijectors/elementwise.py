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
    """y = logit(clamp(x, eps, 1-eps)); the image-data input transform uses
    eps=0.01 (reference: flows/realnvp.py:19, flows/modules.py:141-155)."""

    def __init__(self, eps: float = 1.0e-5):
        self.eps = eps

    def forward(self, var, x, ctx):
        x = jnp.clip(x, self.eps, 1.0 - self.eps)
        ld = fm.sum_except_batch(fm.log_deriv_logit(x))
        return fm.logit(x), ld, var["state"]

    def inverse(self, var, y, ctx):
        ld = fm.sum_except_batch(fm.log_deriv_sigmoid(y))
        return jnp.reciprocal(1.0 + jnp.exp(-y)), ld, var["state"]


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
