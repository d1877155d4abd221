"""Normalization bijectors: ActNorm and invertible flow-BatchNorm.

Behavior parity:
  * ActNorm — /root/reference/flows/modules.py:225-256.  Data-dependent init
    is an explicit ``dd_init`` pass (not first-forward mutation), fixing the
    reference quirk where the ``initialized`` flag is lost on resume
    (SURVEY.md §5.4).  Under data parallelism the init statistics are the
    global batch stats because jit+GSPMD computes cross-device means.
  * BatchNorm — /root/reference/flows/modules.py:259-322.  Training-mode
    inverse reuses the cached batch statistics held in state.

Layout: channel axis is the LAST axis (NHWC / (B, D)); per-channel parameters
are stored as (C,) vectors and broadcast against the minor-most lane
dimension, the natural TPU vector layout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.bijector import Bijector
from ..ops.math import sum_except_batch


def _reduce_axes(x):
    """All axes except the channel (last) one."""
    return tuple(range(x.ndim - 1))


def _num_pixels(x):
    """Spatial multiplicity of each channel entry (1 for (B, D) data)."""
    n = 1
    for s in x.shape[1:-1]:
        n *= s
    return n


class ActNorm(Bijector):
    """y = (x - bias) * exp(-log_scale); logdet = -sum(log_scale) * n_pixels."""

    def __init__(self, num_channels: int, eps: float = 1.0e-5):
        self.num_channels = num_channels
        self.eps = eps

    def init(self, key):
        c = self.num_channels
        return {
            "params": {
                "log_scale": jnp.zeros((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32),
            },
            "state": {"initialized": jnp.zeros((), jnp.bool_)},
        }

    def dd_init(self, var, x, ctx):
        axes = _reduce_axes(x)
        mean = jnp.mean(x, axis=axes)
        # ddof=1 to match torch.std's unbiased default (flows/modules.py:240)
        n = x.size // x.shape[-1]
        var_ = jnp.sum((x - mean) ** 2, axis=axes) / jnp.maximum(n - 1, 1)
        log_std = jnp.log(jnp.sqrt(var_) + self.eps)
        params = {"log_scale": log_std, "bias": mean}
        new_var = {"params": params, "state": {"initialized": jnp.ones((), jnp.bool_)}}
        y, _, _ = self.forward(new_var, x, ctx)
        return new_var, y

    def forward(self, var, x, ctx):
        p = var["params"]
        y = (x - p["bias"]) * jnp.exp(-p["log_scale"])
        ld = -jnp.sum(p["log_scale"]) * _num_pixels(x)
        return y, jnp.full((x.shape[0],), ld, jnp.float32), var["state"]

    def inverse(self, var, y, ctx):
        p = var["params"]
        x = y * jnp.exp(p["log_scale"]) + p["bias"]
        ld = jnp.sum(p["log_scale"]) * _num_pixels(y)
        return x, jnp.full((y.shape[0],), ld, jnp.float32), var["state"]


class BatchNorm(Bijector):
    """Invertible batch normalization for flows.

    Training: normalize by batch stats, update running stats, cache batch
    stats in state so the training-mode inverse (used when sampling mid-
    training) undoes exactly the transform that was applied
    (flows/modules.py:309-313).  Eval: use running stats.

    With jit + batch sharding, ``jnp.mean`` over the batch axis is a global
    (cross-device) mean, so multi-chip training matches large-batch
    single-device behavior (SURVEY.md §7 hard-part 4).
    """

    def __init__(self, num_channels: int, momentum: float = 0.1,
                 eps: float = 1.0e-5, affine: bool = True):
        self.num_channels = num_channels
        self.momentum = momentum
        self.eps = eps
        self.affine = affine

    def init(self, key):
        c = self.num_channels

        # distinct arrays per leaf: donated buffers must be unique
        def zeros():
            return jnp.zeros((c,), jnp.float32)

        def ones():
            return jnp.ones((c,), jnp.float32)

        params = {"log_gamma": zeros(), "beta": zeros()} if self.affine else {}
        state = {
            "running_mean": zeros(),
            "running_var": ones(),
            "batch_mean": zeros(),
            "batch_var": ones(),
        }
        if not self.affine:
            # non-trainable affine identity kept in state for uniform math
            state["log_gamma"] = zeros()
            state["beta"] = zeros()
        return {"params": params, "state": state}

    def _gamma_beta(self, var):
        src = var["params"] if self.affine else var["state"]
        return src["log_gamma"], src["beta"]

    def forward(self, var, x, ctx):
        state = dict(var["state"])
        log_gamma, beta = self._gamma_beta(var)

        if ctx.train:
            axes = _reduce_axes(x)
            mean = jnp.mean(x, axis=axes)
            varb = jnp.mean((x - mean) ** 2, axis=axes) + self.eps
            m = self.momentum
            state["running_mean"] = (1 - m) * state["running_mean"] + m * jax.lax.stop_gradient(mean)
            state["running_var"] = (1 - m) * state["running_var"] + m * jax.lax.stop_gradient(varb)
            state["batch_mean"] = jax.lax.stop_gradient(mean)
            state["batch_var"] = jax.lax.stop_gradient(varb)
        else:
            mean, varb = state["running_mean"], state["running_var"]

        y = (x - mean) * jax.lax.rsqrt(varb)
        y = y * jnp.exp(log_gamma) + beta
        ld = jnp.sum(log_gamma - 0.5 * jnp.log(varb)) * _num_pixels(x)
        return y, jnp.full((x.shape[0],), ld, jnp.float32), state

    def inverse(self, var, y, ctx):
        state = var["state"]
        log_gamma, beta = self._gamma_beta(var)
        if ctx.train:
            mean, varb = state["batch_mean"], state["batch_var"]
        else:
            mean, varb = state["running_mean"], state["running_var"]

        x = (y - beta) * jnp.exp(-log_gamma)
        x = x * jnp.sqrt(varb) + mean
        ld = jnp.sum(-log_gamma + 0.5 * jnp.log(varb)) * _num_pixels(y)
        return x, jnp.full((y.shape[0],), ld, jnp.float32), state
