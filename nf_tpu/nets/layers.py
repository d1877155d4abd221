"""Primitive conditioner layers: dense/conv with optional weight norm, and
standard (non-flow) batch norm.

Behavior parity targets:
  * WeightNorm with eps guard — /root/reference/flows/weight_norm.py:5-45.
    Here it is a *parameterization*: params hold (g, v) and the effective
    weight w = v * g / (||v|| + eps) is re-materialized inside the traced
    computation, so XLA fuses the rescale into the matmul.
  * Conditioner BatchNorm — torch.nn.BatchNorm1d/2d semantics (momentum 0.1)
    as used by the reference conditioner nets (flows/modules.py:342-438).

Layout: dense weights are (in, out) so y = x @ W hits the MXU directly;
conv is NHWC `lax.conv_general_dilated` with (H, W, Cin, Cout) kernels.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .core import Net

_WN_EPS = 1.0e-5

# Mixed precision (opt-in via NetworkConfig.compute_dtype="bfloat16"):
# master params and weight-norm math stay f32; the effective weight and
# the activations are cast to the compute dtype so conv/matmul run as
# single-pass bf16 MXU ops and activation HBM traffic halves.  The
# image-tier train path is bandwidth-bound at f32 (BENCH_DETAIL
# rooflines), which is where this buys throughput.
def _maybe_cast(x, dtype):
    if dtype is None or x.dtype == dtype:
        return x
    return x.astype(dtype)


def _kaiming_uniform(key, shape, fan_in):
    bound = float(np.sqrt(1.0 / fan_in))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


class Dense(Net):
    """y = x @ W + b with optional weight-norm parameterization.

    Weight-norm convention matches the reference custom WeightNorm
    (flows/weight_norm.py:21-26): per-input-feature norms, i.e. with our
    (in, out) layout g[j] = ||W[j, :]|| and w = v * (g/(||v||+eps))[:, None].
    """

    def __init__(self, in_features: int, out_features: int, weight_norm: bool = True,
                 compute_dtype=None):
        self.in_features = in_features
        self.out_features = out_features
        self.weight_norm = weight_norm
        self.compute_dtype = jnp.dtype(compute_dtype) if compute_dtype else None

    def init(self, key):
        kw, kb = jax.random.split(key)
        w = _kaiming_uniform(kw, (self.in_features, self.out_features), self.in_features)
        b = _kaiming_uniform(kb, (self.out_features,), self.in_features)
        if self.weight_norm:
            g = jnp.linalg.norm(w, axis=1)
            v = w / (g[:, None] + _WN_EPS)
            params = {"g": g, "v": v, "b": b}
        else:
            params = {"w": w, "b": b}
        return {"params": params, "state": {}}

    def _weight(self, p):
        if self.weight_norm:
            vnorm = jnp.linalg.norm(p["v"], axis=1)
            return p["v"] * (p["g"] / (vnorm + _WN_EPS))[:, None]
        return p["w"]

    def apply(self, var, x, ctx):
        p = var["params"]
        d = self.compute_dtype
        w = _maybe_cast(self._weight(p), d)
        x = _maybe_cast(x, d)
        return x @ w + _maybe_cast(p["b"], d), var["state"]


class Conv2d(Net):
    """NHWC conv with 'SAME' padding and optional weight norm.

    Weight-norm norms are per-output-channel... the reference applies its
    WeightNorm(dim=0) to torch conv weights (out, in, kh, kw), reducing over
    `out` — i.e. per-(in, kh, kw) norms.  We match: kernel is (kh, kw, in,
    out); g has shape (kh, kw, in) reducing over the out axis.
    """

    def __init__(self, in_channels: int, out_channels: int, kernel_size: int = 3,
                 weight_norm: bool = True, compute_dtype=None):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.weight_norm = weight_norm
        self.compute_dtype = jnp.dtype(compute_dtype) if compute_dtype else None

    def init(self, key):
        kw, kb = jax.random.split(key)
        k = self.kernel_size
        fan_in = self.in_channels * k * k
        w = _kaiming_uniform(kw, (k, k, self.in_channels, self.out_channels), fan_in)
        b = _kaiming_uniform(kb, (self.out_channels,), fan_in)
        if self.weight_norm:
            g = jnp.linalg.norm(w, axis=3)
            v = w / (g[..., None] + _WN_EPS)
            params = {"g": g, "v": v, "b": b}
        else:
            params = {"w": w, "b": b}
        return {"params": params, "state": {}}

    def _weight(self, p):
        if self.weight_norm:
            vnorm = jnp.linalg.norm(p["v"], axis=3)
            return p["v"] * (p["g"] / (vnorm + _WN_EPS))[..., None]
        return p["w"]

    def apply(self, var, x, ctx):
        p = var["params"]
        d = self.compute_dtype
        y = jax.lax.conv_general_dilated(
            _maybe_cast(x, d), _maybe_cast(self._weight(p), d),
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + _maybe_cast(p["b"], d), var["state"]


class BatchNormNet(Net):
    """Standard batch norm over all-but-channel axes (channel last)."""

    def __init__(self, num_features: int, momentum: float = 0.1, eps: float = 1.0e-5):
        self.num_features = num_features
        self.momentum = momentum
        self.eps = eps

    def init(self, key):
        c = self.num_features
        return {
            "params": {"gamma": jnp.ones((c,), jnp.float32),
                       "beta": jnp.zeros((c,), jnp.float32)},
            "state": {"running_mean": jnp.zeros((c,), jnp.float32),
                      "running_var": jnp.ones((c,), jnp.float32)},
        }

    def apply(self, var, x, ctx):
        p, s = var["params"], dict(var["state"])
        axes = tuple(range(x.ndim - 1))
        # batch statistics always in f32 (a bf16 mean over 1M elements
        # loses ~3 digits); the normalized output keeps x's dtype so a
        # bf16 conditioner stays bf16 end to end
        xf = x.astype(jnp.float32)
        if ctx.train:
            mean = jnp.mean(xf, axis=axes)
            varb = jnp.mean((xf - mean) ** 2, axis=axes)
            m = self.momentum
            s["running_mean"] = (1 - m) * s["running_mean"] + m * jax.lax.stop_gradient(mean)
            s["running_var"] = (1 - m) * s["running_var"] + m * jax.lax.stop_gradient(varb)
        else:
            mean, varb = s["running_mean"], s["running_var"]
        y = (xf - mean) * jax.lax.rsqrt(varb + self.eps)
        y = y * p["gamma"] + p["beta"]
        return y.astype(x.dtype), s
