"""Lipschitz-constrained layers for invertible residual blocks.

Behavior parity:
  * SpectralNorm (iResNet variant) — /root/reference/flows/spectral_norm.py:
    9-72: one power iteration per training forward, then rescale by
    coeff/sigma ONLY when sigma > coeff (unlike Miyato et al., which always
    normalizes).  u/v live in state and are updated with stop_gradient;
    sigma keeps its gradient path through the weight (matching torch
    semantics where u/v are buffers).
  * LipSwish — flows/modules.py:215-222: x * sigmoid(beta x) / 1.1 with a
    learnable beta.

Deliberate strengthenings over the reference:
  * u/v are warm-started with ``init_power_iterations`` at parameter init,
    so eval-mode calls (which, like the reference's buffers, reuse stored
    u/v) see a converged sigma estimate from step 0.  The reference's cold
    random u underestimates sigma, silently voiding the Lipschitz bound the
    fixed-point inverse depends on.
  * SpectralNormConv2d power-iterates the TRUE conv operator (conv /
    conv-transpose pair over a spatial probe) when the input spatial shape
    is known, instead of the (out, in*k*k) weight matricization the
    reference uses (flows/spectral_norm.py wraps nn.Conv2d's .weight): the
    matricization norm does NOT bound the conv operator norm (it can be up
    to k x smaller), so the reference's conv blocks are not actually
    guaranteed invertible.  This is the Residual Flows (Chen et al. 2019)
    construction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .core import Net
from .layers import _kaiming_uniform


def _l2normalize(v, eps=1e-12):
    return v / (jnp.linalg.norm(v) + eps)


class SpectralNormDense(Net):
    """Dense layer (in, out) with coeff-capped spectral norm."""

    def __init__(self, in_features: int, out_features: int, coeff: float = 0.97,
                 eps: float = 1.0e-5, power_iterations: int = 1,
                 init_power_iterations: int = 10):
        self.in_features = in_features
        self.out_features = out_features
        self.coeff = coeff
        self.eps = eps
        self.power_iterations = power_iterations
        self.init_power_iterations = init_power_iterations

    def init(self, key):
        kw, kb, ku, kv = jax.random.split(key, 4)
        w = _kaiming_uniform(kw, (self.in_features, self.out_features),
                             self.in_features)
        b = _kaiming_uniform(kb, (self.out_features,), self.in_features)
        # reference 'height' dim = torch out-features; u in R^out, v in R^in
        u = _l2normalize(jax.random.normal(ku, (self.out_features,)))
        v = _l2normalize(jax.random.normal(kv, (self.in_features,)))
        wt = w.T
        for _ in range(self.init_power_iterations):
            v = _l2normalize(wt.T @ u)
            u = _l2normalize(wt @ v)
        return {"params": {"w_bar": w, "b": b}, "state": {"u": u, "v": v}}

    def _normalized(self, w_bar, u, v, train: bool):
        # power iteration on W^T (out, in) to mirror the torch layout
        wt = w_bar.T  # (out, in)
        if train:
            for _ in range(self.power_iterations):
                v = _l2normalize(jax.lax.stop_gradient(wt).T @ u)
                u = _l2normalize(jax.lax.stop_gradient(wt) @ v)
        sigma = u @ (wt @ v)  # grad flows through wt only
        scale = self.coeff / (sigma + self.eps)
        w = jnp.where(scale < 1.0, w_bar * scale, w_bar)
        return w, jax.lax.stop_gradient(u), jax.lax.stop_gradient(v)

    def apply(self, var, x, ctx):
        p, s = var["params"], var["state"]
        w, u, v = self._normalized(p["w_bar"], s["u"], s["v"], ctx.train)
        state = {"u": u, "v": v} if ctx.train else s
        return x @ w + p["b"], state


class SpectralNormConv2d(Net):
    """3x3 SAME conv with a coeff-capped spectral norm.

    With ``spatial=(H, W)`` (the builder knows the featuremap size), the
    power iteration runs on the actual conv operator: u is an output
    featuremap probe, v = conv^T(u) an input probe, conv^T realized as the
    VJP of the conv — the exact operator norm, not the matricization bound.
    Without ``spatial``, falls back to the reference's matricization
    (flows/spectral_norm.py:26-43 applied to nn.Conv2d.weight), which does
    NOT bound the conv operator norm — kept only for shape-agnostic uses.
    """

    def __init__(self, in_channels: int, out_channels: int, kernel_size: int = 3,
                 coeff: float = 0.97, eps: float = 1.0e-5,
                 power_iterations: int = 1, init_power_iterations: int = 10,
                 spatial=None):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = kernel_size
        self.coeff = coeff
        self.eps = eps
        self.power_iterations = power_iterations
        self.init_power_iterations = init_power_iterations
        self.spatial = tuple(spatial) if spatial is not None else None

    def _conv(self, w, x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def _op_iter(self, w, u, v, n_iters: int):
        """Power iteration on the conv operator itself (stop-grad on w)."""
        wc = jax.lax.stop_gradient(w)
        conv = lambda vv: self._conv(wc, vv)
        _, vjp = jax.vjp(conv, v)
        for _ in range(n_iters):
            v = _l2normalize(vjp(u)[0])
            u = _l2normalize(conv(v))
        return u, v

    def init(self, key):
        kw, kb, ku, kv = jax.random.split(key, 4)
        k = self.kernel_size
        fan_in = self.in_channels * k * k
        w = _kaiming_uniform(kw, (k, k, self.in_channels, self.out_channels), fan_in)
        b = _kaiming_uniform(kb, (self.out_channels,), fan_in)
        if self.spatial is not None:
            h, ww = self.spatial
            u = _l2normalize(jax.random.normal(
                ku, (1, h, ww, self.out_channels)))
            v = _l2normalize(jax.random.normal(
                kv, (1, h, ww, self.in_channels)))
            u, v = self._op_iter(w, u, v, self.init_power_iterations)
        else:
            u = _l2normalize(jax.random.normal(ku, (self.out_channels,)))
            v = _l2normalize(jax.random.normal(kv, (fan_in,)))
            mat = w.reshape(-1, self.out_channels).T
            for _ in range(self.init_power_iterations):
                v = _l2normalize(mat.T @ u)
                u = _l2normalize(mat @ v)
        return {"params": {"w_bar": w, "b": b}, "state": {"u": u, "v": v}}

    def apply(self, var, x, ctx):
        p, s = var["params"], var["state"]
        w_bar = p["w_bar"]
        u, v = s["u"], s["v"]
        if self.spatial is not None:
            if ctx.train:
                u, v = self._op_iter(w_bar, u, v, self.power_iterations)
            # sigma = <u, conv(v)> with grads flowing through w_bar only
            sigma = jnp.sum(u * self._conv(w_bar, v))
        else:
            mat = w_bar.reshape(-1, self.out_channels).T  # (out, in*k*k)
            if ctx.train:
                for _ in range(self.power_iterations):
                    v = _l2normalize(jax.lax.stop_gradient(mat).T @ u)
                    u = _l2normalize(jax.lax.stop_gradient(mat) @ v)
            sigma = u @ (mat @ v)
        scale = self.coeff / (sigma + self.eps)
        w = jnp.where(scale < 1.0, w_bar * scale, w_bar)
        y = self._conv(w, x)
        state = ({"u": jax.lax.stop_gradient(u), "v": jax.lax.stop_gradient(v)}
                 if ctx.train else s)
        return y + p["b"], state


class LipSwish(Net):
    def init(self, key):
        return {"params": {"beta": jnp.ones((1,), jnp.float32)}, "state": {}}

    def apply(self, var, x, ctx):
        beta = var["params"]["beta"]
        return x * jax.nn.sigmoid(beta * x) / 1.1, var["state"]
