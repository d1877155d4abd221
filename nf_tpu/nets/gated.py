"""Flow++ conditioner building blocks: gated dense/conv layers, full-shape
LayerNorm, and gated multi-head self-attention.

Behavior parity: /root/reference/flows/modules.py:500-578 —
  * GatedLinear/GatedConv2d: y = elu([x, -x]) -> op -> elu([y, -y]) ->
    split -> y * sigmoid(a), residual (modules.py:500-535); requires
    in == out channels (as used: base_filters -> base_filters);
  * GatedAttn: V/K/Q from one 1x1 projection of (x + learned positional
    noise), attention weights W = softmax(V^T K / sqrt(D)) over the V-token
    axis, A = Q W, then a gated 1x1 output projection and residual
    (modules.py:538-578 — note the reference genuinely attends with V^T K,
    not Q K^T; replicated for parity);
  * LayerNorm over ALL non-batch axes with full-shape affine, matching
    torch nn.LayerNorm(mid_shape) (flows/coupling.py:145-165).

TPU notes: attention operates on (B, L, C) channels-last tensors; the two
matmuls hit the MXU; sequence length L <= 1024 for the covered workloads so
no flash-tiling is required (SURVEY.md §5.7) — a fused Pallas kernel slots
in at ops/pallas/attention.py.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .core import Net
from .layers import Conv2d, Dense, _kaiming_uniform


class GatedLinear(Net):
    def __init__(self, features: int):
        self.features = features
        self.op = Dense(features * 2, features, weight_norm=False)

    def init(self, key):
        v = self.op.init(key)
        return {"params": {"op": v["params"]}, "state": {}}

    def apply(self, var, x, ctx):
        sub = {"params": var["params"]["op"], "state": {}}
        y = jax.nn.elu(jnp.concatenate([x, -x], axis=-1))  # (.., 2C)
        y, _ = self.op.apply(sub, y, ctx)                  # (.., C)
        y = jax.nn.elu(jnp.concatenate([y, -y], axis=-1))  # (.., 2C)
        h = y[..., : self.features]
        a = y[..., self.features :]
        return x + h * jax.nn.sigmoid(a), var["state"]


class GatedConv2d(Net):
    def __init__(self, features: int):
        self.features = features
        self.op = Conv2d(features * 2, features, 3, weight_norm=False)

    def init(self, key):
        v = self.op.init(key)
        return {"params": {"op": v["params"]}, "state": {}}

    def apply(self, var, x, ctx):
        sub = {"params": var["params"]["op"], "state": {}}
        y = jax.nn.elu(jnp.concatenate([x, -x], axis=-1))
        y, _ = self.op.apply(sub, y, ctx)
        y = jax.nn.elu(jnp.concatenate([y, -y], axis=-1))
        h = y[..., : self.features]
        a = y[..., self.features :]
        return x + h * jax.nn.sigmoid(a), var["state"]


class LayerNormNet(Net):
    """LayerNorm over all non-batch axes with full-shape affine."""

    def __init__(self, shape, eps: float = 1.0e-5):
        self.shape = tuple(shape)
        self.eps = eps

    def init(self, key):
        return {"params": {"gamma": jnp.ones(self.shape, jnp.float32),
                           "beta": jnp.zeros(self.shape, jnp.float32)},
                "state": {}}

    def apply(self, var, x, ctx):
        p = var["params"]
        axes = tuple(range(1, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        varr = jnp.mean((x - mean) ** 2, axis=axes, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(varr + self.eps)
        return y * p["gamma"] + p["beta"], var["state"]


class GatedAttn(Net):
    """Gated multi-head self-attention over the flattened spatial axis."""

    def __init__(self, in_shape, filters: int = 8, heads: int = 4):
        assert filters % heads == 0
        self.in_shape = tuple(in_shape)  # (..., C) channels-last sample shape
        self.channels = in_shape[-1]
        self.filters = filters
        self.heads = heads

    def init(self, key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        c, f = self.channels, self.filters
        return {
            "params": {
                "w_qkv": _kaiming_uniform(k1, (c, 3 * f), c),
                "b_qkv": _kaiming_uniform(k2, (3 * f,), c),
                "w_out": _kaiming_uniform(k3, (f, 2 * c), f),
                "b_out": _kaiming_uniform(k4, (2 * c,), f),
                "pos_emb": jax.random.normal(k5, self.in_shape) * 0.01,
            },
            "state": {},
        }

    def apply(self, var, x, ctx):
        p = var["params"]
        B = x.shape[0]
        C, f, h = self.channels, self.filters, self.heads
        D = f // h
        org_shape = x.shape

        xr = (x + p["pos_emb"]).reshape(B, -1, C)  # (B, L, C)
        L = xr.shape[1]
        qkv = xr @ p["w_qkv"] + p["b_qkv"]  # (B, L, 3f)
        v_, k_, q_ = jnp.split(qkv, 3, axis=-1)

        def heads_of(t):  # (B, L, f) -> (B, h, L, D)
            return t.reshape(B, L, h, D).transpose(0, 2, 1, 3)

        V, K, Q = heads_of(v_), heads_of(k_), heads_of(q_)
        # the reference's softmax(V^T K) @ Q is standard attention with the
        # roles permuted: A = attn(query=K, key=V, value=Q).  The fused
        # Pallas kernel (ops/pallas/attention.py) keeps the LxL scores in
        # VMEM on TPU; jnp fallback elsewhere.
        from ..ops.pallas.attention import attention

        A = attention(K.reshape(B * h, L, D), V.reshape(B * h, L, D),
                      Q.reshape(B * h, L, D))
        A = A.reshape(B, h, L, D).transpose(0, 2, 1, 3).reshape(B, L, f)

        y = A @ p["w_out"] + p["b_out"]  # (B, L, 2C)
        out = y[..., :C] * jax.nn.sigmoid(y[..., C:])
        return x + out.reshape(org_shape), var["state"]
