"""Fused multi-head attention Pallas kernel for GatedAttn.

The reference attention (/root/reference/flows/modules.py:556-578) computes
W = softmax_l(<V[l], K[m]> / sqrt(D)) and A[m] = sum_l Q[l] W[l, m] — which
is standard scaled-dot-product attention with the roles permuted:
``A = attention(query=K, key=V, value=Q)``.  The caller (nets/gated.py)
does that permutation; this module provides the standard primitive.

Kernel design (TPU): sequence lengths here are <= 1024 (32x32 images,
SURVEY.md §5.7), so one grid program handles one (batch, head) slice with
Q/K/V resident in VMEM and the (L, L) score matrix never touching HBM —
the win over the unfused jnp path is exactly that HBM round trip.  Numerics
match the jnp reference implementation (max-subtracted softmax, f32).

A jnp fallback (`attention_reference`) is always available; `attention`
dispatches by backend and shape. Set NF_TPU_NO_PALLAS=1 to force fallback.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

try:  # pallas is TPU/Mosaic-backed; keep import soft for CPU-only envs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def attention_reference(q, k, v):
    """Standard attention, unfused jnp: (BH, L, D) -> (BH, L, D)."""
    d = q.shape[-1]
    scores = jnp.einsum("bld,bmd->blm", q, k) / jnp.sqrt(jnp.float32(d))
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("blm,bmd->bld", p, v)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]  # (L, D)
    k = k_ref[0]
    v = v_ref[0]
    d = q.shape[-1]
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(d))
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32)


def attention_pallas(q, k, v, interpret: bool = False):
    """Fused attention; q/k/v: (BH, L, D) f32, one program per BH slice."""
    bh, L, D = q.shape
    spec = pl.BlockSpec((1, L, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _attn_kernel,
        grid=(bh,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, L, D), jnp.float32),
        interpret=interpret,
    )(q, k, v)


@jax.custom_vjp
def _attention_fused(q, k, v):
    return attention_pallas(q, k, v)


def _attention_fused_fwd(q, k, v):
    # fused forward (no HBM score materialization); residuals are the
    # small inputs — the backward recomputes scores via the jnp path
    return attention_pallas(q, k, v), (q, k, v)


def _attention_fused_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(attention_reference, q, k, v)
    return vjp(g)


_attention_fused.defvjp(_attention_fused_fwd, _attention_fused_bwd)


def attention(q, k, v):
    """Dispatch: fused Pallas on TPU (when enabled), jnp otherwise.

    Platform selection happens at LOWERING time (lax.platform_dependent),
    not trace time — `jax.default_backend()` lies when a computation is
    jitted for a device other than the default (e.g. params still on the
    host CPU after a CPU-backend init on a remote-attached TPU).
    """
    L = q.shape[-2]
    if L == 1:
        # single-token attention is the identity on the value: softmax of
        # one score is 1, so out = V (here V carries Q under the
        # reference's role permutation — callers pass (K, V, Q)).  The
        # density (1D-dims) flow++ conditioner hits exactly this shape,
        # and dispatching a (B*h, 1, D) grid to the fused kernel costs
        # ~6 ms/layer in padded no-op blocks (measured round 3).
        return v
    if not _HAS_PALLAS or os.environ.get("NF_TPU_NO_PALLAS") == "1":
        return attention_reference(q, k, v)
    return jax.lax.platform_dependent(q, k, v,
                                      tpu=_attention_fused,
                                      default=attention_reference)
