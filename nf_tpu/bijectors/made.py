"""MADE masked autoregressive networks and the MAF transform step.

Behavior parity: /root/reference/flows/maf.py:9-119 —
  * MADE: masked dense stack with per-layer BatchNorm+ReLU and optional
    "companion" direct-input units (maf.py:46-56); degree sampling follows
    maf.py:66-85.  DESIGN DECISION (SURVEY.md §7): masks are FIXED at init
    (drawn once from the init seed).  The reference resamples masks on every
    forward (maf.py:49-50), which is nonstandard; set
    ``resample_masks=True`` to emulate that via the per-step PRNG.
  * AutoregressiveTransform: fixed random permutation buffer, two MADEs for
    s and t, gated scale s = tanh(raw) * s_log_scale + s_bias; one-shot
    forward, D-pass sequential inverse (maf.py:101-119) expressed as a
    lax.fori_loop over coordinates (TPU-friendly fixed trip count).

TPU notes: masked matmuls are dense (in, out) matmuls with a 0/1 mask folded
into the weight — the mask multiply fuses into the matmul epilogue, keeping
the MXU path intact (no gather/scatter).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.bijector import Bijector, Ctx
from ..nets.core import Net
from ..nets.layers import BatchNormNet, _kaiming_uniform


def made_degrees(d: int, hidden_dims, rng: np.random.Generator):
    """Sample MADE unit degrees; returns per-layer degree vectors."""
    m_prev = np.arange(d)
    degrees = [m_prev]
    for h in hidden_dims:
        min_k = min(int(m_prev.min()), d - 2)
        m = rng.integers(min_k, max(d - 1, min_k + 1), size=h)
        degrees.append(m)
        m_prev = m
    return degrees


def degrees_to_masks(degrees, d: int):
    """Hidden masks: M[j, k] = 1 iff m_prev[j] <= m[k] (for (in,out) layout);
    output mask: M[k, i] = 1 iff m_last[k] < i."""
    masks = []
    for m_prev, m in zip(degrees[:-1], degrees[1:]):
        masks.append((m_prev[:, None] <= m[None, :]).astype(np.float32))
    m_last = degrees[-1]
    out = (m_last[:, None] < np.arange(d)[None, :]).astype(np.float32)
    masks.append(out)
    return masks


class MADE(Net):
    def __init__(self, in_out_features: int, num_hidden: int = 2,
                 base_filters: int = 32, use_companion: bool = False,
                 resample_masks: bool = False):
        self.d = in_out_features
        self.num_hidden = num_hidden
        self.base_filters = base_filters
        self.use_companion = use_companion
        # behavioral-parity flag: the reference redraws masks on EVERY
        # forward (flows/maf.py:49-50); default here is fixed-at-init
        self.resample_masks = resample_masks
        self.hidden_dims = [base_filters] * num_hidden
        self.bnorms = [BatchNormNet(h) for h in self.hidden_dims]

    def _sample_masks_traced(self, key):
        """Per-call mask sampling (jnp, trace-safe) for resample_masks."""
        d = self.d
        m_prev = jnp.arange(d)
        masks = []
        for i, h in enumerate(self.hidden_dims):
            k = jax.random.fold_in(key, i)
            min_k = jnp.minimum(jnp.min(m_prev), d - 2)
            # same distribution as the init-time numpy path (made_degrees):
            # uniform over [min_k, max(d-1, min_k+1)) — jax.random.randint
            # takes traced bounds directly, no modulo (which would bias)
            m = jax.random.randint(k, (h,), min_k,
                                   jnp.maximum(d - 1, min_k + 1))
            masks.append((m_prev[:, None] <= m[None, :]).astype(jnp.float32))
            m_prev = m
        masks.append((m_prev[:, None] < jnp.arange(d)[None, :])
                     .astype(jnp.float32))
        return masks

    def init(self, key):
        seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
        rng = np.random.default_rng(seed)
        degrees = made_degrees(self.d, self.hidden_dims, rng)
        masks = degrees_to_masks(degrees, self.d)

        dims = [self.d] + self.hidden_dims + [self.d]
        keys = jax.random.split(key, 3 * len(masks) + len(self.bnorms))
        ws, us, bs = [], [], []
        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            scale = np.sqrt(2.0 / (din + dout))
            ws.append(jax.random.normal(keys[3 * i], (din, dout)) * scale)
            us.append(jax.random.normal(keys[3 * i + 1], (din, dout)) * scale)
            bs.append(jax.random.normal(keys[3 * i + 2], (dout,)) * 0.01)
        bn_vars = [bn.init(k) for bn, k in
                   zip(self.bnorms, keys[3 * len(masks):])]

        params = {"w": ws, "b": bs,
                  "bn": [v["params"] for v in bn_vars]}
        if self.use_companion:
            params["u"] = us
        return {
            "params": params,
            "state": {"masks": [jnp.asarray(m) for m in masks],
                      "bn": [v["state"] for v in bn_vars]},
        }

    def apply(self, var, z, ctx):
        p, s = var["params"], var["state"]
        if self.resample_masks and ctx.rng is not None:
            masks = self._sample_masks_traced(ctx.rng)
        else:
            masks = s["masks"]
        bn_states = list(s["bn"])
        x = z
        for i in range(self.num_hidden):
            w = p["w"][i] * masks[i]
            h = x @ w + p["b"][i]
            if self.use_companion:
                h = h + jnp.ones_like(x) @ (p["u"][i] * masks[i])
            sub = {"params": p["bn"][i], "state": s["bn"][i]}
            h, bn_states[i] = self.bnorms[i].apply(sub, h, ctx.child(i))
            x = jax.nn.relu(h)
        w = p["w"][-1] * masks[-1]
        h = x @ w + p["b"][-1]
        if self.use_companion:
            h = h + jnp.ones_like(x) @ (p["u"][-1] * masks[-1])
        return h, {"masks": s["masks"], "bn": bn_states}


class AutoregressiveTransform(Bijector):
    """One MAF step: permute, then elementwise affine with autoregressive
    conditioners.  (Reference class name has a typo: AutoregressiveTransfrom,
    flows/maf.py:88.)"""

    def __init__(self, in_out_features: int, num_hidden: int = 3,
                 base_filters: int = 32, resample_masks: bool = False):
        self.d = in_out_features
        self.net_s = MADE(in_out_features, num_hidden, base_filters,
                          resample_masks=resample_masks)
        self.net_t = MADE(in_out_features, num_hidden, base_filters,
                          resample_masks=resample_masks)

    def init(self, key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        perm = jax.random.permutation(k1, self.d)
        vs, vt = self.net_s.init(k2), self.net_t.init(k3)
        return {
            "params": {
                "s": vs["params"], "t": vt["params"],
                "s_log_scale": jax.random.normal(k4, (1,)) * 0.01,
                "s_bias": jax.random.normal(k5, (1,)) * 0.01,
            },
            "state": {"perm": perm, "s": vs["state"], "t": vt["state"]},
        }

    def _st(self, var, z, ctx):
        p, st = var["params"], var["state"]
        raw_s, s_state = self.net_s.apply(
            {"params": p["s"], "state": st["s"]}, z, ctx.child(0))
        t, t_state = self.net_t.apply(
            {"params": p["t"], "state": st["t"]}, z, ctx.child(1))
        s = jnp.tanh(raw_s) * p["s_log_scale"] + p["s_bias"]
        return s, t, s_state, t_state

    def forward(self, var, z, ctx):
        perm = var["state"]["perm"]
        z = z[:, perm]
        s, t, s_state, t_state = self._st(var, z, ctx)
        y = z * jnp.exp(s) + t
        ld = jnp.sum(s, axis=1)
        state = {"perm": perm, "s": s_state, "t": t_state}
        return y, ld, state

    def inverse(self, var, y, ctx):
        perm = var["state"]["perm"]
        # conditioners run in eval statistics during the sequential solve;
        # state is passed through unchanged (no stat updates while sampling).
        eval_ctx = Ctx(rng=ctx.rng, train=False)

        def body(i, carry):
            z, ld = carry
            s, t, _, _ = self._st(var, z, eval_ctx)
            new_col = ((y - t) * jnp.exp(-s))[:, i]
            z = z.at[:, i].set(new_col)
            ld = ld - s[:, i]
            return z, ld

        z0 = y
        ld0 = jnp.zeros(y.shape[0], jnp.float32)
        z, ld = jax.lax.fori_loop(0, self.d, body, (z0, ld0))
        inv_perm = jnp.argsort(perm)
        return z[:, inv_perm], ld, var["state"]
