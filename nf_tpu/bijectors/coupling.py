"""Coupling-layer bijectors: additive (NICE) and affine (RealNVP).

Behavior parity: /root/reference/flows/coupling.py:12-122 —
  * split strategy chosen from (ndim, masking in {checkerboard, channelwise},
    odd) exactly as AbstractCoupling (coupling.py:19-30);
  * affine scale is gated: s = tanh(raw) * s_log_scale + s_bias with learned
    scalar gain/bias (coupling.py:89-90, 107);
  * logdet = sum(s) over transformed entries.

TPU notes: the transform itself (split -> conditioner -> scale/shift ->
merge) is pure jnp, so XLA fuses the exp/mul/add chain into the
conditioner's final matmul epilogue.  1D splits use stride-2 slicing, which
generalizes the reference's reshape trick to odd dimensionality.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.bijector import Bijector, Ctx
from ..nets.conditioners import MLP, ConvNet
from ..ops import squeeze as sq
from ..ops.math import sum_except_batch


def split1d(z, odd: bool = False):
    """(B, D) -> even-index and odd-index halves (works for odd D)."""
    z0, z1 = z[:, 0::2], z[:, 1::2]
    return (z1, z0) if odd else (z0, z1)


def merge1d(z0, z1, odd: bool = False, out_dim: int | None = None):
    if odd:
        z0, z1 = z1, z0
    B = z0.shape[0]
    D = z0.shape[1] + z1.shape[1]
    out = jnp.zeros((B, D), z0.dtype)
    out = out.at[:, 0::2].set(z0)
    out = out.at[:, 1::2].set(z1)
    return out


class _CouplingBase(Bijector):
    """Shared split/merge plumbing. Subclasses implement _transform /
    _inverse_transform over (z0, z1) with z1 the conditioning half."""

    def __init__(self, dims, masking: str = "checkerboard", odd: bool = False):
        self.dims = tuple(dims)
        self.masking = masking
        self.odd = odd
        if len(self.dims) == 1:
            self._split = lambda z: split1d(z, self.odd)
            self._merge = lambda a, b: merge1d(a, b, self.odd)
        elif len(self.dims) == 3 and masking == "checkerboard":
            self._split = lambda z: sq.checker_split(z, self.odd)
            self._merge = lambda a, b: sq.checker_merge(a, b, self.odd)
        elif len(self.dims) == 3 and masking == "channelwise":
            self._split = lambda z: sq.channel_split(z, self.odd)
            self._merge = lambda a, b: sq.channel_merge(a, b, self.odd)
        else:
            raise ValueError(f"unsupported masking/dims: {masking}, {dims}")

    # dims of the transformed half (z0) and conditioning half (z1)
    def half_dims(self):
        if len(self.dims) == 1:
            d = self.dims[0]
            n_even, n_odd = (d + 1) // 2, d // 2
            return (n_odd, n_even) if self.odd else (n_even, n_odd)
        h, w, c = self.dims
        if self.masking == "checkerboard":
            return 2 * c, 2 * c
        return c // 2, c - c // 2

    def forward(self, var, x, ctx):
        z0, z1 = self._split(x)
        z0, ld, state = self._transform(var, z0, z1, ctx)
        return self._merge(z0, z1), ld, state

    def inverse(self, var, y, ctx):
        y0, y1 = self._split(y)
        y0, ld, state = self._inverse_transform(var, y0, y1, ctx)
        return self._merge(y0, y1), ld, state


def _make_conditioner(dims, masking, odd, out_mult, half_dims, base_filters=32,
                      compute_dtype=None):
    """Conditioner net mapping z1 -> out_mult * size(z0) channels."""
    out_chs, in_chs = half_dims[0], half_dims[1]
    if len(dims) == 1:
        return MLP(in_chs, out_chs * out_mult, base_filters=base_filters,
                   compute_dtype=compute_dtype), out_chs
    return ConvNet(in_chs, out_chs * out_mult, base_filters=base_filters,
                   compute_dtype=compute_dtype), out_chs


class AdditiveCoupling(_CouplingBase):
    """z0' = z0 + t(z1); volume preserving (NICE)."""

    def __init__(self, dims, masking="checkerboard", odd=False, base_filters=32,
                 compute_dtype=None):
        super().__init__(dims, masking, odd)
        self.net, self.out_chs = _make_conditioner(
            dims, masking, odd, 1, self.half_dims(), base_filters, compute_dtype)

    def init(self, key):
        v = self.net.init(key)
        return {"params": {"net": v["params"]}, "state": {"net": v["state"]}}

    def _apply_net(self, var, z1, ctx):
        sub = {"params": var["params"]["net"], "state": var["state"]["net"]}
        t, net_state = self.net.apply(sub, z1, ctx.child(0))
        # flow math (shift/scale/logdet) is always f32, whatever the
        # conditioner's compute dtype
        return t.astype(jnp.float32), {"net": net_state}

    def _transform(self, var, z0, z1, ctx):
        t, state = self._apply_net(var, z1, ctx)
        zeros = jnp.zeros(z0.shape[0], jnp.float32)
        return z0 + t, zeros, state

    def _inverse_transform(self, var, y0, y1, ctx):
        t, state = self._apply_net(var, y1, ctx)
        zeros = jnp.zeros(y0.shape[0], jnp.float32)
        return y0 - t, zeros, state


class AffineCoupling(_CouplingBase):
    """z0' = z0 * exp(s) + t, with s = tanh(raw_s) * s_log_scale + s_bias."""

    def __init__(self, dims, masking="checkerboard", odd=False, base_filters=32,
                 compute_dtype=None):
        super().__init__(dims, masking, odd)
        self.net, self.out_chs = _make_conditioner(
            dims, masking, odd, 2, self.half_dims(), base_filters, compute_dtype)

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        v = self.net.init(k1)
        return {
            "params": {
                "net": v["params"],
                "s_log_scale": jax.random.normal(k2, (1,)) * 0.01,
                "s_bias": jax.random.normal(k3, (1,)) * 0.01,
            },
            "state": {"net": v["state"]},
        }

    def _params_st(self, var, z1, ctx):
        sub = {"params": var["params"]["net"], "state": var["state"]["net"]}
        raw, net_state = self.net.apply(sub, z1, ctx.child(0))
        raw = raw.astype(jnp.float32)  # flow math stays f32
        # channel-last layout: first out_chs channels are t, rest raw-s
        t = raw[..., : self.out_chs]
        raw_s = raw[..., self.out_chs :]
        return t, raw_s, {"net": net_state}

    @staticmethod
    def _flat2d(x):
        return x.reshape(x.shape[0], -1)

    def _transform(self, var, z0, z1, ctx):
        t, raw_s, state = self._params_st(var, z1, ctx)
        gain = var["params"]["s_log_scale"]
        bias = var["params"]["s_bias"]
        from ..ops.pallas.coupling import coupling_fwd

        y_flat, ld = coupling_fwd(self._flat2d(z0), self._flat2d(t),
                                  self._flat2d(raw_s), gain, bias)
        return y_flat.reshape(z0.shape), ld, state

    def _inverse_transform(self, var, y0, y1, ctx):
        t, raw_s, state = self._params_st(var, y1, ctx)
        s = jnp.tanh(raw_s) * var["params"]["s_log_scale"] + var["params"]["s_bias"]
        y0 = (y0 - t) * jnp.exp(-s)
        return y0, -sum_except_batch(s), state
