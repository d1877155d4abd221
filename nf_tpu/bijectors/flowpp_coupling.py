"""Flow++ logistic-mixture attention coupling.

Behavior parity: /root/reference/flows/coupling.py:125-210 —
  * conditioner: in-proj -> Gated(Linear|Conv) -> LayerNorm -> GatedAttn ->
    LayerNorm -> out-proj emitting (a, b, logpi, mu, s) along channels;
  * transform: z0 -> logit(MixLogCDF(z0)) -> z0 * exp(a) + b with gated
    a = tanh(raw) * a_log_scale + a_bias.  The CDF->logit composition is
    fused in log space (bijectors/mixlogcdf.py:mix_log_cdf_logit_forward),
    a deliberate numerical improvement over the reference's clamped chain;
  * inverse: affine undo -> logit-space Newton MixLogCDF^-1.

Channel bookkeeping is channels-last: the five parameter groups are sliced
off the last axis; mixture tensors reshape (..., out*K) -> (..., out, K)
(k-major like the reference's view(B, K, *C), transposed to lane-minor).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.bijector import Ctx
from ..nets.core import Sequential
from ..nets.gated import GatedAttn, GatedConv2d, GatedLinear, LayerNormNet
from ..nets.layers import Conv2d, Dense
from ..ops.math import sum_except_batch
from .coupling import _CouplingBase
from .mixlogcdf import (mix_log_cdf_logit_forward,
                        mix_log_cdf_logit_inverse)


class MixLogAttnCoupling(_CouplingBase):
    def __init__(self, dims, masking="checkerboard", odd=False,
                 base_filters: int = 32, n_mixtures: int = 4):
        super().__init__(dims, masking, odd)
        self.n_mixtures = n_mixtures
        out_chs, in_chs = self.half_dims()
        self.out_chs = out_chs
        n_out = out_chs * (2 + 3 * n_mixtures)

        if len(self.dims) == 1:
            mid_shape = (base_filters,)
            self.net = Sequential([
                Dense(in_chs, base_filters, weight_norm=False),
                GatedLinear(base_filters),
                LayerNormNet(mid_shape),
                GatedAttn(mid_shape, base_filters),
                LayerNormNet(mid_shape),
                Dense(base_filters, n_out, weight_norm=False),
            ])
        else:
            h, w, _ = self.dims
            if masking == "checkerboard":
                mid_shape = (h // 2, w // 2, base_filters)
            else:
                mid_shape = (h, w, base_filters)
            self.net = Sequential([
                Conv2d(in_chs, base_filters, 3, weight_norm=False),
                GatedConv2d(base_filters),
                LayerNormNet(mid_shape),
                GatedAttn(mid_shape, base_filters),
                LayerNormNet(mid_shape),
                Conv2d(base_filters, n_out, 3, weight_norm=False),
            ])

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        v = self.net.init(k1)
        return {
            "params": {
                "net": v["params"],
                "a_log_scale": jax.random.normal(k2, (1,)) * 0.01,
                "a_bias": jax.random.normal(k3, (1,)) * 0.01,
            },
            "state": {"net": v["state"]},
        }

    def _cond_params(self, var, z1, ctx):
        sub = {"params": var["params"]["net"], "state": var["state"]["net"]}
        raw, net_state = self.net.apply(sub, z1, ctx.child(0))
        oc, K = self.out_chs, self.n_mixtures
        a = raw[..., :oc]
        b = raw[..., oc : 2 * oc]

        def mix(t):  # (..., oc*K) -> (..., oc, K), k-major like the reference
            return t.reshape(t.shape[:-1] + (K, oc)).swapaxes(-1, -2)

        logpi = mix(raw[..., 2 * oc : 2 * oc + oc * K])
        mu = mix(raw[..., 2 * oc + oc * K : 2 * oc + 2 * oc * K])
        s = mix(raw[..., 2 * oc + 2 * oc * K :])
        logpi = jax.nn.log_softmax(logpi, axis=-1)
        a = jnp.tanh(a) * var["params"]["a_log_scale"] + var["params"]["a_bias"]
        return a, b, logpi, mu, s, {"net": net_state}

    def _transform(self, var, z0, z1, ctx):
        a, b, logpi, mu, s, state = self._cond_params(var, z1, ctx)

        # fused logit(MixLogCDF(.)) in log space — replaces the reference's
        # MixLogCDF -> clamp -> Logit chain, whose clamp both loses
        # precision and creates a free-log-det saturation exploit under
        # training (see mix_log_cdf_logit_forward)
        z0, ld = mix_log_cdf_logit_forward(z0, logpi, mu, s)

        z0 = z0 * jnp.exp(a) + b
        ld = ld + sum_except_batch(a)
        return z0, ld, state

    def _inverse_transform(self, var, y0, y1, ctx):
        a, b, logpi, mu, s, state = self._cond_params(var, y1, ctx)

        y0 = (y0 - b) * jnp.exp(-a)
        ld = -sum_except_batch(a)

        y0, ld_m = mix_log_cdf_logit_inverse(y0, logpi, mu, s)
        return y0, ld + ld_m, state
