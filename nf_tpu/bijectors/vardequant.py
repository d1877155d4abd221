"""Variational dequantization head (Flow++, Ho et al. 2019).

No reference counterpart: the reference's image models use a fixed
Logit(0.01) input transform over [0,1]-scaled pixels
(/root/reference/flows/realnvp.py:22, flowpp.py:22) — i.e. uniform-ish
dequantization.  This head learns q(u | x): a conditional flow over the
dequantization noise, trained by the ELBO

    log P(x) >= E_{u~q}[ log p_model((x_q + u)/256) ] - E_q[log q(u|x)]
                - D log 256,

realized WITHIN the bijector protocol: ``forward`` consumes the raw image
x in [0, 1], quantizes to 256 bins, samples u from the conditional flow,
and returns (y, ld) with ld = -log q(u|x) - D log 256, so the model's
standard log_prob/loss over the chain IS the (negative) single-sample
ELBO — no trainer changes needed.  ``inverse`` is the generative
direction: it simply passes the continuous y through (sampling needs no
dequantization), with logdet 0 — consistent with treating the returned
samples as continuous images.

q(u|x) structure: eps ~ N(0, I) -> elementwise affine (mu(x), sigma(x))
-> two x-conditioned checkerboard affine couplings -> sigmoid -> u.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..core.bijector import Bijector
from ..nets.conditioners import ConvNet
from ..ops.math import log_deriv_sigmoid, standard_normal_logprob, \
    sum_except_batch


def _checker_mask(h, w, c, odd):
    m = (jnp.arange(h)[:, None] + jnp.arange(w)[None, :]) % 2
    m = m.astype(jnp.float32)
    if not odd:
        m = 1.0 - m
    return jnp.broadcast_to(m[..., None], (h, w, c))


class VariationalDequant(Bijector):
    def __init__(self, dims, base_filters: int = 32, n_bins: int = 256):
        self.dims = tuple(dims)
        h, w, c = dims
        self.n_bins = n_bins
        # conditional elementwise affine: x -> (mu, log_sigma)
        self.net_affine = ConvNet(c, 2 * c, base_filters)
        # two x-conditioned checkerboard couplings over the noise
        self.masks = [_checker_mask(h, w, c, odd) for odd in (False, True)]
        self.net_couplings = [ConvNet(2 * c, 2 * c, base_filters)
                              for _ in range(2)]

    def init(self, key):
        ks = jax.random.split(key, 3)
        va = self.net_affine.init(ks[0])
        vc = [n.init(k) for n, k in zip(self.net_couplings, ks[1:])]
        return {
            "params": {"affine": va["params"],
                       "couplings": [v["params"] for v in vc]},
            "state": {"affine": va["state"],
                      "couplings": [v["state"] for v in vc]},
        }

    def _flow(self, var, x, eps, ctx):
        """eps -> (u, log q(u|x)); all nets condition on the raw image x."""
        state = {"affine": None, "couplings": [None, None]}
        logq = standard_normal_logprob(eps)

        sub = {"params": var["params"]["affine"],
               "state": var["state"]["affine"]}
        out, state["affine"] = self.net_affine.apply(sub, x, ctx.child(0))
        c = x.shape[-1]
        mu, log_sigma = out[..., :c], jnp.tanh(out[..., c:])
        z = mu + jnp.exp(log_sigma) * eps
        logq = logq - sum_except_batch(log_sigma)

        for i, (mask, net) in enumerate(zip(self.masks, self.net_couplings)):
            sub = {"params": var["params"]["couplings"][i],
                   "state": var["state"]["couplings"][i]}
            inp = jnp.concatenate([x, z * mask], axis=-1)
            out, state["couplings"][i] = net.apply(sub, inp, ctx.child(i + 1))
            s = jnp.tanh(out[..., :c]) * (1.0 - mask)
            t = out[..., c:] * (1.0 - mask)
            z = z * jnp.exp(s) + t
            logq = logq - sum_except_batch(s)

        u = jax.nn.sigmoid(z)
        logq = logq - sum_except_batch(log_deriv_sigmoid(z))
        return u, logq, state

    def forward(self, var, x, ctx):
        h, w, c = self.dims
        d = h * w * c
        nb = float(self.n_bins)
        # quantize to bins (no-op for already-discrete 8-bit/256 data)
        xq = jnp.floor(jnp.clip(x, 0.0, 1.0 - 1e-6) * nb)
        if ctx.rng is None:
            # a silent fixed key would make eval-time likelihoods reuse ONE
            # dequantization sample forever — fail loudly instead; callers
            # must thread an rng (Trainer does; eval paths pass eval keys)
            raise ValueError(
                "VariationalDequant.forward requires ctx.rng (a fresh "
                "dequantization-noise key per call); got None")
        eps = jax.random.normal(ctx.rng, x.shape, x.dtype)
        u, logq, state = self._flow(var, x, eps, ctx)
        y = (xq + u) / nb
        # ELBO correction rides the logdet accumulator
        ld = -logq - d * np.log(nb)
        return y, ld, state

    def inverse(self, var, y, ctx):
        # generative direction: continuous samples pass through unchanged
        return y, jnp.zeros(y.shape[0], jnp.float32), var["state"]
