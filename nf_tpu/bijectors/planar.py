"""Planar transform: z' = z + u * tanh(w.z + b).

Behavior parity: /root/reference/flows/planar.py:9-68 —
  * the u-projection invertibility constraint (u_hat = u + (softplus(w.u) -
    1 - w.u) * w/||w||^2 when w.u < -1) is applied inside forward; the
    reference mutates the parameter in place each call (planar.py:23-36),
    here it is a pure reparameterization (differentiable, standard practice);
  * logdet = log|1 + (w.u) tanh'(w.z + b)| + 1e-5 guard;
  * inverse: scalar bisection on a = w.z (the transform only moves z along
    u, and w.z' = w.z + (w.u) tanh(w.z + b) is monotone in w.z) — fixed-trip
    fori_loop (planar.py:51-62 uses 100 iters + early break).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.bijector import Bijector
from ..ops.bisect import bisect_monotone
from ..ops.math import deriv_tanh


class PlanarTransform(Bijector):
    def __init__(self, dim: int):
        self.dim = dim

    def init(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "params": {
                "u": jax.random.normal(k1, (self.dim,)) * 0.01,
                "w": jax.random.normal(k2, (self.dim,)) * 0.01,
                "b": jax.random.normal(k3, (1,)) * 0.01,
            },
            "state": {},
        }

    def _constrained(self, p):
        u, w, b = p["u"], p["w"], p["b"]
        wu = jnp.dot(w, u)
        w_unit = w / (jnp.dot(w, w) + 1e-12)
        u_hat = u + (-1.0 + jax.nn.softplus(wu) - wu) * w_unit
        u = jnp.where(wu < -1.0, u_hat, u)
        return u, w, b, jnp.dot(w, u)

    def forward(self, var, z, ctx):
        u, w, b, wu = self._constrained(var["params"])
        affine = z @ w + b  # (B,)
        y = z + u[None, :] * jnp.tanh(affine)[:, None]
        det = 1.0 + wu * deriv_tanh(affine)
        ld = jnp.log(jnp.abs(det) + 1.0e-5)
        return y, ld, var["state"]

    def inverse(self, var, y, ctx):
        u, w, b, wu = self._constrained(var["params"])
        wy = y @ w  # (B,) = w.z + wu * tanh(w.z + b)

        fn = lambda a: a + wu * jnp.tanh(a + b[0])
        lo = jnp.full_like(wy, -1.0e3)
        hi = jnp.full_like(wy, 1.0e3)
        a = bisect_monotone(fn, wy, lo, hi, n_iters=64)

        affine = a + b[0]
        z = y - u[None, :] * jnp.tanh(affine)[:, None]
        det = 1.0 + wu * deriv_tanh(affine)
        ld = -jnp.log(jnp.abs(det) + 1.0e-5)
        return z, ld, var["state"]
