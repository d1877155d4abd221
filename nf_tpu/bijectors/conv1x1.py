"""Invertible 1x1 convolution with PLU parameterization (Glow).

Behavior parity: /root/reference/flows/modules.py:441-497 —
  * init: orthogonal W -> LU factorization -> fixed permutation P, learned
    strictly-lower L, strictly-upper U, learned log|s| with fixed sign(s);
  * forward: y = W x per channel vector, logdet = sum(log_s) * n_pixels;
  * inverse: triangular solves (the reference calls torch.lu_solve under
    no_grad; here the inverse is differentiable for free).

TPU notes: the channel contraction is an (..., C) @ (C, C) matmul on the
minor-most axis — MXU-friendly, no transposes in NHWC.  The inverse uses
two jax.scipy triangular solves against P^T y.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.bijector import Bijector


def _num_pixels(x):
    n = 1
    for s in x.shape[1:-1]:
        n *= s
    return n


class InvertibleConv1x1(Bijector):
    def __init__(self, num_channels: int):
        self.num_channels = num_channels

    def init(self, key):
        c = self.num_channels
        w = jax.random.orthogonal(key, c)
        # LU with partial pivoting (host-side, init only)
        import scipy.linalg

        p, l, u = scipy.linalg.lu(np.asarray(w))
        s = np.diag(u)
        return {
            "params": {
                "L": jnp.asarray(l),
                "U": jnp.asarray(np.triu(u, k=1)),
                "log_s": jnp.asarray(np.log(np.abs(s)), dtype=jnp.float32),
            },
            "state": {
                "P": jnp.asarray(p, dtype=jnp.float32),
                "sign_s": jnp.asarray(np.sign(s), dtype=jnp.float32),
            },
        }

    def _factors(self, var):
        c = self.num_channels
        p_ = var["params"]
        eye = jnp.eye(c, dtype=jnp.float32)
        L = jnp.tril(p_["L"], k=-1) + eye
        U = jnp.triu(p_["U"], k=1) + jnp.diag(
            var["state"]["sign_s"] * jnp.exp(p_["log_s"]))
        return var["state"]["P"], L, U

    def forward(self, var, x, ctx):
        P, L, U = self._factors(var)
        W = P @ L @ U
        # (..., C) @ (C, C): contract channels on the right -> x W^T
        y = jnp.einsum("...c,dc->...d", x, W)
        ld = jnp.sum(var["params"]["log_s"]) * _num_pixels(x)
        return y, jnp.full((x.shape[0],), ld, jnp.float32), var["state"]

    def inverse(self, var, y, ctx):
        P, L, U = self._factors(var)
        # solve W x = y  with W = P L U:  x = U^{-1} L^{-1} P^T y
        flat = y.reshape(-1, self.num_channels).T  # (C, N)
        rhs = P.T @ flat
        z = jax.scipy.linalg.solve_triangular(L, rhs, lower=True, unit_diagonal=True)
        x = jax.scipy.linalg.solve_triangular(U, z, lower=False)
        x = x.T.reshape(y.shape)
        ld = -jnp.sum(var["params"]["log_s"]) * _num_pixels(y)
        return x, jnp.full((y.shape[0],), ld, jnp.float32), var["state"]
