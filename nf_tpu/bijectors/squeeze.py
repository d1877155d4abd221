"""Volume-preserving squeeze/unsqueeze bijector wrappers.

Behavior parity: /root/reference/flows/squeeze.py:114-189 — logdet is
unchanged; forward of Squeeze2d = space-to-depth + channel concat of the two
halves, backward undoes it (NHWC here).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.bijector import Bijector
from ..ops import squeeze as sq


def _zeros(x):
    return jnp.zeros(x.shape[0], jnp.float32)


class Squeeze1d(Bijector):
    def __init__(self, odd: bool = False):
        self.odd = odd

    def forward(self, var, z, ctx):
        z0, z1 = sq.squeeze1d(z, self.odd)
        return jnp.concatenate([z0, z1], axis=1), _zeros(z), var["state"]

    def inverse(self, var, z, ctx):
        h = z.shape[1] // 2
        return sq.unsqueeze1d(z[:, :h], z[:, h:], self.odd), _zeros(z), var["state"]


class Unsqueeze1d(Bijector):
    def __init__(self, odd: bool = False):
        self.odd = odd

    def forward(self, var, z, ctx):
        h = z.shape[1] // 2
        return sq.unsqueeze1d(z[:, :h], z[:, h:], self.odd), _zeros(z), var["state"]

    def inverse(self, var, z, ctx):
        z0, z1 = sq.squeeze1d(z, self.odd)
        return jnp.concatenate([z0, z1], axis=1), _zeros(z), var["state"]


class Squeeze2d(Bijector):
    """(B,H,W,C) -> (B,H/2,W/2,4C)."""

    def __init__(self, odd: bool = False):
        self.odd = odd

    def forward(self, var, z, ctx):
        z0, z1 = sq.squeeze2d(z, self.odd)
        return jnp.concatenate([z0, z1], axis=-1), _zeros(z), var["state"]

    def inverse(self, var, z, ctx):
        h = z.shape[-1] // 2
        return sq.unsqueeze2d(z[..., :h], z[..., h:], self.odd), _zeros(z), var["state"]


class Flatten(Bijector):
    """(B, *dims) <-> (B, prod(dims)); volume-preserving (logdet 0).

    No reference counterpart — used by the beyond-parity image variants of
    vector-native models (MAF), which the reference declines to support
    (flows/maf.py:131-132)."""

    def __init__(self, dims):
        self.dims = tuple(dims)
        d = 1
        for s in self.dims:
            d *= s
        self.flat_dim = d

    def forward(self, var, z, ctx):
        return z.reshape(z.shape[0], self.flat_dim), _zeros(z), var["state"]

    def inverse(self, var, z, ctx):
        return z.reshape((z.shape[0],) + self.dims), _zeros(z), var["state"]


class Unsqueeze2d(Bijector):
    """(B,H,W,4C) -> (B,2H,2W,C)."""

    def __init__(self, odd: bool = False):
        self.odd = odd

    def forward(self, var, z, ctx):
        h = z.shape[-1] // 2
        return sq.unsqueeze2d(z[..., :h], z[..., h:], self.odd), _zeros(z), var["state"]

    def inverse(self, var, z, ctx):
        z0, z1 = sq.squeeze2d(z, self.odd)
        return jnp.concatenate([z0, z1], axis=-1), _zeros(z), var["state"]
