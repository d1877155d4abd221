"""Minimal functional net protocol for (non-bijective) conditioner networks.

Same variables convention as bijectors ({'params', 'state'}) so conditioner
state (batch-norm running stats, spectral-norm power-iteration vectors) nests
inside coupling-layer state and threads through the train step functionally.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..core.bijector import Ctx, Variables


class Net:
    def init(self, key: jax.Array) -> Variables:
        return {"params": {}, "state": {}}

    def apply(self, var: Variables, x: jax.Array, ctx: Ctx):
        """Returns (y, new_state)."""
        raise NotImplementedError


class Sequential(Net):
    def __init__(self, layers: Sequence[Net]):
        self.layers = tuple(layers)

    def init(self, key):
        keys = jax.random.split(key, max(len(self.layers), 1))
        vs = [l.init(k) for l, k in zip(self.layers, keys)]
        return {"params": [v["params"] for v in vs],
                "state": [v["state"] for v in vs]}

    def apply(self, var, x, ctx):
        states = list(var["state"])
        for i, layer in enumerate(self.layers):
            sub = {"params": var["params"][i], "state": var["state"][i]}
            x, states[i] = layer.apply(sub, x, ctx.child(i))
        return x, states


class Activation(Net):
    def __init__(self, fn):
        self.fn = fn

    def apply(self, var, x, ctx):
        return self.fn(x), var["state"]


def relu():
    return Activation(jax.nn.relu)


def elu():
    return Activation(jax.nn.elu)


def softplus():
    return Activation(jax.nn.softplus)
