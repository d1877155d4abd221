"""Core bijector protocol: the invertible-layer algebra of the framework.

Design (TPU-first, functional):
  * A ``Bijector`` object holds ONLY static configuration (shapes, hyper-params).
    All learnable parameters and mutable state live in an explicit pytree of
    ``Variables = {'params': ..., 'state': ...}`` so that every transform is a
    pure function and composes with ``jax.jit`` / ``jax.grad`` / ``jax.vmap`` /
    sharding without special casing.
  * ``forward(var, x, ctx) -> (y, logdet, state)`` maps data -> latent (the
    normalizing direction) and returns the *per-sample* log|det J| contribution
    of this layer, shape ``(B,)``.  ``inverse`` is the generative direction and
    returns the log-det of the inverse map (so that summing the returned
    values along a chain always gives the log-det of the composite map that
    was actually applied).
  * Mutable notions of the reference implementation (ActNorm data-dependent
    init, BatchNorm running statistics, spectral-norm power-iteration vectors)
    become explicit entries of ``state`` that each call returns anew.

This realizes the same contract as the reference's accumulator threading
(/root/reference/flows/modules.py:325-339, where every layer maps
``(x, log_df_dz) -> (y, log_df_dz')``) but in functional form: each layer
returns its own logdet contribution and the composer sums them.
"""
from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

Variables = dict  # {'params': pytree, 'state': pytree}


class Ctx(NamedTuple):
    """Per-call context threaded through a bijector stack.

    ``rng`` is an explicit PRNG key (or None when no stochasticity is needed);
    ``train`` is a *static* Python bool selecting train/eval behavior
    (batch-stat usage, stochastic estimator configs) so that jit traces a
    fixed graph per mode.
    """

    rng: Optional[jax.Array] = None
    train: bool = False

    def child(self, i: int) -> "Ctx":
        """Derive a per-sublayer context with a folded-in PRNG stream."""
        if self.rng is None:
            return self
        return Ctx(jax.random.fold_in(self.rng, i), self.train)


def empty_variables() -> Variables:
    return {"params": {}, "state": {}}


class Bijector:
    """Base class. Subclasses hold static config and implement pure methods."""

    # ------------------------------------------------------------------ init
    def init(self, key: jax.Array) -> Variables:
        """Create the parameter/state pytree for this bijector."""
        return empty_variables()

    # --------------------------------------------------------------- running
    def forward(self, var: Variables, x: jax.Array, ctx: Ctx):
        """data -> latent. Returns ``(y, logdet, new_state)``."""
        raise NotImplementedError

    def inverse(self, var: Variables, y: jax.Array, ctx: Ctx):
        """latent -> data. Returns ``(x, logdet, new_state)``."""
        raise NotImplementedError

    # ------------------------------------------------- data-dependent init
    def dd_init(self, var: Variables, x: jax.Array, ctx: Ctx):
        """One-time data-dependent initialization pass.

        Returns ``(new_var, y)`` where ``y`` is the forward-transformed batch
        used to initialize downstream layers.  Default: no data-dependent
        parameters; runs a plain forward (train ctx) and keeps variables.
        Layers like ActNorm override this (reference behavior at
        /root/reference/flows/modules.py:237-244, done as an explicit pass
        here instead of first-call mutation so it is jit/shard-safe and
        checkpoint-resume does not silently re-initialize).
        """
        y, _, state = self.forward(var, x, ctx)
        return {"params": var["params"], "state": state}, y


class Chain(Bijector):
    """Sequential composition of bijectors.

    Forward applies layers in order and sums per-layer logdets; inverse
    applies them in reverse.  Equivalent to the reference ``Compose``
    (/root/reference/flows/modules.py:325-339).

    ``remat=True`` wraps each layer in ``jax.checkpoint``: activations are
    recomputed in the backward pass instead of stored — the standard
    HBM-for-FLOPs trade for deep multi-scale image stacks.
    """

    def __init__(self, layers: Sequence[Bijector], remat: bool = False):
        self.layers = tuple(layers)
        self.remat = remat

    def init(self, key: jax.Array) -> Variables:
        keys = jax.random.split(key, max(len(self.layers), 1))
        vs = [l.init(k) for l, k in zip(self.layers, keys)]
        return {
            "params": [v["params"] for v in vs],
            "state": [v["state"] for v in vs],
        }

    @staticmethod
    def _sub(var: Variables, i: int) -> Variables:
        return {"params": var["params"][i], "state": var["state"][i]}

    def _layer_fwd(self, i: int, train: bool):
        layer = self.layers[i]

        def fn(sub_var, x, rng):
            return layer.forward(sub_var, x, Ctx(rng=rng, train=train))

        if self.remat:
            fn = jax.checkpoint(fn)
        return fn

    def forward(self, var, x, ctx):
        logdet = jnp.zeros(x.shape[0], dtype=jnp.float32)
        states = list(var["state"])
        for i in range(len(self.layers)):
            child = ctx.child(i)
            x, ld, states[i] = self._layer_fwd(i, ctx.train)(
                self._sub(var, i), x, child.rng)
            logdet = logdet + ld
        return x, logdet, states

    def inverse(self, var, y, ctx):
        logdet = jnp.zeros(y.shape[0], dtype=jnp.float32)
        states = list(var["state"])
        n = len(self.layers)
        for i in reversed(range(n)):
            layer = self.layers[i]
            y, ld, states[i] = layer.inverse(self._sub(var, i), y, ctx.child(i))
            logdet = logdet + ld
        return y, logdet, states

    def dd_init(self, var, x, ctx):
        params = list(var["params"])
        states = list(var["state"])
        for i, layer in enumerate(self.layers):
            v, x = layer.dd_init(self._sub(var, i), x, ctx.child(i))
            params[i] = v["params"]
            states[i] = v["state"]
        return {"params": params, "state": states}, x


class Inverted(Bijector):
    """Swap forward and inverse of a wrapped bijector."""

    def __init__(self, inner: Bijector):
        self.inner = inner

    def init(self, key):
        return self.inner.init(key)

    def forward(self, var, x, ctx):
        return self.inner.inverse(var, x, ctx)

    def inverse(self, var, y, ctx):
        return self.inner.forward(var, y, ctx)
