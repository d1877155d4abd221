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


def _static_desc(obj):
    """Canonical description of an object's static configuration.

    Used to verify ScannedChain blocks are interchangeable: the scan traces
    ONLY blocks[0], so any static-config difference between blocks (coupling
    parity, masking mode, net widths) that doesn't change parameter shapes
    would otherwise run silently wrong.
    """
    if isinstance(obj, (int, float, bool, str, bytes, type(None))):
        return obj
    if isinstance(obj, (tuple, list)):
        return tuple(_static_desc(o) for o in obj)
    if isinstance(obj, dict):
        return tuple(sorted((k, _static_desc(v)) for k, v in obj.items()))
    if hasattr(obj, "shape") and hasattr(obj, "dtype"):  # concrete array
        import numpy as np
        a = np.asarray(obj)
        return ("array", a.shape, str(a.dtype), a.tobytes())
    if hasattr(obj, "__dict__"):
        return (type(obj).__name__,
                tuple(sorted((k, _static_desc(v))
                             for k, v in vars(obj).items())))
    return (type(obj).__name__, repr(obj))


class ScannedChain(Bijector):
    """Composition of structurally identical blocks as ONE ``lax.scan``.

    Where ``Chain`` unrolls every layer into the traced graph (compile time
    and program size grow linearly with depth — tens of minutes for the
    ~200-layer multi-scale image stacks), ``ScannedChain`` traces a single
    block and scans it over parameters stacked on a leading repeat axis:
    compile time is O(1) in depth, execution is a native on-device loop.
    This is the TPU-idiomatic form for the zoo's repeated structures
    (SURVEY.md §7: "compiler-friendly control flow").

    Blocks must share parameter/state tree structure and leaf shapes
    (checked at init).  Alternating-parity couplings satisfy this by
    pairing: make each block [norm, coupling(even), norm, coupling(odd)].

    The logdet/state contract is identical to ``Chain``; per-block PRNG
    streams fold the repeat index exactly like ``Ctx.child``.

    ``remat=True`` checkpoints the scanned block: only the carry survives
    each iteration and intra-block activations are recomputed in the
    backward pass — the canonical scan-over-remat-block memory shape for
    deep stacks on TPU.
    """

    def __init__(self, blocks: Sequence[Bijector], remat: bool = False):
        assert len(blocks) >= 1
        ref_desc = _static_desc(blocks[0])
        for i, b in enumerate(blocks[1:], 1):
            if _static_desc(b) != ref_desc:
                raise ValueError(
                    f"ScannedChain blocks must share static configuration "
                    f"(the scan traces only block 0), but block {i} differs "
                    f"from block 0. For alternating-parity couplings, pair "
                    f"layers so each block covers one full period (e.g. "
                    f"[norm, coupling(even), norm, coupling(odd)]).")
        self.blocks = tuple(blocks)
        self.n = len(blocks)
        self.remat = remat

    def init(self, key: jax.Array) -> Variables:
        keys = jax.random.split(key, self.n)
        vs = [b.init(k) for b, k in zip(self.blocks, keys)]
        ref = jax.tree_util.tree_structure(vs[0])
        for i, v in enumerate(vs[1:], 1):
            got = jax.tree_util.tree_structure(v)
            if got != ref:
                raise ValueError(
                    f"ScannedChain block {i} has a different variable "
                    f"structure than block 0: {got} vs {ref}")
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *vs)
        return stacked

    def _rngs(self, ctx: Ctx):
        if ctx.rng is None:
            return jnp.zeros((self.n, 2), jnp.uint32), False
        keys = jax.vmap(lambda i: jax.random.fold_in(ctx.rng, i))(
            jnp.arange(self.n))
        return keys, True

    def _apply(self, method_name: str):
        block = self.blocks[0]

        def fn(sub, x, key, train):
            c = Ctx(rng=key, train=train)
            return getattr(block, method_name)(sub, x, c)

        if self.remat:
            fn = jax.checkpoint(fn, static_argnums=(3,))
        return fn

    def forward(self, var, x, ctx):
        keys, has_rng = self._rngs(ctx)
        step = self._apply("forward")
        train = ctx.train

        def body(carry, xs):
            x, ld = carry
            sub, key = xs
            y, ldi, st = step(sub, x, key if has_rng else None, train)
            return (y, ld + ldi), st

        ld0 = jnp.zeros(x.shape[0], jnp.float32)
        (x, ld), states = jax.lax.scan(body, (x, ld0), (var, keys))
        return x, ld, states

    def inverse(self, var, y, ctx):
        keys, has_rng = self._rngs(ctx)
        step = self._apply("inverse")
        train = ctx.train

        def body(carry, xs):
            y, ld = carry
            sub, key = xs
            x, ldi, st = step(sub, y, key if has_rng else None, train)
            return (x, ld + ldi), st

        ld0 = jnp.zeros(y.shape[0], jnp.float32)
        (y, ld), states = jax.lax.scan(body, (y, ld0), (var, keys),
                                       reverse=True)
        return y, ld, states

    def dd_init(self, var, x, ctx):
        keys, has_rng = self._rngs(ctx)
        block = self.blocks[0]
        train = ctx.train

        def body(x, xs):
            sub, key = xs
            c = Ctx(rng=key if has_rng else None, train=train)
            new_var, y = block.dd_init(sub, x, c)
            return y, new_var

        x, new_vars = jax.lax.scan(body, x, (var, keys))
        return new_vars, x


def scan_repeated(layers: Sequence[Bijector], period: int,
                  remat: bool = False) -> Bijector:
    """Fold a flat list of layers with a repeating ``period``-layer pattern
    into a ``ScannedChain`` of blocks (plus a plain tail for any remainder).

    The builder supplies ``period`` — the number of consecutive layers after
    which the structure repeats with identical parameter shapes (e.g. a
    Glow step with alternating coupling parity repeats every
    2 x [ActNorm, InvConv1x1, Coupling] = 6 layers).  Falls back to a plain
    ``Chain`` when there are fewer than two full blocks (scan would only add
    loop overhead).
    """
    n_blocks = len(layers) // period
    if n_blocks < 2:
        return Chain(layers, remat=remat)
    blocks = [Chain(layers[i * period:(i + 1) * period])
              for i in range(n_blocks)]
    scanned = ScannedChain(blocks, remat=remat)
    tail = list(layers[n_blocks * period:])
    if tail:
        return Chain([scanned] + tail, remat=False)
    return scanned
