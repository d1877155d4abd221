"""FlowModel: the user-facing wrapper around a bijector stack.

Behavior parity: the reference model protocol — ``forward(y) -> (z,
log_det)`` (normalizing) and ``backward(z) -> (y, log_det)`` (generative),
both starting the accumulator at zero (e.g. /root/reference/flows/
realnvp.py:57-63) — plus the density/sampling math of ``Model``
(/root/reference/main.py:78-133) under a standard-normal base.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.bijector import Bijector, Chain, Ctx, Variables
from ..ops.math import standard_normal_logprob


class FlowModel:
    def __init__(self, name: str, bijector: Bijector, dims: Tuple[int, ...]):
        self.name = name
        self.bijector = bijector
        self.dims = tuple(dims)
        self.dimension = 1
        for d in self.dims:
            self.dimension *= d

    # ------------------------------------------------------------ variables
    def init(self, key: jax.Array) -> Variables:
        """Initialize on the host CPU backend, then place on the default
        device.  Init is hundreds of tiny eager ops, and per-op dispatch
        latency to a remote-attached TPU is ~100x a local CPU op — so the
        math runs on CPU and the finished pytree moves in ONE batched
        transfer.  (Returning the committed-to-CPU arrays directly would
        silently pin any jit over them to the CPU backend.)"""
        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu = None
        if cpu is None:
            return self.bijector.init(key)
        with jax.default_device(cpu):
            var = self.bijector.init(jax.device_put(key, cpu))
        return jax.device_put(var, jax.devices()[0])

    def data_dependent_init(self, var: Variables, batch, rng=None) -> Variables:
        """Run the one-time data-dependent init pass (ActNorm et al.).

        Jitted into a single program: running it eagerly dispatches hundreds
        of tiny ops, which is pathologically slow over remote-attached TPUs.
        """
        if rng is None:
            rng = jax.random.PRNGKey(0)

        def _dd(v, x, key):
            new_var, _ = self.bijector.dd_init(v, x, Ctx(rng=key, train=True))
            return new_var

        return jax.jit(_dd)(var, batch, rng)

    # ------------------------------------------------------------- running
    def forward(self, var, y, ctx: Ctx):
        """data -> latent; returns (z, log|det J|, state)."""
        return self.bijector.forward(var, y, ctx)

    def inverse(self, var, z, ctx: Ctx):
        """latent -> data; returns (y, logdet of the inverse map, state)."""
        return self.bijector.inverse(var, z, ctx)

    def log_prob(self, var, y, ctx: Ctx):
        """log p(y) = log N(z) + log|det dz/dy|; returns ((B,), state)."""
        z, logdet, state = self.forward(var, y, ctx)
        return standard_normal_logprob(z) + logdet, state

    def sample(self, var, key: jax.Array, n: int, ctx: Ctx):
        """Draw n samples; returns (y, log p(y), state)."""
        z = jax.random.normal(key, (n,) + self.dims)
        y, logdet_inv, state = self.inverse(var, z, ctx)
        # log p(y) = log N(z) + log|det dz/dy| = log N(z) - logdet_inv
        log_py = standard_normal_logprob(z) - logdet_inv
        return y, log_py, state
