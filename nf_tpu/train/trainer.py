"""Training engine: optimizer, jitted/sharded train step, sampling, eval.

Behavior parity: the ``Model`` class at /root/reference/main.py:38-133 —
Adam/RMSprop with step-decay LR, mean-NLL loss in nats, sampling and density
evaluation — re-designed TPU-first:
  * one fused, jitted train step (forward + NLL + grad + optimizer update +
    state update) with donated buffers — no per-step host sync;
  * optional device mesh: the batch axis is sharded over the mesh's 'data'
    axis and parameters are replicated, so the same step function runs
    single-chip or multi-chip (XLA inserts the psum for the gradient
    all-reduce over ICI);
  * explicit PRNG threading (per-step fold_in) for stochastic estimators.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.bijector import Ctx
from ..models.base import FlowModel


class TrainState(NamedTuple):
    params: Any
    state: Any
    opt_state: Any
    step: jax.Array

    @property
    def var(self):
        """Model variables pytree ({'params', 'state'}) — the form
        FlowModel methods and eval_program take."""
        return {"params": self.params, "state": self.state}


def make_optimizer(cfg) -> optax.GradientTransformation:
    """Adam/RMSprop + staircase step decay (reference StepLR, main.py:56-70)."""
    schedule = optax.exponential_decay(
        init_value=cfg.lr,
        transition_steps=cfg.decay_steps,
        decay_rate=cfg.decay_ratio,
        staircase=True,
    )
    if cfg.name == "adam":
        opt = optax.adam(schedule, b1=cfg.beta1, b2=cfg.beta2)
    elif cfg.name == "rmsprop":
        opt = optax.rmsprop(schedule)
    else:
        raise ValueError(f"unsupported optimizer {cfg.name!r}")
    if cfg.weight_decay > 0.0:
        opt = optax.chain(optax.add_decayed_weights(cfg.weight_decay), opt)
    return opt


class Trainer:
    def __init__(self, model: FlowModel, opt_cfg, mesh=None, seed: int = 42):
        self.model = model
        self.optimizer = make_optimizer(opt_cfg)
        self.mesh = mesh
        self.base_key = jax.random.PRNGKey(seed)
        if jax.process_count() > 1:
            self.base_key = jax.random.fold_in(self.base_key, jax.process_index())

        self._train_step = self._build_train_step()
        self._train_chunk = jax.jit(self._chunk_fn, donate_argnums=(0,))
        self._eval_logp = jax.jit(self._eval_logp_fn)
        self._eval_logp_rng = jax.jit(self._eval_logp_rng_fn)
        self._sample = jax.jit(self._sample_fn, static_argnums=(2,))
        self._fwd = jax.jit(self._fwd_fn)

    # ------------------------------------------------------------------ init
    def init_state(self, key: jax.Array, sample_batch=None) -> TrainState:
        var = self.model.init(key)
        if sample_batch is not None:
            var = self.model.data_dependent_init(
                var, jnp.asarray(sample_batch), rng=jax.random.fold_in(key, 1))
        opt_state = self.optimizer.init(var["params"])
        ts = TrainState(var["params"], var["state"], opt_state,
                        jnp.zeros((), jnp.int32))
        if jax.process_count() > 1:
            # data-dependent init ran on this host's local batch; make the
            # starting state identical everywhere (host-0 wins) before
            # replicating — otherwise params silently diverge per process
            from jax.experimental import multihost_utils
            ts = multihost_utils.broadcast_one_to_all(ts)
        if self.mesh is not None:
            from ..parallel.sharding import shard_train_state
            ts = shard_train_state(ts, self.mesh)
        else:
            # COMMIT every leaf to its device.  Freshly created scalars
            # (ts.step, optax counts) are uncommitted; after one train
            # step the returned state's leaves are committed, which
            # changes the jit signature and silently compiles the whole
            # train step a SECOND time — ~25 extra minutes for the
            # unrolled 16x16 flow++ stack (round-3's "compile-time
            # pathology", see COMPILE_PROFILE.json / scripts/
            # compile_profile.py).  An explicit device_put pins the
            # signature from the first call.
            ts = jax.device_put(ts, jax.local_devices()[0])
        return ts

    # ------------------------------------------------------------ step fns
    def _loss_fn(self, params, state, batch, rng):
        var = {"params": params, "state": state}
        logp, new_state = self.model.log_prob(var, batch, Ctx(rng=rng, train=True))
        return -jnp.mean(logp), new_state

    def _step_fn(self, ts: TrainState, batch, base_key):
        rng = jax.random.fold_in(base_key, ts.step)
        (loss, new_state), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
            ts.params, ts.state, batch, rng)
        updates, opt_state = self.optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        return TrainState(params, new_state, opt_state, ts.step + 1), loss

    def _build_train_step(self):
        if self.mesh is None:
            return jax.jit(self._step_fn, donate_argnums=(0,))
        from jax.sharding import NamedSharding, PartitionSpec as P
        batch_sharding = NamedSharding(self.mesh, P("data"))
        rep = NamedSharding(self.mesh, P())
        return jax.jit(
            self._step_fn,
            donate_argnums=(0,),
            in_shardings=(None, batch_sharding, rep),
            out_shardings=(None, rep),
        )

    def _chunk_fn(self, ts: TrainState, batches, base_key):
        """K fused optimizer steps under one dispatch (lax.scan).

        ``batches``: (K, B, ...) pre-staged on device.  Amortizes host->
        device dispatch latency — the dominant cost for small models over
        a remote-tunnel backend — by ~K x.  Returns (ts, losses[K]).
        """

        def body(carry, batch):
            carry, loss = self._step_fn(carry, batch, base_key)
            return carry, loss

        return jax.lax.scan(body, ts, batches)

    def _eval_logp_fn(self, params, state, batch):
        var = {"params": params, "state": state}
        logp, _ = self.model.log_prob(var, batch, Ctx(rng=None, train=False))
        return logp

    def _eval_logp_rng_fn(self, params, state, batch, key):
        var = {"params": params, "state": state}
        logp, _ = self.model.log_prob(var, batch, Ctx(rng=key, train=False))
        return logp

    def _fwd_fn(self, params, state, batch):
        var = {"params": params, "state": state}
        z, logdet, _ = self.model.forward(var, batch, Ctx(rng=None, train=False))
        return z, logdet

    def _sample_fn(self, ts: TrainState, key, n: int):
        var = {"params": ts.params, "state": ts.state}
        y, log_py, _ = self.model.sample(var, key, n, Ctx(rng=key, train=False))
        return y, log_py

    # ------------------------------------------------------------- public
    def train_step(self, ts: TrainState, batch) -> tuple:
        batch = self._device_put_batch(batch)
        return self._train_step(ts, batch, self.base_key)

    def train_steps(self, ts: TrainState, batches) -> tuple:
        """Run K steps in one dispatch; ``batches`` is (K, B, ...).
        Returns (ts, losses[K])."""
        batches = jnp.asarray(batches)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            batches = jax.device_put(
                batches, NamedSharding(self.mesh, P(None, "data")))
        return self._train_chunk(ts, batches, self.base_key)

    def _device_put_batch(self, batch):
        batch = jnp.asarray(batch)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            batch = jax.device_put(batch, NamedSharding(self.mesh, P("data")))
        return batch

    def log_prob(self, ts: TrainState, batch, rng=None):
        """Eval-mode log p(batch).  ``rng`` is required for models with a
        stochastic eval pass (variational dequantization draws a fresh
        dequant-noise sample per call); deterministic models ignore it."""
        if rng is not None:
            return self._eval_logp_rng(ts.params, ts.state,
                                       jnp.asarray(batch), rng)
        return self._eval_logp(ts.params, ts.state, jnp.asarray(batch))

    def forward(self, ts: TrainState, batch):
        return self._fwd(ts.params, ts.state, jnp.asarray(batch))

    def sample(self, ts: TrainState, key, n: int):
        return self._sample(ts, key, n)
