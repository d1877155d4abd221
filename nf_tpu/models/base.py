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
        # local_devices, not devices: under multi-process, global device 0
        # is not addressable from non-zero processes
        return jax.device_put(var, jax.local_devices()[0])

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

    # ------------------------------------------------------- fused eval path
    @property
    def _fused_spec(self):
        """Structural match for the whole-stack fused eval kernel
        (ops/pallas/fused_stack.py); computed once, None when not
        applicable.  Training always uses the Chain path."""
        if not hasattr(self, "_fused_spec_cache"):
            spec = None
            if isinstance(self.bijector, Chain):
                from ..ops.pallas.fused_flowpp import extract_flowpp_spec
                from ..ops.pallas.fused_resflow import extract_resflow_spec
                from ..ops.pallas.fused_stack import extract_stack_spec
                spec = extract_stack_spec(self.bijector, self.dims)
                if spec is None:
                    spec = extract_flowpp_spec(self.bijector, self.dims)
                if spec is None:
                    spec = extract_resflow_spec(self.bijector, self.dims)
            self._fused_spec_cache = spec
        return self._fused_spec_cache

    def eval_program(self, var) -> "EvalProgram":
        """Compile a serving program for fixed parameters.

        Packs the stack's weights ONCE (weight-norm resolution, batch-norm
        eval affines, PLU re-composition, constant log-dets — ~300 tiny ops
        that would otherwise run on every call) and returns jitted
        forward / inverse / log_prob / sample closures.  On TPU, models
        matching the fused-stack pattern run as ONE whole-stack Pallas
        kernel per call (ops/pallas/fused_stack.py); everything else gets
        the jitted Chain.  This is the intended inference/serving entry
        point — the per-call `forward`/`inverse` methods re-derive packed
        weights inside the caller's jit and cannot amortize them.
        """
        return EvalProgram(self, var)

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


class EvalProgram:
    """Jitted inference program over FIXED parameters (see
    FlowModel.eval_program).  Weights are packed and layout-settled once at
    construction; each call is then a single kernel launch on TPU for
    fused-stack models."""

    def __init__(self, model: FlowModel, var):
        self.model = model
        self.dims = model.dims
        spec = model._fused_spec
        on_tpu = jax.devices()[0].platform == "tpu"
        self._ctx = Ctx(rng=None, train=False)

        if spec is not None and on_tpu and \
                getattr(spec, "kind", "affine") == "resflow":
            # ResFlow: fuse the fixed-point SOLVE (the 20.9 ms of the
            # 29.9 ms inverse, RESFLOW_FIXPOINT_PROBE.json) into one
            # kernel; the log-det series estimator keeps its XLA path by
            # replaying one forward at the solved x — forward from the
            # solved x reproduces every block's solved input exactly
            # (x_j + g(x_j) = z_j), so estimator values and rng semantics
            # match the chain inverse.
            from ..ops.pallas.fused_resflow import (call_fwd_logdet,
                                                    call_solve,
                                                    call_solve_logdet,
                                                    make_solve_kernel,
                                                    pack_resflow)
            import os as _os
            import numpy as _np
            bij = model.bijector
            packed = jax.jit(lambda v: pack_resflow(bij, spec, v))(var)
            packed = jax.tree.map(
                lambda a: jax.device_put(_np.asarray(a)), packed)
            kern = make_solve_kernel(spec)
            var_f = jax.tree.map(jnp.asarray, var)

            fwd = jax.jit(lambda x: bij.forward(var_f, x, self._ctx)[:2])

            # Preferred inverse: solve + logdet series in ONE kernel, the
            # estimator's probes/series-lengths drawn XLA-side with the
            # chain path's exact key structure (fused_resflow.py:
            # draw_unbias_probes) — values match the chain inverse to
            # float tolerance.  Fallback (non-'unbias' estimators, or
            # NF_TPU_RESFLOW_FUSED_LOGDET=0): fused solve + one XLA chain
            # forward replay at the solved x.
            fused_ld = (spec.estimator == "unbias"
                        and _os.environ.get(
                            "NF_TPU_RESFLOW_FUSED_LOGDET", "1") != "0")

            if fused_ld:
                @jax.jit
                def run_f(p, x):
                    return call_fwd_logdet(spec, p, x, False)

                @jax.jit
                def run_i(p, z):
                    return call_solve_logdet(spec, p, z, False)

                self._fwd = lambda x: run_f(packed, x)
            else:
                @jax.jit
                def run_i(p, z):
                    x = call_solve(kern, spec, p, z, False)
                    _, ld = bij.forward(var_f, x, self._ctx)[:2]
                    return x, -ld

                self._fwd = fwd
            self._inv = lambda z: run_i(packed, z)
        elif spec is not None and on_tpu:
            if getattr(spec, "kind", "affine") == "flowpp":
                from ..ops.pallas.fused_flowpp import (
                    call_flowpp as _call, _make_kernels_flowpp as
                    _make_kernels, make_inv_packed, pack_flowpp as
                    pack_stack)
            else:
                from ..ops.pallas.fused_stack import (_call, _make_kernels,
                                                      pack_stack)

                def make_inv_packed(packed, spec=spec):
                    out = []
                    for p in packed:
                        q = dict(p)
                        q["pre"] = p["prei"]
                        if spec.has_mix:
                            q["mix"] = p["mixi"]
                        out.append(q)
                    return out
            packed, const_ld = jax.jit(
                lambda v: pack_stack(model.bijector, spec, v))(var)
            # settle standard layouts so the kernel jit does not bake
            # per-call relayout conversions into its entry (jit outputs can
            # carry arbitrary XLA layouts; a host round-trip is the
            # dependable way to reset them, and runs once)
            import numpy as _np
            packed = jax.tree.map(
                lambda a: jax.device_put(_np.asarray(a)), packed)
            inv_packed = make_inv_packed(packed, spec)
            fwd_k, inv_k = _make_kernels(spec)

            # the constant-logdet add must live INSIDE the jit: a per-call
            # eager op costs ~0.5 ms of dispatch on a remote-attached TPU
            def mk_run(kern, sign):
                @jax.jit
                def run(p, c, x):
                    y, ld = _call(kern, spec, p, x, False)
                    return y, ld + sign * c
                return run

            run_f = mk_run(fwd_k, 1.0)
            run_i = mk_run(inv_k, -1.0)
            self._fwd = lambda x: run_f(packed, const_ld, x)
            self._inv = lambda z: run_i(inv_packed, const_ld, z)
        else:
            var = jax.tree.map(jnp.asarray, var)
            # slice to (y, logdet) INSIDE the jit: returning the state
            # pytree too would materialize hundreds of per-layer state
            # arrays as program outputs, and per-output dispatch/transfer
            # cost dominates small models on a remote-attached TPU (maf-32
            # was 3x slower than the chain path through exactly this)
            fwd = jax.jit(
                lambda x: model.bijector.forward(var, x, self._ctx)[:2])
            inv = jax.jit(
                lambda z: model.bijector.inverse(var, z, self._ctx)[:2])
            self._fwd = fwd
            self._inv = inv

    def forward(self, x):
        """data -> latent; returns (z, logdet)."""
        return self._fwd(x)

    def inverse(self, z):
        """latent -> data; returns (y, logdet of the inverse)."""
        return self._inv(z)

    def log_prob(self, x):
        """log p(x) under the flow; returns (B,)."""
        z, logdet = self._fwd(x)
        return standard_normal_logprob(z) + logdet

    def sample(self, key, n: int):
        """Draw n samples; returns (y, log p(y))."""
        z = jax.random.normal(key, (n,) + self.dims)
        y, logdet_inv = self._inv(z)
        return y, standard_normal_logprob(z) - logdet_inv
