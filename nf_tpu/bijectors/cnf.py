"""Continuous normalizing flow (FFJORD): ODE-defined bijector.

Behavior parity: /root/reference/flows/cnf.py:40-173 —
  * ODENet: time-concatenated dense (ConcatLinear) or conv (ConcatConv2d)
    stack with softplus between layers; the ODE function returns
    (dz/dt, dlogdet/dt = trace(d f/dz)) jointly (cnf.py:107-121);
  * training forces the Hutchinson estimator with 1 probe (cnf.py:95-97);
    eval uses 'exact' or Hutchinson with 4 probes;
  * CNF.forward integrates over flipped times (t1 -> t0) and backward over
    forward times (cnf.py:145-173); logdet rides as the second ODE state.

TPU-first deviations (deliberate, documented):
  * the solve runs in float32 — the reference casts to float64
    (cnf.py:134-148), but f64 is emulated (slow) on TPU; dopri5 with
    accept/reject control at f32 matches the reference NLL within MC noise
    on the covered workloads (tests assert estimator/solver accuracy);
  * Hutchinson probe noise is drawn ONCE per solve (folded from the step
    PRNG) instead of per func-eval — the standard FFJORD trick; still
    unbiased, and it makes the traced ODE function deterministic per solve.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.bijector import Bijector, Ctx
from ..nets.layers import _kaiming_uniform
from ..ops import estimators as est
from ..ops.odeint import odeint, odeint_adjoint


class ODENet:
    """Time-conditioned network defining dz/dt (params-explicit)."""

    def __init__(self, dims, base_filters: int = 32, n_layers: int = 2):
        self.dims = tuple(dims)
        self.is_image = len(dims) == 3
        c = dims[-1]
        self.hidden = [c] + [base_filters] * n_layers + [c]

    def init(self, key):
        ws, bs = [], []
        for i, (din, dout) in enumerate(zip(self.hidden[:-1], self.hidden[1:])):
            k1, k2, key = jax.random.split(key, 3)
            if self.is_image:
                fan_in = (din + 1) * 9
                ws.append(_kaiming_uniform(k1, (3, 3, din + 1, dout), fan_in))
            else:
                fan_in = din + 1
                ws.append(_kaiming_uniform(k1, (din + 1, dout), fan_in))
            bs.append(_kaiming_uniform(k2, (dout,), fan_in))
        return {"w": ws, "b": bs}

    def apply(self, params, t, x):
        """f(t, x): concat a t-channel to the input of every layer."""
        h = x
        n = len(params["w"])
        for i in range(n):
            tt = jnp.full(h.shape[:-1] + (1,), t, h.dtype)
            h_in = jnp.concatenate([tt, h], axis=-1)
            if self.is_image:
                h = jax.lax.conv_general_dilated(
                    h_in, params["w"][i], (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            else:
                h = h_in @ params["w"][i]
            h = h + params["b"][i]
            if i != n - 1:
                h = jax.nn.softplus(h)
        return h


class CNF(Bijector):
    def __init__(self, dims, times, solver: str = "dopri5",
                 trace_estimator: str = "hutchinson",
                 backprop: str = "adjoint", base_filters: int = 32,
                 n_layers: int = 2, rtol=None, atol=None):
        assert backprop in ("normal", "adjoint"), backprop
        self.dims = tuple(dims)
        self.times_init = jnp.asarray(times, jnp.float32)
        self.solver = solver
        self.trace_estimator = trace_estimator
        self.backprop = backprop
        self.rtol = rtol
        self.atol = atol
        self.net = ODENet(dims, base_filters, n_layers)

    def init(self, key):
        return {"params": {"net": self.net.init(key)},
                "state": {"times": self.times_init}}

    def _dynamics(self, n_probes, exact: bool):
        """ODE function over state (z, logdet).

        The dynamics take ``(net_params, v_probe)`` as their explicit
        parameter pytree: the Hutchinson probe is TRACED data (derived from
        the per-step PRNG under jit) and must ride through the adjoint's
        differentiable-argument slot — a closure over it inside the
        custom_vjp's static function argument silently corrupts the
        backward pass (the probe the adjoint re-evaluates with no longer
        matches the forward's)."""

        def fn(pv, t, state):
            p, v_probe = pv
            z, _ = state
            f_of = lambda zz: self.net.apply(p, t, zz)
            dz = f_of(z)
            if exact:
                tr = est.trace_exact(f_of, z)
            else:
                _, vjp = jax.vjp(f_of, z)
                ests = [jnp.sum((vjp(v_probe[i])[0] * v_probe[i])
                                .reshape(z.shape[0], -1), axis=1)
                        for i in range(n_probes)]
                tr = sum(ests) / n_probes
            return (dz, tr)

        return fn

    def _solve(self, var, x, logdet_shape, times, ctx):
        params = var["params"]["net"]
        if ctx.train:
            exact, n_probes = False, 1
        elif self.trace_estimator == "exact":
            exact, n_probes = True, 0
        else:
            exact, n_probes = False, 4

        key = ctx.rng if ctx.rng is not None else jax.random.PRNGKey(0)
        v = (jax.random.normal(key, (max(n_probes, 1),) + x.shape, x.dtype)
             if not exact else jnp.zeros((1,) + x.shape, x.dtype))
        fn = self._dynamics(n_probes, exact)
        pv = (params, v)

        state0 = (x, jnp.zeros(logdet_shape, jnp.float32))
        if self.backprop == "adjoint":
            z, dlogdet = odeint_adjoint(fn, pv, state0, times, self.solver,
                                        self.rtol, self.atol)
        else:
            z, dlogdet = odeint(lambda t, s: fn(pv, t, s), state0, times,
                                self.solver, self.rtol, self.atol)
        return z, dlogdet

    def forward(self, var, x, ctx):
        times = jnp.flip(var["state"]["times"])
        z, dlogdet = self._solve(var, x, (x.shape[0],), times, ctx)
        return z, dlogdet, var["state"]

    def inverse(self, var, y, ctx):
        times = var["state"]["times"]
        x, dlogdet = self._solve(var, y, (y.shape[0],), times, ctx)
        return x, dlogdet, var["state"]
