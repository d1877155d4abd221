"""Decompose the ResFlow serving inverse: fixed-point solve vs logdet
estimator (VERDICT r4 item 4 — decide the fused-kernel boundary with
numbers).

Times, at batch 8192 on the real chip, each in ONE dispatch:
  * full inverse (fixpoint + per-block 'unbias' logdet)  [the bench path]
  * fixpoint-only inverse (no logdet)
  * full inverse with the 'exact' d=2 estimator
Writes RESFLOW_FIXPOINT_PROBE.json.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from nf_tpu.config import Config, NetworkConfig, NETWORK_DEFAULTS
from nf_tpu.core import Ctx
from nf_tpu.models import build_model
from nf_tpu.train import Trainer
from nf_tpu.utils import enable_persistent_compile_cache
from nf_tpu.bijectors.iresblock import InvertibleResBlock


def timeit(fn, n=20):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    enable_persistent_compile_cache()
    B = 8192
    cfg = Config()
    cfg.network = NetworkConfig(name="resflow", **NETWORK_DEFAULTS["resflow"])
    model = build_model("resflow", (2,), datatype="2d", cfg=cfg.network)
    cfg2 = NetworkConfig(name="resflow", **{**NETWORK_DEFAULTS["resflow"],
                                            "logdet": "exact"})
    model_exact = build_model("resflow", (2,), datatype="2d", cfg=cfg2)
    tr = Trainer(model, cfg.optimizer, seed=0)
    x = np.random.default_rng(0).normal(size=(B, 2)).astype(np.float32)
    ts = tr.init_state(jax.random.PRNGKey(0), x[:1024])
    var = jax.device_put(jax.tree.map(jnp.asarray, ts.var),
                         jax.local_devices()[0])

    ctx = Ctx(rng=None, train=False)
    fwd = jax.jit(lambda v, a: model.forward(v, a, ctx)[:2])
    inv = jax.jit(lambda v, a: model.inverse(v, a, ctx)[:2])
    inv_exact = jax.jit(lambda v, a: model_exact.inverse(v, a, ctx)[:2])
    fwd_exact = jax.jit(lambda v, a: model_exact.forward(v, a, ctx)[:2])

    # fixpoint-only inverse: walk the chain in reverse, skipping the
    # per-block logdet estimation (what a fused solve kernel would do)
    chain = model.bijector

    def inv_fix(v, z):
        y = z
        for i in reversed(range(len(chain.layers))):
            layer = chain.layers[i]
            sub = Chain_sub(v, i)
            if isinstance(layer, InvertibleResBlock):
                params_g = sub["params"]["g"]
                g_apply = layer._g_apply_pure(sub["state"]["g"])
                g_fn = lambda xx: g_apply(params_g, xx)

                def cond(carry):
                    xx, prev, it = carry
                    return jnp.logical_and(
                        it < layer.n_iters,
                        jnp.max(jnp.abs(xx - prev)) >= layer.ftol)

                def body(carry):
                    xx, _, it = carry
                    return y - g_fn(xx), xx, it + 1

                x0 = y - g_fn(y)
                y, _, _ = jax.lax.while_loop(cond, body,
                                             (x0, y, jnp.asarray(1)))
            else:
                y, _, _ = layer.inverse(sub, y, ctx)
        return y

    def Chain_sub(v, i):
        return {"params": v["params"][i], "state": v["state"][i]}

    inv_fix_j = jax.jit(inv_fix)

    z, _ = fwd(var, x)
    t_fwd = timeit(lambda: fwd(var, x))
    t_inv = timeit(lambda: inv(var, z))
    t_fix = timeit(lambda: inv_fix_j(var, z))
    t_inv_exact = timeit(lambda: inv_exact(var, z))
    t_fwd_exact = timeit(lambda: fwd_exact(var, x))

    # consistency: fixpoint-only must match the full inverse's x
    x_full, _ = inv(var, z)
    x_fix = inv_fix_j(var, z)
    err = float(jnp.max(jnp.abs(x_full - x_fix)))

    out = {
        "batch": B,
        "fwd_unbias_ms": t_fwd * 1e3,
        "inv_unbias_ms": t_inv * 1e3,
        "inv_fixpoint_only_ms": t_fix * 1e3,
        "inv_logdet_share_ms": (t_inv - t_fix) * 1e3,
        "fwd_exact_ms": t_fwd_exact * 1e3,
        "inv_exact_ms": t_inv_exact * 1e3,
        "fix_vs_full_max_abs_err": err,
        "note": ("fixpoint-only = what an in-kernel fused solve would "
                 "replace; the remainder is the per-block series "
                 "estimator. 'exact' rows: d=2 Jacobian logdet via 2 "
                 "jvp columns — zero-variance, the serving-mode "
                 "alternative."),
    }
    print(json.dumps(out, indent=2))
    with open(os.path.join(REPO, "RESFLOW_FIXPOINT_PROBE.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
