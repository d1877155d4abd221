"""Profile where ResFlow serving time goes — the VERDICT r3 #6 boundary
record for the fixed-point-inverse candidate.

Decomposes the eval fwd+inv pair (batch 8192, trained 20k checkpoint when
present) into: forward (exact 2x2 logdet path), inverse (32 sequential
100-iteration-capped fixed-point while_loops), and a single iresblock's
g(x) evaluation — to measure how much of the inverse is irreducible
network compute vs loop/launch overhead that an in-kernel fusion could
remove.  Writes RESFLOW_SERVING_PROFILE.json.
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
from nf_tpu.train import Trainer, load_checkpoint
from nf_tpu.utils import enable_persistent_compile_cache


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
    tr = Trainer(model, cfg.optimizer, seed=0)
    x = np.random.default_rng(0).normal(size=(B, 2)).astype(np.float32)
    ts = tr.init_state(jax.random.PRNGKey(0), x[:1024])
    ckpt = "logs/resflow_normals_2026-08-21_01-39-25/latest.npz"
    trained = os.path.exists(ckpt)
    if trained:
        ts, _ = load_checkpoint(ckpt, ts)
    var = jax.device_put(jax.tree.map(jnp.asarray, ts.var),
                         jax.local_devices()[0])

    ctx = Ctx(rng=None, train=False)
    fwd = jax.jit(lambda v, a: model.forward(v, a, ctx)[:2])
    inv = jax.jit(lambda v, a: model.inverse(v, a, ctx)[:2])
    z, _ = fwd(var, x)

    t_fwd = timeit(lambda: fwd(var, x))
    t_inv = timeit(lambda: inv(var, z))

    # one iresblock's residual net g(x): the irreducible per-iteration cost
    blk = next(l for l in model.bijector.layers
               if type(l).__name__ == "InvertibleResBlock")
    i_blk = model.bijector.layers.index(blk)
    sub = {"params": var["params"][i_blk], "state": var["state"][i_blk]}
    g = jax.jit(lambda p, s, a: blk._g_apply_pure(s)(p, a))
    t_g = timeit(lambda: g(sub["params"]["g"], sub["state"]["g"], x))

    # fixed-point iteration count actually used at these parameters: run
    # the inverse once per tolerance and look at convergence by measuring
    # a manually-capped variant
    n_layers = sum(1 for l in model.bijector.layers
                   if type(l).__name__ == "InvertibleResBlock")

    out = {
        "batch": B,
        "trained_ckpt": trained,
        "fwd_ms": t_fwd * 1e3,
        "inv_ms": t_inv * 1e3,
        "fwd_inv_samples_per_s": B / (t_fwd + t_inv),
        "single_resblock_g_ms": t_g * 1e3,
        "n_resblocks": n_layers,
        "note": ("inverse cost vs n_layers * iters * g-cost: if inv_ms >> "
                 "n_resblocks * ~8 iters * single_g_ms the loop carries "
                 "launch/overhead an in-kernel fusion could remove; if "
                 "they are comparable the inverse is compute-bound and "
                 "fusing buys little"),
    }
    print(json.dumps(out, indent=2))
    with open(os.path.join(REPO, "RESFLOW_SERVING_PROFILE.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
