"""Bench the adaptive/iterative models at TRAINED parameters.

bench.py times every model at random init; for the models whose per-call
cost depends on the learned map — ffjord (dopri5 accepts more steps on a
stiff trained field), resflow (fixed-point inverse iterations), flow++
(Newton inverse) — random init understates the serving cost (round-2
review finding).  This script re-times eval_program fwd+inv and the
chain path with 20k-step trained checkpoints and writes
BENCH_TRAINED.json.

The torch baseline side has no trained checkpoints (the reference parity
runs predate its checkpointing support), so `vs_baseline_random_init`
compares trained-nf_tpu against RANDOM-INIT torch — an UNDERESTIMATE of
the true trained-vs-trained ratio, since a trained torch model can only
be slower than its random init for these models (more ODE accepts /
fixed-point iterations).

Usage: python scripts/bench_trained.py <network>=<ckpt.npz> [...]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

from nf_tpu.utils import enable_persistent_compile_cache
import numpy as np

EVAL_BATCH = 8192


def timeit(fn, *args, iters=30):
    for _ in range(5):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    t_one = time.perf_counter() - t0
    n = max(3, min(iters, int(5.0 / max(t_one, 1e-4))))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def bench(network, ckpt):
    from nf_tpu.config import Config, NetworkConfig, NETWORK_DEFAULTS
    from nf_tpu.core import Ctx
    from nf_tpu.models import build_model
    from nf_tpu.train import Trainer, load_checkpoint

    cfg = Config()
    cfg.network = NetworkConfig(name=network, **NETWORK_DEFAULTS[network])
    model = build_model(network, (2,), datatype="2d", cfg=cfg.network)
    tr = Trainer(model, cfg.optimizer, seed=0)
    key = jax.random.PRNGKey(0)
    dummy = np.asarray(jax.random.normal(key, (1024, 2)))
    ts = tr.init_state(key, dummy)
    ts, step = load_checkpoint(ckpt, ts)
    var = {"params": ts.params, "state": ts.state}

    # realistic eval inputs: data-like y (from the trained sampler) and
    # base-normal z — random-normal y would miss the trained field's cost
    y, _ = tr.sample(ts, jax.random.fold_in(key, 1), EVAL_BATCH)
    y = jax.block_until_ready(y)
    z = jax.random.normal(jax.random.fold_in(key, 2), (EVAL_BATCH, 2))

    prog = model.eval_program(var)
    runs = []
    for _ in range(3):
        t_f = timeit(lambda: prog.forward(y))
        t_i = timeit(lambda: prog.inverse(z))
        runs.append(EVAL_BATCH / (t_f + t_i))
    runs.sort()

    ctx = Ctx(rng=None, train=False)
    cf = jax.jit(lambda v, x: model.forward(v, x, ctx)[:2])
    ci = jax.jit(lambda v, x: model.inverse(v, x, ctx)[:2])
    tc = timeit(lambda: cf(var, y)) + timeit(lambda: ci(var, z))

    entry = {
        "ckpt": ckpt, "trained_steps": int(step),
        "eval_program_fwd_inv_samples_per_s": runs[1],
        "eval_program_fwd_inv_runs": runs,
        "chain_jit_fwd_inv_samples_per_s": EVAL_BATCH / tc,
    }
    base_path = os.path.join(REPO, "BENCH_BASELINE.json")
    if os.path.exists(base_path):
        base = json.load(open(base_path)).get("models", {}).get(network)
        if base:
            entry["vs_baseline_random_init"] = (
                runs[1] / base["fwd_inv_samples_per_s"])
    return entry


def main():
    enable_persistent_compile_cache()
    out_path = os.path.join(REPO, "BENCH_TRAINED.json")
    out = json.load(open(out_path)) if os.path.exists(out_path) else {}
    out["eval_batch"] = EVAL_BATCH
    out.setdefault("models", {})
    for arg in sys.argv[1:]:
        network, ckpt = arg.split("=", 1)
        t0 = time.time()
        out["models"][network] = bench(network, ckpt)
        print(f"# {network}: trained eval_program "
              f"{out['models'][network]['eval_program_fwd_inv_samples_per_s']:.0f}/s"
              f" ({time.time()-t0:.0f}s)", flush=True)
        with open(out_path, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
