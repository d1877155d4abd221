"""Probe where the glow-img32x3 train step time goes (VERDICT r4 item 1).

Measures, on the real chip, the chunked train step and the train-mode
forward under different matmul/conv precisions, plus an analytic FLOP
count (XLA cost analysis counts a lax.scan body ONCE, so BENCH_DETAIL's
image rooflines understate FLOPs by ~the trip count — see
scan_flops_note below).

Usage: python scripts/img_mfu_probe.py [precision ...]
  precision in {default, bfloat16, bfloat16_3x, float32}
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

DIMS = (32, 32, 3)
BATCH = 1024
CHUNK = 4


def build(precision):
    """precision: a jax matmul precision name, 'default', or 'cdtype_bf16'
    (= the NetworkConfig.compute_dtype="bfloat16" opt-in: bf16 conditioner
    activations + weights at use, f32 masters/flow math)."""
    compute_dtype = "float32"
    remat = True
    if precision == "cdtype_bf16":
        compute_dtype = "bfloat16"
    elif precision == "both":
        compute_dtype = "bfloat16"
        jax.config.update("jax_default_matmul_precision", "bfloat16")
    elif precision == "bf16_noremat":
        remat = False
        jax.config.update("jax_default_matmul_precision", "bfloat16")
    elif precision == "both_noremat":
        compute_dtype = "bfloat16"
        remat = False
        jax.config.update("jax_default_matmul_precision", "bfloat16")
    elif precision != "default":
        jax.config.update("jax_default_matmul_precision", precision)
    from nf_tpu.config import Config, NetworkConfig
    from nf_tpu.models import build_model
    from nf_tpu.train import Trainer

    cfg = Config()
    cfg.network = NetworkConfig(name="glow", layers=32, scan=True, remat=remat,
                                compute_dtype=compute_dtype)
    model = build_model("glow", DIMS, datatype="image", cfg=cfg.network)
    tr = Trainer(model, cfg.optimizer, seed=0)
    return model, tr


def timeit(fn, iters=8, warmup=2):
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    precisions = sys.argv[1:] or ["default", "bfloat16", "float32"]
    key = jax.random.PRNGKey(0)
    batch0 = np.asarray(jax.random.uniform(
        jax.random.fold_in(key, 3), (BATCH,) + DIMS, minval=0.05, maxval=0.95))
    chunk = np.asarray(jax.random.uniform(
        jax.random.fold_in(key, 4), (CHUNK, BATCH) + DIMS,
        minval=0.05, maxval=0.95))

    results = {}
    for prec in precisions:
        model, tr = build(prec)
        ts = tr.init_state(key, batch0)
        from nf_tpu.core import Ctx

        # train-mode forward only (jitted)
        fwd = jax.jit(lambda v, x: model.forward(
            v, x, Ctx(rng=None, train=True))[:2])
        var = ts.var
        t_fwd = timeit(lambda: fwd(var, jnp.asarray(batch0)))

        state = {"ts": ts}

        def run_chunk():
            state["ts"], losses = tr.train_steps(state["ts"], chunk)
            return losses

        t0 = time.time()
        t_chunk = timeit(run_chunk, iters=6)
        loss0 = float(np.asarray(run_chunk())[0])
        results[prec] = {
            "fwd_train_ms": t_fwd * 1e3,
            "train_s_per_step": t_chunk / CHUNK,
            "train_samples_per_s": CHUNK * BATCH / t_chunk,
            "loss_sample": loss0,
            "wall_s": time.time() - t0,
        }
        print(prec, json.dumps(results[prec]), flush=True)

    out = {
        "dims": list(DIMS), "batch": BATCH, "chunk": CHUNK,
        "scan_flops_note": (
            "XLA cost_analysis counts a lax.scan body once, not x trip "
            "count; the analytic count below multiplies conv FLOPs by "
            "actual coupling counts."),
        "results": results,
    }
    with open("IMG_MFU_PROBE.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out["results"]))


if __name__ == "__main__":
    main()
