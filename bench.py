"""Headline benchmark: flagship flow forward+inverse throughput on TPU.

Workload mirrors the reference's default config (RealNVP density, 32
coupling steps — /root/reference/configs/default.yaml:6-7) at batch 8192.
Baseline: the PyTorch reference itself measured on this machine
(scripts/measure_reference.py -> BENCH_BASELINE.json).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

BATCH = 8192
LAYERS = 32
WARMUP = 5
ITERS = 50


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from nf_tpu.config import Config, NetworkConfig
    from nf_tpu.core import Ctx
    from nf_tpu.models import build_model

    cfg = Config()
    cfg.network = NetworkConfig(name="realnvp", layers=LAYERS)
    model = build_model("realnvp", (2,), datatype="2d", cfg=cfg.network)

    key = jax.random.PRNGKey(0)
    var = model.init(key)
    y = jax.random.normal(jax.random.fold_in(key, 1), (BATCH, 2))
    z = jax.random.normal(jax.random.fold_in(key, 2), (BATCH, 2))

    # serving path: packs weights once; on TPU the whole stack runs as a
    # single fused Pallas kernel (nf_tpu/ops/pallas/fused_stack.py)
    prog = model.eval_program(var)
    fwd = lambda v, x: prog.forward(x)
    inv = lambda v, x: prog.inverse(x)

    def timeit(fn, *args):
        for _ in range(WARMUP):
            jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / ITERS

    t_fwd = timeit(fwd, var, y)
    t_inv = timeit(inv, var, z)
    value = BATCH / (t_fwd + t_inv)

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BENCH_BASELINE.json")
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        vs = value / base["fwd_inv_samples_per_s"]

    print(json.dumps({
        "metric": "realnvp2d_l32_b8192_fwd_inv_throughput",
        "value": round(value, 1),
        "unit": "samples/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
