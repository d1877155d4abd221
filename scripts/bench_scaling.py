"""Weak-scaling efficiency benchmark for the data-parallel train step.

Measures steady-state step time at 1 device vs all devices with the global
batch scaled proportionally (weak scaling); efficiency = t_1 / t_N.  On a
multi-chip TPU slice this is the real ICI-allreduce number (target >= 85%,
BASELINE.md); on a single chip or the virtual CPU mesh it validates the
harness end to end.

Usage:
    python scripts/bench_scaling.py [--batch-per-device 1024] [--layers 16]
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py     # simulated 8-device mesh
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon sitecustomize force-selects the TPU backend via jax.config at
# import time; honor an explicit JAX_PLATFORMS=cpu request (virtual mesh)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import numpy as np


def bench(trainer, ts, batch, iters=20, warmup=3):
    for _ in range(warmup):
        ts, loss = trainer.train_step(ts, batch)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, loss = trainer.train_step(ts, batch)
    jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / iters


def run(n_devices, batch_per_device, layers, seed=0):
    from jax.sharding import Mesh

    from nf_tpu.config import Config, NetworkConfig
    from nf_tpu.models import build_model
    from nf_tpu.train import Trainer

    devices = jax.devices()[:n_devices]
    mesh = Mesh(np.array(devices).reshape(n_devices, 1), ("data", "model"))
    cfg = Config()
    cfg.network = NetworkConfig(name="realnvp", layers=layers)
    model = build_model("realnvp", (2,), datatype="2d", cfg=cfg.network)
    trainer = Trainer(model, cfg.optimizer, mesh=mesh, seed=seed)
    batch = np.random.default_rng(seed).normal(
        size=(batch_per_device * n_devices, 2)).astype(np.float32)
    ts = trainer.init_state(jax.random.PRNGKey(seed), batch)
    return bench(trainer, ts, batch)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-device", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=16)
    args = ap.parse_args()

    n = jax.device_count()
    t1 = run(1, args.batch_per_device, args.layers)
    out = {"devices": n, "t_step_1dev_s": t1,
           "batch_per_device": args.batch_per_device}
    if n > 1:
        tn = run(n, args.batch_per_device, args.layers)
        out["t_step_ndev_s"] = tn
        out["weak_scaling_efficiency"] = t1 / tn
    print(json.dumps(out))


if __name__ == "__main__":
    main()
