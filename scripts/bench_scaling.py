"""Weak-scaling efficiency benchmark for the data-parallel train step.

Measures steady-state CHUNKED step time (trainer.train_steps: K optimizer
steps fused under one dispatch via lax.scan) at 1 device vs all devices
with the global batch scaled proportionally (weak scaling); efficiency =
t_1 / t_N.  The chunked path is used deliberately: per-step dispatch over
a remote-tunnel backend is dominated by host latency, not ICI, and would
flatter the scaling number.  On a multi-chip TPU slice this is the real
ICI-allreduce measurement (target >= 85%, BASELINE.md); on a single chip
or the virtual CPU mesh it validates the harness end to end.

Usage:
    python scripts/bench_scaling.py [--batch-per-device 1024] [--layers 16]
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py     # simulated 8-device mesh

Writes SCALING.json at the repo root (one record per invocation platform).
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

CHUNK = 16


def bench(trainer, ts, batches, iters=10, warmup=3):
    for _ in range(warmup):
        ts, losses = trainer.train_steps(ts, batches)
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, losses = trainer.train_steps(ts, batches)
    jax.block_until_ready(losses)
    # per-optimizer-step time
    return (time.perf_counter() - t0) / (iters * CHUNK)


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
    b = batch_per_device * n_devices
    batches = np.random.default_rng(seed).normal(
        size=(CHUNK, b, 2)).astype(np.float32)
    ts = trainer.init_state(jax.random.PRNGKey(seed), batches[0])
    return bench(trainer, ts, batches)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-per-device", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=16)
    args = ap.parse_args()

    n = jax.device_count()
    t1 = run(1, args.batch_per_device, args.layers)
    out = {"platform": jax.devices()[0].platform, "devices": n,
           "chunk": CHUNK, "batch_per_device": args.batch_per_device,
           "layers": args.layers, "t_step_1dev_s": t1,
           "samples_per_s_1dev": args.batch_per_device / t1}
    if n > 1:
        tn = run(n, args.batch_per_device, args.layers)
        out["t_step_ndev_s"] = tn
        out["weak_scaling_efficiency"] = t1 / tn
        out["samples_per_s_ndev"] = args.batch_per_device * n / tn
        if out["platform"] == "cpu":
            out["note"] = (
                f"virtual mesh: {n} devices time-slice "
                f"{os.cpu_count()} physical cores, so weak-scaling "
                "efficiency here validates the harness (sharding compiles, "
                "collectives execute, loss parity holds), NOT ICI — the "
                "ideal on this host is ~cores/devices, not 1.0")
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.json")
    records = []
    if os.path.exists(path):
        with open(path) as f:
            records = json.load(f)
    records.append(out)
    with open(path, "w") as f:
        json.dump(records, f, indent=2)


if __name__ == "__main__":
    main()
