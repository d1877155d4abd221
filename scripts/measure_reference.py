"""Measure the PyTorch reference's flow throughput on this machine.

The reference publishes no numbers (BASELINE.md), so we time it directly:
RealNVP density config (the repo default: 32 coupling steps), batch 1024 —
forward (normalizing) and inverse (generative) passes, plus a full training
step (forward + NLL + backward + adam).  Results land in
BENCH_BASELINE.json and anchor bench.py's ``vs_baseline`` ratio.

Runs the reference's own modules from /root/reference (imported read-only,
not copied) on torch-CPU — the only backend available to it here.
"""
import json
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, "/root/reference")

import numpy as np
import torch


def timeit(fn, warmup=3, iters=20):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    from flows import RealNVP

    torch.manual_seed(0)
    batch = 8192
    cfg = SimpleNamespace(layers=32)
    net = RealNVP(dims=(2,), datatype="2d", cfg=cfg)
    net.eval()

    y = torch.randn(batch, 2)
    z = torch.randn(batch, 2)

    with torch.no_grad():
        t_fwd = timeit(lambda: net(y))
        t_inv = timeit(lambda: net.backward(z))

    # training step: forward + NLL + backward + adam
    net.train()
    optim = torch.optim.Adam(net.parameters(), lr=1e-4)
    normal = torch.distributions.MultivariateNormal(
        torch.zeros(2), torch.eye(2))

    def train_step():
        zz, logdet = net(y)
        loss = -(normal.log_prob(zz) + logdet).mean()
        optim.zero_grad()
        loss.backward()
        optim.step()

    t_train = timeit(train_step, warmup=3, iters=10)

    out = {
        "config": f"realnvp density 2d, layers=32, batch={batch}",
        "hardware": f"torch-cpu ({torch.get_num_threads()} threads)",
        "torch_version": torch.__version__,
        "fwd_s_per_batch": t_fwd,
        "inv_s_per_batch": t_inv,
        "train_s_per_step": t_train,
        "fwd_samples_per_s": batch / t_fwd,
        "inv_samples_per_s": batch / t_inv,
        "fwd_inv_samples_per_s": batch / (t_fwd + t_inv),
        "train_samples_per_s": batch / t_train,
    }
    with open("BENCH_BASELINE.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
