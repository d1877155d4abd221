"""Measure the PyTorch reference's flow throughput on this machine.

The reference publishes no numbers (BASELINE.md), so we time it directly
for ALL SEVEN density models at their default configs
(/root/reference/configs/default.yaml layers=32; configs/network/*.yaml
overrides): forward (normalizing) and inverse (generative) passes at
batch 8192, plus a full training step (forward + NLL + backward + adam)
at the reference's train batch 1024.  This mirrors bench.py's ZOO dict
exactly so every nf_tpu number has a like-for-like torch anchor.

Results land in BENCH_BASELINE.json: per-model entries under "models",
plus the legacy top-level realnvp fields that anchor bench.py's headline
``vs_baseline`` ratio.

Runs the reference's own modules from /root/reference (imported read-only,
not copied) on torch-CPU — the only backend available to it here.  Run
with the box otherwise quiet (pause background torch jobs) so the anchor
is honest.
"""
import json
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, "/root/reference")

import numpy as np
import torch

EVAL_BATCH = 8192
TRAIN_BATCH = 1024

# mirrors bench.py ZOO / the reference's config defaults
ZOO = {
    "realnvp": dict(layers=32),
    "glow": dict(layers=32),
    "flow++": dict(layers=32, mixtures=8),
    "maf": dict(layers=32),
    "planar": dict(layers=32),
    "resflow": dict(layers=32, logdet="unbias", spnorm_coeff=0.9),
    "ffjord": dict(layers=3, t0=0.0, t1=1.0, stepsize=0.1, solver="dopri5",
                   backprop="adjoint", trace="hutchinson"),
}


def timeit(fn, warmup=2, budget_s=30.0, max_iters=20):
    """Mean seconds/call; adaptive iteration count like bench.py so the
    expensive iterative inverses (flow++ bisection, resflow fixed-point,
    ffjord ODE) don't stall the run."""
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    fn()
    t_one = time.perf_counter() - t0
    n = max(2, min(max_iters, int(budget_s / max(t_one, 1e-4))))
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


# image-tier anchors: the reference's multi-scale image stacks at default
# depth (configs/default.yaml layers=32 -> 161 couplings at 32x32), dims
# channels-first per the reference convention.  torch-CPU cannot sustain
# the TPU-side batch 1024 at tractable step times; the anchor batch is
# recorded in the entry and throughput is reported as samples/s.
IMAGE_ZOO = {
    "realnvp-img32x1": dict(network="realnvp", dims=(1, 32, 32), layers=32),
    "glow-img32x1": dict(network="glow", dims=(1, 32, 32), layers=32),
    "glow-img32x3": dict(network="glow", dims=(3, 32, 32), layers=32),
}
IMG_EVAL_BATCH = 64
IMG_TRAIN_BATCH = 64


def bench_image_model(name):
    import flows

    spec = IMAGE_ZOO[name]
    networks = {"realnvp": flows.RealNVP, "glow": flows.Glow}
    torch.manual_seed(0)
    cfg = SimpleNamespace(layers=spec["layers"])
    net = networks[spec["network"]](dims=spec["dims"], datatype="image",
                                    cfg=cfg)
    dims = spec["dims"]
    net.eval()
    y = torch.rand(IMG_EVAL_BATCH, *dims) * 0.9 + 0.05
    z = torch.randn(IMG_EVAL_BATCH, *dims) * 0.5

    with torch.no_grad():
        t_fwd = timeit(lambda: net(y), warmup=1, budget_s=60.0, max_iters=10)
        t_inv = timeit(lambda: net.backward(z), warmup=1, budget_s=60.0,
                       max_iters=10)

    net.train()
    optim = torch.optim.Adam(net.parameters(), lr=1e-4)
    d = int(np.prod(dims))
    yt = torch.rand(IMG_TRAIN_BATCH, *dims) * 0.9 + 0.05

    def train_step():
        zz, logdet = net(yt)
        z2 = zz.reshape(zz.size(0), -1)
        logpz = -0.5 * (z2 ** 2).sum(dim=1) - 0.5 * d * np.log(2 * np.pi)
        loss = -(logpz + logdet).mean()
        optim.zero_grad()
        loss.backward()
        optim.step()

    t_train = timeit(train_step, warmup=1, budget_s=90.0, max_iters=5)

    return {
        "dims": list(dims),
        "layers": spec["layers"],
        "eval_batch": IMG_EVAL_BATCH,
        "train_batch": IMG_TRAIN_BATCH,
        "fwd_s_per_batch": t_fwd,
        "inv_s_per_batch": t_inv,
        "train_s_per_step": t_train,
        "fwd_samples_per_s": IMG_EVAL_BATCH / t_fwd,
        "inv_samples_per_s": IMG_EVAL_BATCH / t_inv,
        "fwd_inv_samples_per_s": IMG_EVAL_BATCH / (t_fwd + t_inv),
        "train_samples_per_s": IMG_TRAIN_BATCH / t_train,
    }


def bench_model(name):
    import flows

    networks = {
        "planar": flows.PlanarFlow,
        "realnvp": flows.RealNVP,
        "glow": flows.Glow,
        "flow++": flows.Flowpp,
        "maf": flows.MAF,
        "resflow": flows.ResFlow,
        "ffjord": flows.Ffjord,
    }

    torch.manual_seed(0)
    cfg = SimpleNamespace(**ZOO[name])
    net = networks[name](dims=(2,), datatype="2d", cfg=cfg)
    net.eval()

    y = torch.randn(EVAL_BATCH, 2)
    z = torch.randn(EVAL_BATCH, 2)

    with torch.no_grad():
        t_fwd = timeit(lambda: net(y))
        t_inv = timeit(lambda: net.backward(z))

    # training step: forward + NLL + backward + adam (reference batch 1024)
    net.train()
    optim = torch.optim.Adam(net.parameters(), lr=1e-4)
    normal = torch.distributions.MultivariateNormal(
        torch.zeros(2), torch.eye(2))
    yt = torch.randn(TRAIN_BATCH, 2)

    def train_step():
        zz, logdet = net(yt)
        loss = -(normal.log_prob(zz) + logdet).mean()
        optim.zero_grad()
        loss.backward()
        optim.step()

    t_train = timeit(train_step, warmup=2, budget_s=30.0, max_iters=10)

    return {
        "fwd_s_per_batch": t_fwd,
        "inv_s_per_batch": t_inv,
        "train_s_per_step": t_train,
        "fwd_samples_per_s": EVAL_BATCH / t_fwd,
        "inv_samples_per_s": EVAL_BATCH / t_inv,
        "fwd_inv_samples_per_s": EVAL_BATCH / (t_fwd + t_inv),
        "train_samples_per_s": TRAIN_BATCH / t_train,
    }


def main():
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else list(ZOO)

    # start from the existing file so partial re-measurements merge
    try:
        with open("BENCH_BASELINE.json") as f:
            out = json.load(f)
    except Exception:
        out = {}
    out.setdefault("models", {})
    out.update({
        "hardware": f"torch-cpu ({torch.get_num_threads()} threads)",
        "torch_version": torch.__version__,
        "eval_batch": EVAL_BATCH,
        "train_batch": TRAIN_BATCH,
        "configs": "reference defaults (layers=32; ffjord layers=3 dopri5)",
    })

    for name in only:
        t0 = time.time()
        entry = (bench_image_model(name) if name in IMAGE_ZOO
                 else bench_model(name))
        out["models"][name] = entry
        print(f"# {name}: fwd+inv {entry['fwd_inv_samples_per_s']:.0f}/s, "
              f"train {entry['train_samples_per_s']:.0f}/s "
              f"({time.time()-t0:.0f}s)", flush=True)
        if name == "realnvp":  # legacy top-level fields (bench.py headline)
            out["config"] = (f"realnvp density 2d, layers=32, "
                             f"batch={EVAL_BATCH}")
            out.update(entry)
        with open("BENCH_BASELINE.json", "w") as f:
            json.dump(out, f, indent=2)

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
