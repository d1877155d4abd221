"""Train the PyTorch reference on the `normals` density and record its
held-out NLL — the parity anchor (BASELINE.md: NLL within MC error).

Uses the reference's own modules (imported read-only from /root/reference)
with its default recipe (Adam 1e-4, StepLR x0.5/10k, batch 1024 —
configs/default.yaml) but OUR dataset generator, so both frameworks train
and evaluate on identically distributed data.  The held-out set is a fixed
seed from nf_tpu's sampler; the companion scripts/eval_nll.py evaluates an
nf_tpu checkpoint on the same set.
"""
import json
import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch

from nf_tpu.data.toy import TOY_SAMPLERS

HELDOUT_SEED = 9999
HELDOUT_N = 16384


def heldout(name="normals"):
    fn, dims, _ = TOY_SAMPLERS[name]
    return fn(HELDOUT_N, np.random.default_rng(HELDOUT_SEED))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    network = sys.argv[2] if len(sys.argv) > 2 else "realnvp"
    # optional: evaluate + dump a partial anchor every N steps, so slow
    # torch runs yield a usable parity point even if wall-clock runs out
    eval_every = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    from flows import MAF, Ffjord, Flowpp, Glow, PlanarFlow, RealNVP, ResFlow
    nets = {"realnvp": (RealNVP, dict(layers=32)),
            "glow": (Glow, dict(layers=32)),
            "maf": (MAF, dict(layers=32)),
            "planar": (PlanarFlow, dict(layers=32)),
            "flow++": (Flowpp, dict(layers=32, mixtures=8)),
            "resflow": (ResFlow, dict(layers=32, logdet="unbias",
                                      spnorm_coeff=0.9)),
            "ffjord": (Ffjord, dict(layers=3, t0=0.0, t1=1.0, stepsize=0.1,
                                    solver="dopri5", backprop="adjoint",
                                    trace="hutchinson"))}
    cls, default_cfg = nets[network]

    torch.manual_seed(0)
    cfg = SimpleNamespace(**default_cfg)
    net = cls(dims=(2,), datatype="2d", cfg=cfg)
    optim = torch.optim.Adam(net.parameters(), lr=1e-4)
    sched = torch.optim.lr_scheduler.StepLR(optim, step_size=10000, gamma=0.5)
    normal = torch.distributions.MultivariateNormal(torch.zeros(2), torch.eye(2))

    fn, _, _ = TOY_SAMPLERS["normals"]
    rng = np.random.default_rng(0)

    # torch-CPU runs take 4-16h on this box; checkpoint/resume lets a run
    # span multiple build rounds.  The data stream is made resumable by
    # re-drawing the consumed batches (cheap vs the train step itself).
    # Checkpoints live in the COMMITTED anchors/ dir (logs/ is wiped when
    # the box resets between rounds — which is how the round-2 ffjord
    # anchor got stuck at 8k steps).
    os.makedirs("anchors", exist_ok=True)
    ckpt_path = f"anchors/reference_{network}_normals.pt"
    legacy = f"logs/reference_{network}_normals.pt"
    load_path = ckpt_path if os.path.exists(ckpt_path) else legacy
    start_step = 0
    if os.path.exists(load_path):
        # weights_only: the payload is plain state_dicts + an int step;
        # full-pickle load of a committed file would be an arbitrary-code
        # hazard on untrusted checkouts
        state = torch.load(load_path, weights_only=True)
        net.load_state_dict(state["net"])
        optim.load_state_dict(state["optim"])
        sched.load_state_dict(state["sched"])
        start_step = state["step"]
        for _ in range(start_step):
            fn(1024, rng)
        print(f"resumed {network} at step {start_step}", flush=True)
    t0 = time.time()

    def eval_heldout():
        net.eval()
        ho = torch.from_numpy(heldout())
        with torch.no_grad():
            acc = 0.0
            for i in range(0, HELDOUT_N, 4096):
                yb = ho[i:i + 4096]
                z, logdet = net(yb)
                acc += float(-(normal.log_prob(z) + logdet).sum())
        net.train()
        return acc / HELDOUT_N

    net.train()
    for step in range(start_step + 1, steps + 1):
        y = torch.from_numpy(fn(1024, rng))
        z, logdet = net(y)
        loss = -(normal.log_prob(z) + logdet).mean()
        optim.zero_grad()
        loss.backward()
        optim.step()
        sched.step()
        if step % 1000 == 0 or step == 1:
            print(f"[{step}/{steps}] loss={loss.item():.5f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
        if eval_every and step % eval_every == 0 and step != steps:
            part = {"framework": "reference-torch", "network": network,
                    "dataset": "normals", "steps": step,
                    "heldout_nll_nats": eval_heldout(),
                    "train_minutes": (time.time() - t0) / 60,
                    "partial": True}
            print("partial:", json.dumps(part), flush=True)
            # never regress the recorded anchor (a restarted run begins
            # below a previous run's partial step count)
            pf = f"PARITY_reference_{network}_partial.json"
            prev = json.load(open(pf)) if os.path.exists(pf) else {}
            if part["steps"] >= prev.get("steps", 0):
                with open(pf, "w") as f:
                    json.dump(part, f, indent=2)
            torch.save({"net": net.state_dict(),
                        "optim": optim.state_dict(),
                        "sched": sched.state_dict(), "step": step},
                       ckpt_path)

    nll = eval_heldout()

    out = {"framework": "reference-torch", "network": network,
           "dataset": "normals", "steps": steps,
           "heldout_nll_nats": nll, "train_minutes": (time.time()-t0)/60}
    print(json.dumps(out))
    with open(f"PARITY_reference_{network}.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
