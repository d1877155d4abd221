"""A/B: variational dequantization vs uniform dequantization (Flow++).

Demonstrates that `network.var_dequant` (bijectors/vardequant.py — no
reference counterpart; Ho et al. 2019) actually buys likelihood on the
repo's image protocol: same synthetic-MNIST 16x16 data, same model
everywhere else, same batch stream, same step count.

Discrete bits/dim accounting (D = H*W*C, nb = 256):
  * uniform:  log P(x) >= E_u[ log p((255x+u)/256) ] - D log nb
              (y fed to the flow is freshly dequantized each batch);
  * vardequant: the head consumes RAW quantized x and returns
              ld = -log q(u|x) - D log nb inside the chain, so
              model log_prob(x) IS the single-sample ELBO of log P(x).
Both evals average the bound over N_NOISE fresh noise draws.

Usage: python scripts/vardequant_ab.py [steps]
Writes VARDEQUANT_AB.json at the repo root.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

# 16x16, 4-layer stack.  Round 3 ran 8x8/2-layer because this config
# appeared to take ">25 min of XLA compile" — root-caused in round 4 to
# (a) an uncommitted-scalar double-compile in Trainer.init_state (fixed,
# see trainer.py) and (b) this script not enabling the persistent compile
# cache (fixed below); the actual cold compile is ~35 s
# (COMPILE_PROFILE.json) and warm loads are seconds.
# defaults reproduce the round-4 16x16 entry; env overrides let the A/B
# run at the north-star scale (VERDICT r4 item 6):
#   NF_AB_IMG=32 NF_AB_C=3 NF_AB_LAYERS=32 NF_AB_BATCH=256 \
#       python scripts/vardequant_ab.py 2000
IMG = int(os.environ.get("NF_AB_IMG", 16))
C = int(os.environ.get("NF_AB_C", 1))
D = IMG * IMG * C
BATCH = int(os.environ.get("NF_AB_BATCH", 128))
LAYERS = int(os.environ.get("NF_AB_LAYERS", 4))
MIXTURES = int(os.environ.get("NF_AB_MIXTURES", 4))
N_TRAIN = 10240
N_HELDOUT = 2048
N_NOISE = 8


def build_data():
    from nf_tpu.data.images import synthetic_images
    x = synthetic_images("cifar10" if C == 3 else "mnist",
                         N_TRAIN + N_HELDOUT, seed=777)
    k = 32 // IMG
    x = x[:, ::k, ::k, :]
    x = np.round(x * 255.0) / 255.0  # raw quantized pixels in [0,1]
    return x[:N_TRAIN], x[N_TRAIN:]


def run(var_dequant: bool, steps: int):
    import jax

    from nf_tpu.config import Config, NetworkConfig
    from nf_tpu.models import build_model
    from nf_tpu.train import Trainer
    from nf_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    train, heldout = build_data()
    idx = np.random.default_rng(31337).integers(0, N_TRAIN,
                                                size=(steps, BATCH))
    noise_rng = np.random.default_rng(4242)

    cfg = Config()
    cfg.network = NetworkConfig(name="flow++", layers=LAYERS,
                                mixtures=MIXTURES, var_dequant=var_dequant,
                                scan=True, remat=True)
    model = build_model("flow++", (IMG, IMG, C), datatype="image",
                        cfg=cfg.network)
    tr = Trainer(model, cfg.optimizer, seed=0)

    def feed(batch):
        if var_dequant:
            return batch  # the head dequantizes internally
        u = noise_rng.random(batch.shape, dtype=np.float32)
        return (batch * 255.0 + u) / 256.0

    ts = tr.init_state(jax.random.PRNGKey(0), feed(train[idx[0]]))
    t0 = time.time()
    CHUNK = 20
    for s0 in range(0, steps, CHUNK):
        batches = np.stack([feed(train[i]) for i in idx[s0:s0 + CHUNK]])
        ts, losses = tr.train_steps(ts, batches)
        if s0 % 400 == 0:
            print(f"[{'vd' if var_dequant else 'uni'} {s0}/{steps}] "
                  f"loss={float(losses[-1]):.2f} ({time.time()-t0:.0f}s)",
                  flush=True)

    # held-out discrete bits/dim bound, averaged over fresh noise draws
    import jax as _jax
    total = 0.0
    for draw in range(N_NOISE):
        acc = 0.0
        for i in range(0, N_HELDOUT, 256):
            hb = heldout[i:i + 256]
            if var_dequant:
                key = _jax.random.fold_in(_jax.random.PRNGKey(99),
                                          draw * 1000 + i)
                lp = np.asarray(tr.log_prob(ts, hb, rng=key))
            else:
                u = noise_rng.random(hb.shape, dtype=np.float32)
                y = (hb * 255.0 + u) / 256.0
                lp = np.asarray(tr.log_prob(ts, y)) - D * np.log(256.0)
            acc += float(lp.sum())
        total += acc / N_HELDOUT
    logP = total / N_NOISE
    bpd = -logP / (D * np.log(2.0))
    return bpd, (time.time() - t0) / 60


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    name = "cifar10" if C == 3 else "mnist"
    out = {"dataset": f"synthetic-{name}-{IMG}x{IMG}x{C}-8bit",
           "model": f"flow++ image, layers={LAYERS}, mixtures={MIXTURES}",
           "steps": steps, "batch": BATCH, "noise_draws": N_NOISE}
    for tag, vd in (("uniform", False), ("var_dequant", True)):
        bpd, minutes = run(vd, steps)
        out[tag] = {"bits_per_dim_discrete": bpd, "train_minutes": minutes}
        print(f"{tag}: {bpd:.4f} bits/dim ({minutes:.1f} min)", flush=True)
    out["delta_bits_per_dim"] = (out["uniform"]["bits_per_dim_discrete"]
                                 - out["var_dequant"]["bits_per_dim_discrete"])
    # merge into the committed artifact: one entry per config scale
    path = os.path.join(REPO, "VARDEQUANT_AB.json")
    doc = {}
    if os.path.exists(path):
        doc = json.load(open(path))
        if "runs" not in doc:  # legacy single-config layout
            doc = {"runs": {f"16x16x1_L4_s{doc.get('steps', 2000)}": doc}}
    else:
        doc = {"runs": {}}
    doc["runs"][f"{IMG}x{IMG}x{C}_L{LAYERS}_s{steps}"] = out
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
