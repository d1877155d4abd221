"""Where does the MAF 0.712-vs-0.383 held-out delta open?

Round-4 disproved the mask-scheduling explanation (resample_masks is the
identity at d=2); this experiment measures the loss TRAJECTORIES.  The
companion torch run (scripts/train_reference_nll.py 3000 maf 500) trains
the reference MAF (flows/maf.py:122-148, reference recipe Adam 1e-4 /
StepLR x0.5/10k / batch 1024) on identically distributed data and
evaluates the shared held-out set (seed 9999) every 500 steps; this script
does the same for nf_tpu's MAF and writes both curves side by side to
REFERENCE_MAF_TRAJECTORY.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

from nf_tpu.config import Config, NetworkConfig, NETWORK_DEFAULTS
from nf_tpu.data.toy import TOY_SAMPLERS
from nf_tpu.models import build_model
from nf_tpu.train import Trainer
from nf_tpu.utils import enable_persistent_compile_cache

HELDOUT_SEED = 9999
HELDOUT_N = 16384
STEPS = 3000
EVAL_EVERY = 500
BATCH = 1024
CHUNK = 50


def main():
    enable_persistent_compile_cache()
    fn, dims, _ = TOY_SAMPLERS["normals"]
    ho = fn(HELDOUT_N, np.random.default_rng(HELDOUT_SEED))
    rng = np.random.default_rng(0)

    cfg = Config()
    cfg.network = NetworkConfig(name="maf", **NETWORK_DEFAULTS["maf"])
    model = build_model("maf", dims, datatype="2d", cfg=cfg.network)
    tr = Trainer(model, cfg.optimizer, seed=0)
    ts = tr.init_state(jax.random.PRNGKey(0), ho[:1024])

    def heldout_nll(ts):
        acc = 0.0
        for i in range(0, HELDOUT_N, 4096):
            acc += float(-np.asarray(tr.log_prob(ts, ho[i:i + 4096])).sum())
        return acc / HELDOUT_N

    curve = []
    for step in range(0, STEPS, EVAL_EVERY):
        for _ in range(EVAL_EVERY // CHUNK):
            batches = np.stack([fn(BATCH, rng) for _ in range(CHUNK)])
            ts, losses = tr.train_steps(ts, batches)
        nll = heldout_nll(ts)
        curve.append({"steps": step + EVAL_EVERY,
                      "heldout_nll_nats": nll,
                      "train_loss": float(np.asarray(losses)[-1])})
        print(json.dumps(curve[-1]), flush=True)

    ref_curve = json.load(open(sys.argv[1])) if len(sys.argv) > 1 else None
    out = {"experiment": "maf loss-trajectory, nf_tpu vs torch reference on "
                         "identically distributed data (shared held-out set)",
           "nf_tpu": curve, "reference": ref_curve}
    with open("REFERENCE_MAF_TRAJECTORY.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote REFERENCE_MAF_TRAJECTORY.json")


if __name__ == "__main__":
    main()
