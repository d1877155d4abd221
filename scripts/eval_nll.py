"""Evaluate an nf_tpu checkpoint's held-out NLL on the shared parity set.

Usage: python scripts/eval_nll.py <network> <ckpt.npz> [dataset] [logdet]
Companion to scripts/train_reference_nll.py (same held-out seed).

``logdet`` (resflow only): override the eval-time log-det estimator.
``exact`` is recommended for 2D parity rows — the stochastic ``unbias``
eval estimator reports an unbiased but noisy NLL (and nf_tpu's eval rng
is a fixed key, so the noise realization is shared across batches);
the exact 2x2 slogdet measures the same quantity deterministically.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from nf_tpu.utils import enable_persistent_compile_cache
import numpy as np

from nf_tpu.config import Config, NetworkConfig, NETWORK_DEFAULTS
from nf_tpu.data.toy import TOY_SAMPLERS
from nf_tpu.models import build_model
from nf_tpu.train import Trainer, load_checkpoint

HELDOUT_SEED = 9999
HELDOUT_N = 16384


def main():
    enable_persistent_compile_cache()
    network = sys.argv[1]
    ckpt = sys.argv[2]
    dataset = sys.argv[3] if len(sys.argv) > 3 else "normals"

    fn, dims, _ = TOY_SAMPLERS[dataset]
    ho = fn(HELDOUT_N, np.random.default_rng(HELDOUT_SEED))

    cfg = Config()
    cfg.network = NetworkConfig(name=network, **NETWORK_DEFAULTS[network])
    resample = "resample" in sys.argv[4:]
    extra = [a for a in sys.argv[4:] if a != "resample"]
    if extra:
        cfg.network.logdet = extra[0]
    if resample:  # maf reference-behavior mode: per-call mask redraws
        cfg.network.resample_masks = True
    model = build_model(network, dims, datatype="2d", cfg=cfg.network)
    tr = Trainer(model, cfg.optimizer, seed=0)
    ts = tr.init_state(jax.random.PRNGKey(0), ho[:1024])
    ts, step = load_checkpoint(ckpt, ts)

    nll = 0.0
    for i in range(0, HELDOUT_N, 4096):
        key = (jax.random.fold_in(jax.random.PRNGKey(4242), i)
               if resample else None)
        logp = np.asarray(tr.log_prob(ts, ho[i:i + 4096], rng=key))
        nll += float(-logp.sum())
    nll /= HELDOUT_N

    out = {"framework": "nf_tpu", "network": network, "dataset": dataset,
           "steps": step, "heldout_nll_nats": nll}
    if resample:
        out["resample_masks"] = True
    print(json.dumps(out))
    tag = f"{network}_resample" if resample else network
    with open(f"PARITY_nf_tpu_{tag}.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
