"""Held-out bits/dim for a full-scale image-run checkpoint.

The training pool is `synthetic_images(name, 8192, seed=stream_seed(0))`
(data/loader.py); held-out images are fresh draws from the same
deterministic generator under a disjoint seed, quantized to the 8-bit
grid like the loader's pool, and uniformly dequantized per noise draw.
Reports the dequantization-bound discrete bits/dim
(nats/(D ln2) + log2 256) averaged over --draws noise samples.

Usage:
    python scripts/eval_image_nll.py <ckpt.npz> [network=realnvp]
        [dataset=mnist] [draws=4]
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

HELDOUT_SEED = 777_001  # disjoint from the loader's stream seeds
N_HELDOUT = 2048


def main():
    ckpt = sys.argv[1]
    kv = dict(a.split("=", 1) for a in sys.argv[2:])
    network = kv.get("network", "realnvp")
    dataset = kv.get("dataset", "mnist")
    draws = int(kv.get("draws", 4))

    import jax
    from nf_tpu.utils import enable_persistent_compile_cache
    enable_persistent_compile_cache()

    from nf_tpu.config import Config, NetworkConfig, NETWORK_DEFAULTS
    from nf_tpu.data.images import IMAGE_DATASETS, load_images
    from nf_tpu.models import build_model
    from nf_tpu.train import Trainer, load_checkpoint

    cfg = Config()
    cfg.network = NetworkConfig(name=network, **NETWORK_DEFAULTS[network])
    # the full-scale run's memory-path flags (PARITY_RESULTS.md §full-scale)
    cfg.network.scan = kv.get("scan", "true") == "true"
    cfg.network.remat = kv.get("remat", "true") == "true"
    cfg.network.layers = int(kv.get("layers", cfg.network.layers))
    # beyond-parity variants: opt-in image models (maf/resflow/ffjord) and
    # flow++'s variational dequantization
    cfg.network.allow_image = kv.get("allow_image", "false") == "true"
    vardequant = kv.get("vardequant", "false") == "true"
    cfg.network.var_dequant = vardequant

    dims = IMAGE_DATASETS[dataset]
    model = build_model(network, dims, datatype="image", cfg=cfg.network)
    tr = Trainer(model, cfg.optimizer, seed=0)

    # held-out draws below come from the synthetic generator; if the data
    # dir holds real MNIST/CIFAR files the loader would have TRAINED on
    # those, and scoring against synthetic draws would silently evaluate a
    # different distribution — refuse rather than misreport
    _, is_real = load_images(dataset, kv.get("data_root", "data"))
    if is_real:
        raise SystemExit(
            f"real {dataset} files present under data/: the checkpoint was "
            "trained on them, but this evaluator's held-out set is "
            "synthetic. Evaluate with a held-out split of the real data "
            "instead.")
    # load_images (not synthetic_images) so the 16x16 subsampled variants
    # resolve; a disjoint seed keeps the held-out pool off the training
    # stream
    x, _ = load_images(dataset, kv.get("data_root", "data"),
                       seed=HELDOUT_SEED, synthetic_n=N_HELDOUT)
    x = x[:N_HELDOUT]
    x8 = np.floor(x * 255.0 + 0.5) / 255.0  # snap to the 8-bit grid

    ts = tr.init_state(jax.random.PRNGKey(0), x8[:256])
    ts, step = load_checkpoint(ckpt, ts)

    d = int(np.prod(dims))
    rng = np.random.default_rng(HELDOUT_SEED + 1)
    t0 = time.time()
    nll_draws = []
    for k in range(draws):
        acc = 0.0
        if vardequant:
            # the head consumes RAW quantized pixels and its returned
            # logdet already carries -log q(u|x) - D log 256, so
            # -log_prob IS the discrete single-sample ELBO in nats
            for i in range(0, N_HELDOUT, 256):
                key = jax.random.fold_in(jax.random.PRNGKey(HELDOUT_SEED),
                                         k * 100_000 + i)
                logp = np.asarray(tr.log_prob(ts, x8[i:i + 256], rng=key))
                acc += float(-logp.sum())
        else:
            u = rng.random(x8.shape)
            y = (x8 * 255.0 + u) / 256.0
            for i in range(0, N_HELDOUT, 256):
                logp = np.asarray(tr.log_prob(ts, y[i:i + 256]))
                acc += float(-logp.sum())
        nll_draws.append(acc / N_HELDOUT)
    nll = float(np.mean(nll_draws))
    bpd = nll / (d * np.log(2.0))
    if vardequant:
        # nll is already discrete (the -D log 256 lives inside the chain)
        out_discrete = bpd
        bpd = bpd - 8.0  # continuous-equivalent for the shared report keys
    else:
        out_discrete = bpd + 8.0
    out = {
        "ckpt": ckpt, "network": network, "dataset": dataset,
        "trained_steps": int(step), "n_heldout": N_HELDOUT,
        "noise_draws": draws,
        "heldout_nll_nats": nll,
        "heldout_nll_per_draw": nll_draws,
        "bits_per_dim_continuous": bpd,
        "bits_per_dim_discrete": out_discrete,
        "vardequant": vardequant,
        "eval_minutes": (time.time() - t0) / 60,
    }
    print(json.dumps(out, indent=2))
    return out


if __name__ == "__main__":
    main()
