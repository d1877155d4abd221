"""Diagnose the flow++ image-stack XLA compile-time pathology (VERDICT r3
weak #2): time trace+lower+compile of the jitted train chunk for the 16x16
flow++ stack with the repeated stages unrolled (scan=False — what
scripts/vardequant_ab.py ran in round 3) vs folded into lax.scan blocks
(scan=True) and remat.

Each config runs in a fresh subprocess with a THROWAWAY compile cache so the
numbers are honest cold-compile times.  Writes COMPILE_PROFILE.json.

Usage:
  python scripts/compile_profile.py            # run all configs
  python scripts/compile_profile.py _one <json-cfg>   # internal worker
"""
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(cfg):
    os.environ["JAX_COMPILATION_CACHE_DIR"] = tempfile.mkdtemp(
        prefix="jax_cc_probe_")
    import jax
    import numpy as np
    from nf_tpu.config import Config, NetworkConfig
    from nf_tpu.models import build_model
    from nf_tpu.train import Trainer

    img = cfg["img"]
    t_all0 = time.time()
    c = Config()
    c.network = NetworkConfig(name="flow++", layers=cfg["layers"],
                              mixtures=cfg["mixtures"],
                              var_dequant=cfg["var_dequant"],
                              scan=cfg["scan"], remat=cfg["remat"])
    model = build_model("flow++", (img, img, 1), datatype="image",
                        cfg=c.network)
    tr = Trainer(model, c.optimizer, seed=0)
    x = np.random.default_rng(0).random((8, 16, img, img, 1),
                                        dtype=np.float32)
    t0 = time.time()
    ts = tr.init_state(jax.random.PRNGKey(0), x[0])
    t_init = time.time() - t0
    t0 = time.time()
    ts, losses = tr.train_steps(ts, x)         # compile + run, chunk of 8
    jax.block_until_ready(losses)
    t_first = time.time() - t0
    t0 = time.time()
    ts, losses = tr.train_steps(ts, x)
    jax.block_until_ready(losses)
    t_steady = time.time() - t0
    print(json.dumps({"init_s": round(t_init, 1),
                      "first_chunk_s": round(t_first, 1),
                      "steady_chunk_s": round(t_steady, 3),
                      "total_s": round(time.time() - t_all0, 1),
                      "platform": jax.devices()[0].platform}))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "_one":
        worker(json.loads(sys.argv[2]))
        return

    configs = [
        # round-3 A/B pathology reproduction: unrolled 16x16, 4 layers
        dict(tag="16x16 L4 unrolled (r3 A/B path)", img=16, layers=4,
             mixtures=4, var_dequant=True, scan=False, remat=False),
        # the fix: scan the repeated stages
        dict(tag="16x16 L4 scan", img=16, layers=4,
             mixtures=4, var_dequant=True, scan=True, remat=False),
        dict(tag="16x16 L4 scan+remat", img=16, layers=4,
             mixtures=4, var_dequant=True, scan=True, remat=True),
        # the north-star shape (small batch probe, compile time only)
        dict(tag="32x32 L4 scan+remat", img=32, layers=4,
             mixtures=4, var_dequant=True, scan=True, remat=True),
    ]
    out = {"note": ("cold XLA compile of the jitted 8-step train chunk, "
                    "fresh subprocess + throwaway compile cache per config"),
           "configs": []}
    for cfg in configs:
        tag = cfg.pop("tag")
        print(f"== {tag}", flush=True)
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "_one",
             json.dumps(cfg)],
            capture_output=True, text=True, timeout=3600, cwd=REPO)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            rec = {"error": (r.stderr or r.stdout)[-2000:]}
        rec.update(tag=tag, wall_s=round(time.time() - t0, 1), **cfg)
        out["configs"].append(rec)
        print(json.dumps(rec), flush=True)
        with open(os.path.join(REPO, "COMPILE_PROFILE.json"), "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
