"""Capture a profiler trace of glow-img32x3 train steps and print the
per-op time breakdown (VERDICT r4 item 1: find the bandwidth/compute
consumers in the image-tier train step).

Usage: python scripts/img_trace.py [mode]   mode in {default, bf16}
Writes the trace under logs/trace_img/<mode> and prints the top ops by
self-time parsed from the xplane protobuf.
"""
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

DIMS = (32, 32, 3)
BATCH = 1024
CHUNK = 4


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    if mode == "bf16":
        jax.config.update("jax_default_matmul_precision", "bfloat16")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from nf_tpu.config import Config, NetworkConfig
    from nf_tpu.models import build_model
    from nf_tpu.train import Trainer
    from nf_tpu.utils.profiling import trace

    cfg = Config()
    cfg.network = NetworkConfig(name="glow", layers=32, scan=True, remat=True)
    model = build_model("glow", DIMS, datatype="image", cfg=cfg.network)
    tr = Trainer(model, cfg.optimizer, seed=0)
    key = jax.random.PRNGKey(0)
    batch0 = np.asarray(jax.random.uniform(
        jax.random.fold_in(key, 3), (BATCH,) + DIMS, minval=0.05, maxval=0.95))
    chunk = np.asarray(jax.random.uniform(
        jax.random.fold_in(key, 4), (CHUNK, BATCH) + DIMS,
        minval=0.05, maxval=0.95))
    ts = tr.init_state(key, batch0)
    ts, losses = tr.train_steps(ts, chunk)  # compile + warm
    jax.block_until_ready(losses)

    tdir = f"logs/trace_img/{mode}"
    with trace(tdir):
        ts, losses = tr.train_steps(ts, chunk)
        jax.block_until_ready(losses)

    # ---- parse the xplane protobuf: per-op self time on the device plane
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(f"{tdir}/**/*.xplane.pb", recursive=True)
    assert paths, f"no xplane under {tdir}"
    xspace = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xspace.ParseFromString(f.read())
    for plane in xspace.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        tot = defaultdict(float)
        cnt = defaultdict(int)
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Ops" != line.name:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                tot[name] += ev.duration_ps / 1e9  # ms
                cnt[name] += 1
        if not tot:
            continue
        print(f"== plane: {plane.name} (lines: {[l.name for l in plane.lines]})")
        total_ms = sum(tot.values())
        print(f"total device op time: {total_ms:.1f} ms over {CHUNK} steps")
        for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
            print(f"{ms:9.2f} ms  x{cnt[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
