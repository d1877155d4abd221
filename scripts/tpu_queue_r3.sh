#!/bin/bash
# Round-3 sequential TPU work queue (one chip, one process at a time).
cd "$(dirname "$0")/.." || exit 1
# persistent XLA compile cache (main.py sets this in-process; scripts
# launched here inherit it via env)
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_comp_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1.0

echo "=== [1/4] ffjord 20k (trained-bench checkpoint) ==="
timeout 4000 python main.py network=ffjord run.distrib=normals \
    train.steps=20000 train.chunk=100 run.display=10 \
    > logs/train_ffjord_20k_r3.log 2>&1

echo "=== [2/4] flow++ 20k (trained-bench checkpoint) ==="
timeout 3000 python main.py network=flow++ run.distrib=normals \
    train.steps=20000 train.chunk=100 run.display=10 \
    > logs/train_flowpp_20k_r3.log 2>&1

echo "=== [3/4] nf_tpu realnvp image @6000 steps (equal-steps row) ==="
timeout 3000 python scripts/image_parity.py nf_tpu realnvp 6000 \
    > logs/nftpu_image_realnvp_6000_r3.log 2>&1

echo "=== [4/4] vardequant A/B ==="
timeout 4000 python scripts/vardequant_ab.py 2000 \
    > logs/vardequant_ab_r3.log 2>&1

echo "=== queue done ==="
