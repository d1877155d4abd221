#!/bin/bash
# Round-4 sequential TPU work queue (one chip, one process at a time).
# VERDICT r3 items: 3 (flow++ image at scale), 4 (image convergence),
# 5b (MAF resample_masks run), 7 (resflow image end-to-end).
cd "$(dirname "$0")/.." || exit 1
export JAX_COMPILATION_CACHE_DIR="$HOME/.cache/jax_comp_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1.0
mkdir -p results/images/realnvp_mnist results/images/glow_cifar \
         results/images/flowpp_cifar results/images/resflow_mnist16

echo "=== [1/7] MAF resample_masks=true 20k (VERDICT 5b) ==="
timeout 3000 python main.py network=maf run.distrib=normals \
    network.resample_masks=true train.steps=20000 train.chunk=100 \
    run.display=10 > logs/train_maf_resample_r4.log 2>&1
MAF_DIR=$(ls -dt logs/maf_normals_* | head -1)
timeout 1200 python scripts/eval_nll.py maf "$MAF_DIR/latest.npz" \
    normals resample > logs/eval_maf_resample_r4.log 2>&1

echo "=== [2/7] realnvp mnist resume 12k -> 20k (VERDICT 4) ==="
timeout 4200 python main.py network=realnvp run.distrib=mnist \
    network.scan=true network.remat=true run.dequantize=true \
    train.steps=20000 train.chunk=20 run.display=2 run.resume=auto \
    > logs/train_image_20k_r4.log 2>&1
RN_DIR=$(ls -dt logs/realnvp_mnist_* | head -1)
timeout 1800 python scripts/eval_image_nll.py "$RN_DIR/latest.npz" \
    network=realnvp dataset=mnist \
    > results/images/realnvp_mnist/heldout_eval_020000.json 2> /dev/null
cp "$RN_DIR"/y_image_*.jpg "$RN_DIR"/metrics.jsonl \
    results/images/realnvp_mnist/ 2>/dev/null

echo "=== [3/7] glow cifar10 32x32x3 12k (VERDICT 4) ==="
timeout 10000 python main.py network=glow run.distrib=cifar10 \
    network.scan=true network.remat=true run.dequantize=true \
    train.steps=12000 train.chunk=20 run.display=2 run.resume=auto \
    > logs/train_glow_cifar_r4.log 2>&1
GL_DIR=$(ls -dt logs/glow_cifar10_* | head -1)
timeout 1800 python scripts/eval_image_nll.py "$GL_DIR/latest.npz" \
    network=glow dataset=cifar10 \
    > results/images/glow_cifar/heldout_eval.json 2> /dev/null
cp "$GL_DIR"/y_image_*.jpg "$GL_DIR"/metrics.jsonl \
    results/images/glow_cifar/ 2>/dev/null

echo "=== [4/7] flow++ cifar10 32x32x3 vardequant 12k (VERDICT 3) ==="
timeout 12000 python main.py network=flow++ run.distrib=cifar10 \
    network.layers=8 network.scan=true network.remat=true \
    network.var_dequant=true train.samples=256 \
    train.steps=12000 train.chunk=20 run.display=2 run.resume=auto \
    > logs/train_flowpp_cifar_r4.log 2>&1
FP_DIR=$(ls -dt logs/flow++_cifar10_* | head -1)
timeout 2400 python scripts/eval_image_nll.py "$FP_DIR/latest.npz" \
    network=flow++ dataset=cifar10 layers=8 vardequant=true \
    > results/images/flowpp_cifar/heldout_eval.json 2> /dev/null
cp "$FP_DIR"/y_image_*.jpg "$FP_DIR"/metrics.jsonl \
    results/images/flowpp_cifar/ 2>/dev/null

echo "=== [5/7] resflow mnist16 conv image 4k (VERDICT 7) ==="
timeout 7200 python main.py network=resflow run.distrib=mnist16 \
    network.allow_image=true network.layers=8 run.dequantize=true \
    train.samples=256 train.steps=4000 train.chunk=20 run.display=2 \
    run.resume=auto > logs/train_resflow_mnist16_r4.log 2>&1
RF_DIR=$(ls -dt logs/resflow_mnist16_* | head -1)
timeout 2400 python scripts/eval_image_nll.py "$RF_DIR/latest.npz" \
    network=resflow dataset=mnist16 layers=8 allow_image=true \
    scan=false remat=false \
    > results/images/resflow_mnist16/heldout_eval.json 2> /dev/null
cp "$RF_DIR"/y_image_*.jpg "$RF_DIR"/metrics.jsonl \
    results/images/resflow_mnist16/ 2>/dev/null

echo "=== [6/7] vardequant A/B at 16x16 (VERDICT 3 support) ==="
timeout 4000 python scripts/vardequant_ab.py 2000 \
    > logs/vardequant_ab_r4.log 2>&1

echo "=== [7/7] bench: full zoo + image tier ==="
timeout 7200 python bench.py > logs/bench_r4.log 2>&1

echo "=== queue done ==="
