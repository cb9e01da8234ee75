#!/bin/bash
# Round-5 resolution proof (VERDICT r5 #4): the reference's protocols run
# 840-1600 px (hydra_configs/eth3d_sfm/dfsfm.yaml:77 = 1600,
# IMC/dfsfm.yaml:47 = 1200); round 4 proved resolution mismatch is a real
# failure mode, so round 5 evaluates at 832 px NATIVE (same eval seeds as
# the 512 px corpus -> same scene geometry, rendered at 832) plus a
# 1600 px real-data demo smoke.
#
# Phase A — full 10-scene eval at 832 px native, blessed r5 weights,
#           reference protocol (coarse_fine, 2 refine iters, known K).
# Phase B — 1600 px demo-scene reconstruction (real data, unknown K).
#
# Usage: bash tools/r5_resolution_evals.sh [A|B|all]
set -e
cd "$(dirname "$0")/.."
PHASE=${1:-all}
MATCHER=weights/demo_matcher_r5_bf16.msgpack
REFINER=weights/demo_refiner_r4_bf16.msgpack

if [ "$PHASE" = A ] || [ "$PHASE" = all ]; then
  echo "=== phase A: 832 px native, 10 scenes ==="
  mkdir -p .eval/r5_eval832
  python -m detectorfreesfm_tpu.cli eval-dataset \
    --dataset .data/synth5_832/eval --output .eval/r5_eval832 \
    --img-resize 832 --refine-iters 2 --known-intrinsics \
    --matcher-ckpt "$MATCHER" --refiner-ckpt "$REFINER" \
    2>&1 | tail -40
fi

if [ "$PHASE" = B ] || [ "$PHASE" = all ]; then
  echo "=== phase B: 1600 px demo smoke (real data) ==="
  python -m detectorfreesfm_tpu.cli reconstruct \
    --images /root/reference/SfM_dataset/example_dataset/example_scene/images \
    --output .eval/r5_demo1600 --img-resize 1600 \
    --min-inliers 8 --min-tri-angle 1 \
    --refine-iters 2 --reregister-every 1 \
    --matcher-ckpt "$MATCHER" --refiner-ckpt "$REFINER" \
    2>&1 | tail -5
fi
echo "=== done ==="
