#!/bin/bash
# Evaluate a matcher checkpoint: synth5 eval scenes (6 default + 4 hard) at
# 832 px with 2 refinement iterations + the epipolar matcher-quality
# diagnostic + the real demo scene.
#
# Usage: bash tools/eval_ckpt.sh <matcher_ckpt> <out_dir> [extra cli args]
set -e
cd "$(dirname "$0")/.."
CKPT=$1
OUT=$2
shift 2
python -m detectorfreesfm_tpu.cli eval-dataset \
  --dataset .data/synth5/eval --output "$OUT" \
  --img-resize 832 --refine-iters 2 --known-intrinsics \
  --matcher-ckpt "$CKPT" \
  --refiner-ckpt weights/demo_refiner_r4_bf16.msgpack \
  "$@"
echo "=== epipolar diagnostic ==="
python tools/diag_epipolar.py --out "$OUT" --dataset .data/synth5/eval
echo "=== demo scene (real data, unknown intrinsics) ==="
DEMO_OUT="$OUT/demo_scene"
python -m detectorfreesfm_tpu.cli reconstruct \
  --images /root/reference/SfM_dataset/example_dataset/example_scene/images \
  --output "$DEMO_OUT" --img-resize 832 --min-inliers 8 --min-tri-angle 1 \
  --refine-iters 4 --refine-windows 15,11,7,7 \
  --refine-thresholds 6,4,3,2.5 --reregister-every 1 \
  --matcher-ckpt "$CKPT" \
  --refiner-ckpt weights/demo_refiner_r4_bf16.msgpack
