#!/bin/bash
# Round-4 final evaluation chain (run AFTER the refiner chain finishes and
# the winning epoch has been blessed to weights/demo_refiner_r4_bf16.msgpack):
#   C  — full 10-scene eval, TPU processes, FRESH matching (fixed fused DSM),
#        reference protocol (2 refinement iterations), r4 refiner.
#   C4 — same matches, 4 refinement iterations (the retrained refiner keeps
#        gaining ~0.05 AUC@5/iter on scene_0000, so 2 iters undersells it).
#   demo — real-data 8-image scene, unknown intrinsics, demo config.
# Usage: bash tools/r4_final_evals.sh
set -e
cd "$(dirname "$0")/.."
REFINER=weights/demo_refiner_r4_bf16.msgpack
MATCHER=weights/demo_matcher_r3_bf16.msgpack

echo "=== eval C: fresh TPU matching, 2 refine iters ==="
mkdir -p .eval/r4_evalC
python -m detectorfreesfm_tpu.cli eval-dataset \
  --dataset .data/synth5/eval --output .eval/r4_evalC \
  --img-resize 512 --refine-iters 2 --known-intrinsics \
  --matcher-ckpt "$MATCHER" --refiner-ckpt "$REFINER" \
  2>&1 | tail -30

echo "=== eval C4: cached C matches, 4 refine iters ==="
mkdir -p .eval/r4_evalC4
for s in .eval/r4_evalC/scene_*; do
  n=$(basename "$s")
  mkdir -p ".eval/r4_evalC4/$n"
  cp "$s/keypoints.h5" "$s/matches.h5" ".eval/r4_evalC4/$n/" 2>/dev/null || true
done
python -m detectorfreesfm_tpu.cli eval-dataset \
  --dataset .data/synth5/eval --output .eval/r4_evalC4 \
  --img-resize 512 --refine-iters 4 --known-intrinsics \
  --matcher-ckpt "$MATCHER" --refiner-ckpt "$REFINER" \
  2>&1 | tail -30

echo "=== demo scene (real data, unknown intrinsics) ==="
python -m detectorfreesfm_tpu.cli reconstruct \
  --images /root/reference/SfM_dataset/example_dataset/example_scene/images \
  --output .eval/r4_demo --img-resize 832 --min-inliers 8 --min-tri-angle 1 \
  --refine-iters 4 --refine-windows 15,11,7,7 \
  --refine-thresholds 6,4,3,2.5 --reregister-every 1 \
  --matcher-ckpt "$MATCHER" --refiner-ckpt "$REFINER" \
  2>&1 | tail -5
echo "=== done ==="
