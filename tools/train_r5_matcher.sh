#!/bin/bash
# Round-5 matcher training: fix the fine head (VERDICT r5 #2).
#
# Round 4 measured the r3 fine head DEGRADING coordinates (median epi 2.67
# vs 1.41 px coarse on scene_0000). Root cause was a train/inference
# coordinate-convention mismatch fixed in train/matcher_supervision.py
# (corner source points + nearest-cell assignment so fine targets live in
# the window's +/-4 px reach). This retrains coarse+fine jointly from the
# r3 checkpoint with GEOMETRIC accuracy measured after every epoch
# (tools/diag_matcher.py --fine), per the round-5 done-criterion: fine
# coords strictly better than coarse on the diag scenes.
#
# One epoch per process (axon transfer path leaks ~16 MB RSS/step; see
# train_r3_matcher.sh).
#
# Usage: bash tools/train_r5_matcher.sh [start_epoch] [end_epoch]
set -e
cd "$(dirname "$0")/.."
START=${1:-0}
END=${2:-11}
OUT=.ckpt/r5m
mkdir -p "$OUT"
for ep in $(seq "$START" "$END"); do
  if [ "$ep" -eq 0 ]; then
    INIT=weights/demo_matcher_r3_bf16.msgpack
  else
    INIT=$OUT/matcher_ep$((ep - 1)).msgpack
  fi
  if [ -f "$OUT/matcher_ep${ep}.msgpack" ]; then
    echo "epoch $ep already done, skipping"
    continue
  fi
  echo "=== epoch $ep (init: $INIT) ==="
  python -m detectorfreesfm_tpu.cli train-matcher \
    --data .data/synth5/train --output "$OUT" \
    --epochs 1 --start-epoch "$ep" \
    --batch-size 8 --img-resize 512 --dtype-train bfloat16 --fine \
    --samples-per-scene 100 \
    --init-ckpt "$INIT" --log-every 100
  echo "=== epoch $ep fine diag ==="
  python tools/diag_matcher.py --ckpt "$OUT/matcher_ep${ep}.msgpack" \
    --dataset .data/synth5/eval --scenes scene_0000,scene_0005 \
    --img-resize 512 --fine 2>&1 | tail -8 | tee -a "$OUT/fine_diag.log"
  python tools/diag_matcher.py --ckpt "$OUT/matcher_ep${ep}.msgpack" \
    --dataset .data/synth5/eval --scenes scene_0000,scene_0005 \
    --img-resize 512 2>&1 | tail -8 | tee -a "$OUT/coarse_diag.log"
done
