#!/bin/bash
# Train the alternative matcher families (ASpanFormer-class,
# MatchFormer-class) on the same synth5 depth-warp corpus — coarse
# objective only (their forwards share the dense-conf contract via
# return_conf; the fine head is LoFTR-family only).
# One-epoch-per-process chaining, same rationale as train_r3_matcher.sh.
#
# Usage: bash tools/train_alt_matchers.sh <arch> <epochs>
set -e
cd "$(dirname "$0")/.."
ARCH=${1:-aspan}
EPOCHS=${2:-2}
OUT=.ckpt/r3_$ARCH
mkdir -p "$OUT"
for ep in $(seq 0 $((EPOCHS - 1))); do
  INIT=""
  if [ "$ep" -gt 0 ]; then
    INIT="--init-ckpt $OUT/matcher_ep$((ep - 1)).msgpack"
  fi
  if [ -f "$OUT/matcher_ep${ep}.msgpack" ]; then
    echo "epoch $ep already done, skipping"
    continue
  fi
  echo "=== $ARCH epoch $ep ==="
  python -m detectorfreesfm_tpu.cli train-matcher \
    --arch "$ARCH" \
    --data .data/synth5/train --output "$OUT" \
    --epochs 1 --start-epoch "$ep" \
    --batch-size 8 --img-resize 512 --dtype-train bfloat16 \
    --samples-per-scene 60 \
    $INIT --log-every 50
done
