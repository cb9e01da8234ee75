#!/bin/bash
# Round-3 matcher training: one epoch per process, chained via --init-ckpt.
#
# Rationale: the axon TPU transfer path leaks ~16 MB of host RSS per train
# step (f32 image staging buffers are never freed); a single 20-epoch
# process OOM-kills the box at ~7.5k steps. One process per epoch bounds
# RSS at ~38 GB and loses only the ~90 s of per-process compile time.
#
# Usage: bash tools/train_r3_matcher.sh [start_epoch] [end_epoch]
set -e
cd "$(dirname "$0")/.."
START=${1:-0}
END=${2:-19}
OUT=.ckpt/r3m
mkdir -p "$OUT"
for ep in $(seq "$START" "$END"); do
  if [ "$ep" -eq 0 ]; then
    INIT=weights/demo_matcher_r2_bf16.msgpack
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
    --init-ckpt "$INIT" --log-every 50
done
