#!/bin/bash
# Round-4 refiner training (VERDICT r3 task #2): the multiview refiner gets
# the same treatment the matcher got in round 3 — depth-warp supervision on
# the harder 192-scene synth5 corpus (35% hard viewpoint distribution),
# chained one-epoch processes via --init-ckpt.
#
# One process per epoch bounds the axon transfer-path host-RSS leak (see
# tools/train_r3_matcher.sh header); each epoch is 192 scenes x
# samples-per-scene tuples, batched.
#
# Usage: bash tools/train_r4_refiner.sh [start_epoch] [end_epoch]
set -e
cd "$(dirname "$0")/.."
START=${1:-0}
END=${2:-7}
OUT=.ckpt/r4ref
mkdir -p "$OUT"
for ep in $(seq "$START" "$END"); do
  if [ -f "$OUT/ckpt_ep${ep}.msgpack" ]; then
    echo "epoch $ep already done, skipping"
    continue
  fi
  EXTRA=()
  if [ "$ep" -eq 0 ]; then
    INIT=weights/demo_refiner_r2_bf16.msgpack
  else
    INIT=$OUT/ckpt_ep$((ep - 1)).msgpack
  fi
  if [ -n "$INIT" ]; then EXTRA+=(--init-ckpt "$INIT"); fi
  echo "=== refiner epoch $ep (init: ${INIT:-scratch}) ==="
  python -m detectorfreesfm_tpu.cli train \
    --data .data/synth5/train --output "$OUT" \
    --epochs 1 --start-epoch "$ep" \
    --batch-size 4 --img-resize 512 \
    --samples-per-scene 50 --log-every 50 \
    "${EXTRA[@]}"
done
