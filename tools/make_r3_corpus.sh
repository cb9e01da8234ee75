#!/bin/bash
# Round-3 training corpus (synth5): the reproducible invocation, committed so
# future rounds can regenerate .data/ (gitignored) exactly.
#
# 192 train scenes at 512 px: 10% planar photo-plane (homography-class),
# 35% hard viewpoint (wide baseline + scale + roll — the round-2 eval
# failure modes), the rest the default multi-plane distribution.
# Eval: 6 default-distribution scenes (same seed convention as round 2's
# eval-v2: seed 10000+i) + 4 hard-distribution scenes (seed 20000+i).
set -e
cd "$(dirname "$0")/.."
TD=/root/reference/SfM_dataset/example_dataset/example_scene/images
TD=$TD,/root/reference/third_party/LoFTR/assets/phototourism_sample_images
TD=$TD,/root/reference/third_party/LoFTR/assets/scannet_sample_images
env PYTHONPATH= PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
python tools/make_synthetic_dataset.py \
  --out .data/synth5 --n-scenes 192 --n-eval-scenes 6 --n-hard-eval-scenes 4 \
  --size 512 --views 8 --tuple-size 4 --n-tuples 60 --seed 0 \
  --planar-frac 0.10 --hard-frac 0.35 \
  --texture-dirs "$TD"
