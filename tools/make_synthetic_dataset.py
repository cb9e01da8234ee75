#!/usr/bin/env python
"""Generate a synthetic posed-RGBD corpus for supervised training + eval.

Writes MegaDepth-style scene indexes (consumed by `cli.py train` /
`train-matcher`) and optional eval-layout scenes with GT poses/intrinsics
(consumed by `cli.py eval-dataset` for pose-AUC protocol numbers).

Usage:
  python tools/make_synthetic_dataset.py --out data/synth --n-scenes 24 \
      --n-eval-scenes 3 --size 512 --views 8
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from detectorfreesfm_tpu.data.synthetic import (  # noqa: E402
    SyntheticConfig, write_scene, write_scene_eval_layout,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-scenes", type=int, default=24)
    ap.add_argument("--n-eval-scenes", type=int, default=3)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--tuple-size", type=int, default=4)
    ap.add_argument("--n-tuples", type=int, default=60)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--texture-dirs", default=None,
                    help="comma-separated dirs of real photos used as plane"
                         " textures (real appearance, exact synth geometry)")
    ap.add_argument("--planar-frac", type=float, default=0.0,
                    help="fraction of train scenes rendered as a single"
                         " photo-textured plane (homography-class pairs —"
                         " the self-supervised objective expressed as posed"
                         " RGBD, so one trainer consumes both)")
    ap.add_argument("--hard-frac", type=float, default=0.0,
                    help="fraction of train scenes rendered with a harder"
                         " viewpoint distribution: wider baseline, stronger"
                         " scale change, in-plane roll — the round-2 eval"
                         " failure modes")
    ap.add_argument("--n-hard-eval-scenes", type=int, default=0,
                    help="extra eval scenes drawn from the hard distribution"
                         " (written as eval/scene_1###)")
    args = ap.parse_args()

    photos = []
    if args.texture_dirs:
        import glob

        for d in args.texture_dirs.split(","):
            for ext in ("*.jpg", "*.JPG", "*.png", "*.jpeg"):
                photos.extend(sorted(glob.glob(os.path.join(d, ext))))
        print(f"texture pool: {len(photos)} photos")

    cfg = SyntheticConfig(
        size=args.size, n_views=args.views,
        tuple_size=args.tuple_size, n_tuples=args.n_tuples,
        texture_photos=tuple(photos),
    )
    # Planar scenes: one fronto-ish photo plane close to the cameras, small
    # baseline, high-res texture — the induced inter-view warp is a pure
    # homography with exact depth, i.e. homography self-supervision on real
    # appearance through the same depth-warp objective.
    planar_cfg = dataclasses.replace(
        cfg, n_planes=0, background_depth=6.0, depth_range=(5.0, 7.0),
        baseline=1.3, texture_size=1536, photo_texture_prob=1.0,
        background_half=7.0,
    )
    # Hard scenes: wider baseline + stronger per-view scale change + roll.
    # Matches the failure modes of round-2 eval scenes 0001/0002 (18-36 px
    # median epipolar error under harder viewpoint change, RESULTS_r02.md).
    hard_cfg = dataclasses.replace(
        cfg, baseline=3.2, depth_range=(3.5, 9.5), n_planes=8,
        focal_range=(0.75, 2.0), up_jitter=0.12, roll_range=0.35,
        eye_z_range=(-1.6, 2.2),
    )
    n_planar = int(round(args.n_scenes * args.planar_frac))
    n_hard = int(round(args.n_scenes * args.hard_frac))
    train_dir = os.path.join(args.out, "train")
    os.makedirs(train_dir, exist_ok=True)
    for i in range(args.n_scenes):
        t0 = time.time()
        if i < n_planar:
            c, kind = planar_cfg, "planar"
        elif i < n_planar + n_hard:
            c, kind = hard_cfg, "hard"
        else:
            c, kind = cfg, "multi"
        p = write_scene(train_dir, f"scene_{i:04d}", args.seed + i, c)
        print(f"[{i + 1}/{args.n_scenes}] {p} ({kind}, "
              f"{time.time() - t0:.1f}s)", flush=True)
    for i in range(args.n_eval_scenes):
        d = os.path.join(args.out, "eval", f"scene_{i:04d}")
        write_scene_eval_layout(d, args.seed + 10_000 + i, cfg)
        print(f"eval scene {d}", flush=True)
    for i in range(args.n_hard_eval_scenes):
        d = os.path.join(args.out, "eval", f"scene_{1000 + i:04d}")
        write_scene_eval_layout(d, args.seed + 20_000 + i, hard_cfg)
        print(f"hard eval scene {d}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
