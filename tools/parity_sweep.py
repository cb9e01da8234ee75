"""Device-parity gate: coarse mapper on cached matches, CPU vs accel, all
eval scenes (VERDICT r5 #1 done-criterion: accel within +/-0.01 AUC of CPU
on all 10 scenes).

Usage: python tools/parity_sweep.py --out .eval/r4_evalA \
           --dataset .data/synth5/eval [--scenes s1,s2] [--json out.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".eval/r4_evalA")
    ap.add_argument("--dataset", default=".data/synth5/eval")
    ap.add_argument("--scenes", default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from tools.sweep_mapper_robustness import load_scene
    from detectorfreesfm_tpu.eval.pose_auc import evaluate_poses
    from detectorfreesfm_tpu.sfm.mapper import IncrementalMapper, MapperConfig

    scenes = (args.scenes.split(",") if args.scenes
              else sorted(os.listdir(args.dataset)))
    rows = {}
    worst = 0.0
    for scene in scenes:
        scene_out = os.path.join(args.out, scene)
        if not os.path.exists(os.path.join(scene_out, "matches.h5")):
            print(f"{scene}: no cached matches, skipped")
            continue
        kps, matches, sizes, intr, gt = load_scene(
            scene_out, os.path.join(args.dataset, scene))
        row = {}
        for dev in ("cpu", "accel"):
            os.environ["DFSFM_GEOMETRY_DEVICE"] = dev
            cfg = MapperConfig(camera_model="PINHOLE", refine_focal=False)
            rec = IncrementalMapper(cfg).run(kps, matches, sizes, intr)
            est = {im.name.rsplit(".", 1)[0]: (im.qvec, im.tvec)
                   for im in rec.images.values() if im.registered} if rec else {}
            m = evaluate_poses(est, gt)
            m["registered"] = len(est)
            row[dev] = m
        d5 = abs(row["cpu"]["auc@5"] - row["accel"]["auc@5"])
        d10 = abs(row["cpu"]["auc@10"] - row["accel"]["auc@10"])
        worst = max(worst, d5, d10)
        rows[scene] = row
        print(f"{scene}: cpu AUC@5 {row['cpu']['auc@5']:.3f} "
              f"accel {row['accel']['auc@5']:.3f}  |d5| {d5:.4f} "
              f"|d10| {d10:.4f}  reg {row['cpu']['registered']}/"
              f"{row['accel']['registered']}")
        sys.stdout.flush()
    print(f"\nworst |delta| over scenes: {worst:.4f}  "
          f"gate(<=0.01): {'PASS' if worst <= 0.01 else 'FAIL'}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"scenes": rows, "worst_delta": worst}, f, indent=1)


if __name__ == "__main__":
    main()
