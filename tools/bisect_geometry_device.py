"""End-to-end bisection of the TPU-geometry accuracy failure.

Runs the coarse mapper on cached eval matches repeatedly, moving one
geometry kernel at a time onto the accelerator (DFSFM_GEOMETRY_ACCEL_ONLY)
while the rest stay on host CPU, and scores pose AUC vs GT for each
configuration. Identifies which kernel(s) carry the round-4 divergence
(scene_0005: AUC@5 0.77 CPU vs 0.03 all-TPU).

Usage:
  python tools/bisect_geometry_device.py --out .eval/r4_evalA \
      --dataset .data/synth5/eval --scene scene_0005
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np

KERNELS = [
    "estimate_relative_pose",
    "estimate_relative_pose_batch",
    "estimate_homography",
    "estimate_homography_batch",
    "triangulate_dlt",
    "estimate_absolute_pose",
    "estimate_absolute_pose_batch",
    "ba_cost",
    "lm_step",
    "lm_step_pcg",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".eval/r4_evalA")
    ap.add_argument("--dataset", default=".data/synth5/eval")
    ap.add_argument("--scene", default="scene_0005")
    ap.add_argument("--configs", default=None,
                    help="comma list: cpu, accel, or kernel names")
    args = ap.parse_args()

    from tools.sweep_mapper_robustness import load_scene

    scene_out = os.path.join(args.out, args.scene)
    kps, matches, sizes, intr, gt = load_scene(
        scene_out, os.path.join(args.dataset, args.scene))

    from detectorfreesfm_tpu.eval.pose_auc import evaluate_poses
    from detectorfreesfm_tpu.sfm.mapper import IncrementalMapper, MapperConfig

    def run(tag, device, accel_only=""):
        os.environ["DFSFM_GEOMETRY_DEVICE"] = device
        os.environ["DFSFM_GEOMETRY_ACCEL_ONLY"] = accel_only
        cfg = MapperConfig(camera_model="PINHOLE", refine_focal=False)
        rec = IncrementalMapper(cfg).run(kps, matches, sizes, intr)
        if rec is None:
            print(f"{tag}: NO MODEL")
            return
        est = {im.name.rsplit(".", 1)[0]: (im.qvec, im.tvec)
               for im in rec.images.values() if im.registered}
        out = evaluate_poses(est, gt)
        print(f"{tag}: reg {len(est)}/{len(gt)}  "
              + "  ".join(f"AUC@{t} {out['auc@%d' % t]:.3f}"
                          for t in (1, 3, 5, 10)))
        sys.stdout.flush()

    if args.configs:
        want = args.configs.split(",")
    else:
        want = ["cpu", "accel"] + KERNELS
    for c in want:
        if c == "cpu":
            run("all-cpu", "cpu")
        elif c == "accel":
            run("all-accel", "accel")
        else:
            # "+"-joined names move several kernels to accel together
            run(f"accel:{c}", "cpu", accel_only=c.replace("+", ","))


if __name__ == "__main__":
    main()
