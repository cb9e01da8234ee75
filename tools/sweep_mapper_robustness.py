"""Coarse-mapper robustness sweep on cached eval matches (CPU).

The three failing eval scenes (RESULTS_r04.md) have floor-level matches
but multi-degree coarse models — this sweeps the mapper's outlier-handling
knobs (verify/filter thresholds, two-view-track policy) against the exact
cached matches an eval produced, scoring coarse pose AUC vs GT.

Usage: python tools/sweep_mapper_robustness.py --out .eval/r4_evalA \
           --dataset .data/synth5/eval --scenes scene_0005,scene_1003
"""

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def load_scene(out_dir, scene_dir):
    from detectorfreesfm_tpu.data.h5io import load_h5
    from detectorfreesfm_tpu.pipeline import read_intrin_txt, read_pose_txt

    kps = load_h5(os.path.join(out_dir, "keypoints.h5"))
    raw = load_h5(os.path.join(out_dir, "matches.h5"))
    matches = {
        tuple(k.split("|")): np.asarray(v, np.int64) for k, v in raw.items()
    }
    intr, gt = {}, {}
    for f in sorted(os.listdir(os.path.join(scene_dir, "intrins"))):
        stem = os.path.splitext(f)[0]
        intr[stem + ".png"] = read_intrin_txt(
            os.path.join(scene_dir, "intrins", f))
        gt[stem] = read_pose_txt(os.path.join(scene_dir, "poses", f))
    kps = {n: np.asarray(v) for n, v in kps.items()}
    sizes = {n: (512, 512) for n in kps}
    return kps, matches, sizes, intr, gt


def score(kps, matches, sizes, intr, gt, cfg):
    from detectorfreesfm_tpu.eval.pose_auc import evaluate_poses
    from detectorfreesfm_tpu.sfm.mapper import IncrementalMapper

    rec = IncrementalMapper(cfg).run(kps, matches, sizes, intr)
    if rec is None:
        return {"registered": 0}
    est = {im.name.rsplit(".", 1)[0]: (im.qvec, im.tvec)
           for im in rec.images.values() if im.registered}
    out = evaluate_poses(est, gt)
    out["registered"] = len(est)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--scenes", required=True)
    args = ap.parse_args()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from detectorfreesfm_tpu.sfm.mapper import MapperConfig

    variants = {
        "default": {},
        "tight_filter": {"filter_max_reproj_error": 4.0},
        "tight_all": {"filter_max_reproj_error": 4.0,
                      "geometry_verify_thr": 4.0, "init_max_error": 4.0},
        "no2view": {"tri_ignore_two_view_tracks": True},
        "tight+no2view": {"filter_max_reproj_error": 4.0,
                          "tri_ignore_two_view_tracks": True},
        "min_tri3": {"filter_max_reproj_error": 4.0,
                     "min_tri_angle_deg": 3.0},
    }
    for s in args.scenes.split(","):
        data = load_scene(os.path.join(args.out, s),
                          os.path.join(args.dataset, s))
        for name, kw in variants.items():
            m = score(*data, MapperConfig(**kw))
            print(json.dumps({
                "scene": s, "variant": name,
                **{k: round(float(v), 4) for k, v in m.items()}}),
                flush=True)


if __name__ == "__main__":
    main()
