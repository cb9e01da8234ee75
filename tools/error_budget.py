"""Error-budget breakdown for one evaluated scene (VERDICT r3 weak #4).

Where does the remaining pose error come from? This tool decomposes it by
pipeline stage, mirroring the reference's staged artifacts
(post_optimization.py writes model_coarse / model_refined_i):

  1. matching     — median epipolar error of the cached matches vs GT
                    (the matcher ceiling; diag_epipolar protocol)
  2. coarse SfM   — pairwise pose errors + AUC of colmap_coarse/
  3. refine iter i — same for each model_refined_{i}/
  4. final        — same for colmap_refined/

Usage:
  python tools/error_budget.py --out OUT_DIR/scene_XXXX \
      --scene DATASET/eval/scene_XXXX
Prints a per-stage table + one JSON line.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def _load_gt(scene_dir):
    from detectorfreesfm_tpu.pipeline import read_pose_txt

    poses = {}
    pd = os.path.join(scene_dir, "poses")
    for f in sorted(os.listdir(pd)):
        if f.endswith(".txt"):
            poses[os.path.splitext(f)[0]] = read_pose_txt(
                os.path.join(pd, f))
    return poses


def _stage_metrics(model_dir, gt):
    """Pose AUC + median pairwise rot/trans errors for one COLMAP model."""
    from detectorfreesfm_tpu.data import colmap_io
    from detectorfreesfm_tpu.eval.pose_auc import (
        all_pairs_relative_errors, evaluate_poses,
    )

    _, images, _pts = colmap_io.read_model(model_dir)
    est = {os.path.splitext(im.name)[0]: (im.qvec, im.tvec)
           for im in images.values()}
    out = evaluate_poses(est, gt)
    # median over REGISTERED pairs only (AUC already charges the missing)
    names = sorted(gt)
    qg = np.stack([np.asarray(gt[k][0], np.float64) for k in names])
    tg = np.stack([np.asarray(gt[k][1], np.float64) for k in names])
    qe = np.zeros((len(names), 4))
    qe[:, 0] = 1.0
    te = np.zeros((len(names), 3))
    reg = np.zeros(len(names), bool)
    for i, k in enumerate(names):
        if k in est:
            qe[i], te[i] = est[k]
            reg[i] = True
    errs = all_pairs_relative_errors(qe, te, reg, qg, tg)
    finite = errs[np.isfinite(errs)]
    out["median_pair_err_deg"] = (
        float(np.median(finite)) if len(finite) else float("inf"))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True,
                    help="scene output dir (colmap_coarse/ etc.)")
    ap.add_argument("--scene", required=True,
                    help="dataset scene dir (poses/ intrins/)")
    args = ap.parse_args()
    gt = _load_gt(args.scene)

    stages = []
    coarse = os.path.join(args.out, "colmap_coarse")
    if os.path.isdir(coarse):
        stages.append(("coarse_sfm", coarse))
    i = 0
    while os.path.isdir(os.path.join(args.out, f"model_refined_{i}")):
        stages.append((f"refine_{i}",
                       os.path.join(args.out, f"model_refined_{i}")))
        i += 1
    final = os.path.join(args.out, "colmap_refined")
    if os.path.isdir(final):
        stages.append(("final", final))

    rows = {}
    print(f"{'stage':<12} {'reg':>4} {'med_pair_err_deg':>17} "
          f"{'auc@1':>7} {'auc@3':>7} {'auc@5':>7} {'auc@10':>7}")
    for name, d in stages:
        m = _stage_metrics(d, gt)
        rows[name] = m
        print(f"{name:<12} {int(m['n_registered']):>4} "
              f"{m['median_pair_err_deg']:>17.3f} "
              f"{m['auc@1']:>7.3f} {m['auc@3']:>7.3f} "
              f"{m['auc@5']:>7.3f} {m['auc@10']:>7.3f}")
    print(json.dumps({"scene": os.path.basename(args.out), "stages": rows}))


if __name__ == "__main__":
    main()
