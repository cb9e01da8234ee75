"""Matcher-quality diagnostic: median epipolar error of cached matches
against GT poses, per scene (the RESULTS_r02.md analysis, now a tool).

The coarse 1/8-grid quantization floor is ~2.7 px at 512-px images
(= grid/2 * sqrt(2) in expectation); scenes far above the floor are
matcher failures that no downstream geometry can recover from
(VERDICT r3 task #1 'Done' gate: median <= 5 px on all eval scenes).

Usage: python tools/diag_epipolar.py --out OUT_DIR --dataset DATASET_DIR
  OUT_DIR holds per-scene subdirs with keypoints.h5/matches.h5 (the
  eval-dataset artifacts); DATASET_DIR holds scenes with poses/ intrins/.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def scene_epipolar_errors(scene_dir: str, out_dir: str):
    from detectorfreesfm_tpu.data.h5io import load_h5
    from detectorfreesfm_tpu.core.geometry import np_quat_to_rotmat
    from detectorfreesfm_tpu.pipeline import read_intrin_txt, read_pose_txt

    kp = load_h5(os.path.join(out_dir, "keypoints.h5"))
    raw = load_h5(os.path.join(out_dir, "matches.h5"))
    poses, intrins = {}, {}
    for f in sorted(os.listdir(os.path.join(scene_dir, "poses"))):
        stem = os.path.splitext(f)[0]
        poses[stem] = read_pose_txt(os.path.join(scene_dir, "poses", f))
        intrins[stem] = read_intrin_txt(
            os.path.join(scene_dir, "intrins", f))

    def stem(n):
        return os.path.splitext(n)[0]

    errs = []
    for key, m in raw.items():
        a, b = key.split("|")
        sa, sb = stem(a), stem(b)
        if sa not in poses or sb not in poses:
            continue
        qa, ta = poses[sa]
        qb, tb = poses[sb]
        Ra = np_quat_to_rotmat(np.asarray(qa)[None])[0]
        Rb = np_quat_to_rotmat(np.asarray(qb)[None])[0]
        Ka, Kb = intrins[sa], intrins[sb]
        # relative pose b<-a
        R = Rb @ Ra.T
        t = tb - R @ ta
        tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]],
                       [-t[1], t[0], 0]])
        E = tx @ R
        F = np.linalg.inv(Kb).T @ E @ np.linalg.inv(Ka)
        m = np.asarray(m, np.int64)
        ua = kp[a][m[:, 0]]
        ub = kp[b][m[:, 1]]
        pa = np.concatenate([ua, np.ones((len(ua), 1))], 1)
        pb = np.concatenate([ub, np.ones((len(ub), 1))], 1)
        l = pa @ F.T                      # epipolar lines in image b
        d = np.abs(np.sum(pb * l, 1)) / np.maximum(
            np.hypot(l[:, 0], l[:, 1]), 1e-12)
        errs.append(d)
    if not errs:
        return None
    return np.concatenate(errs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="eval-dataset output dir")
    ap.add_argument("--dataset", required=True, help="dataset dir (GT)")
    args = ap.parse_args()

    meds = {}
    for s in sorted(os.listdir(args.out)):
        od = os.path.join(args.out, s)
        sd = os.path.join(args.dataset, s)
        if not (os.path.isdir(od) and os.path.isdir(sd)
                and os.path.exists(os.path.join(od, "matches.h5"))):
            continue
        e = scene_epipolar_errors(sd, od)
        if e is None:
            continue
        meds[s] = float(np.median(e))
        print(json.dumps({
            "scene": s, "n_matches": int(len(e)),
            "median_epi_px": round(float(np.median(e)), 2),
            "p90_epi_px": round(float(np.percentile(e, 90)), 2),
            "inlier_frac_4px": round(float((e < 4).mean()), 3),
        }))
    if meds:
        print(json.dumps({
            "scenes": len(meds),
            "worst_median_epi_px": round(max(meds.values()), 2),
            "all_below_5px": bool(max(meds.values()) <= 5.0),
        }))


if __name__ == "__main__":
    main()
