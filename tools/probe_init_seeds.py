"""Per-seed growth probe for coarse-collapse scenes (round 4).

The init retry keeps the candidate that REGISTERS the most images
(`mapper.py::run`), but on dominant-plane scenes a seed can register 7/8
images into a model that is 20deg wrong — count is a bad proxy for
quality there. This probe grows a model from EACH ranked init candidate
on cached eval matches and reports, per seed: registered count, mean
reprojection error, mean track length, and (diagnostically) pose AUC vs
GT — to establish whether a better seed exists and which *internal*
criterion (reproj error, track support) would have selected it.

Usage: python tools/probe_init_seeds.py --out .eval/r4_evalA2/scene_1001 \
           --scene .data/synth5/eval/scene_1001
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--scene", required=True)
    ap.add_argument("--max-seeds", type=int, default=5)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from tools.sweep_mapper_robustness import load_scene
    from detectorfreesfm_tpu.eval.pose_auc import evaluate_poses
    from detectorfreesfm_tpu.sfm.mapper import IncrementalMapper, MapperConfig
    from detectorfreesfm_tpu.sfm.tracks import build_tracks

    kps, matches, sizes, intr, gt = load_scene(args.out, args.scene)
    cfg = MapperConfig(max_init_trials=args.max_seeds,
                       init_retry_attempts=args.max_seeds,
                       # never stop early — probe every seed
                       init_retry_target=2.0)
    m = IncrementalMapper(cfg)

    rec = m._setup(kps, sizes, intr)
    verified = m.verify_pairs(rec, matches, focal_search=False)
    n_kpts = {m.name_to_id[n]: len(kps[n]) for n in m.names}
    vm = {pair: v["matches"] for pair, v in verified.items()}
    tracks = build_tracks(n_kpts, vm)
    m.tracks = tracks
    m.track_pid = np.full(len(tracks), -1, np.int64)
    m.kpt_track = {}
    for tid, t in enumerate(tracks):
        for (img_id, kpt) in t.observations:
            m.kpt_track.setdefault(img_id, {})[kpt] = tid

    ranked = sorted(verified.items(), key=lambda kv: -kv[1]["n_inliers"])
    cam_snapshot = {cid: c.params.copy() for cid, c in rec.cameras.items()}

    def reset():
        for im in rec.images.values():
            im.qvec = None
            im.tvec = None
            im.point3D_ids[:] = -1
        rec.points = {}
        m.track_pid[:] = -1
        for cid, params in cam_snapshot.items():
            rec.cameras[cid].params = params.copy()

    for (ia, ib), v in ranked[: args.max_seeds]:
        qv, tv, _ = m._twoview_pose(rec, ia, ib, v["matches"],
                                    cfg.init_max_error,
                                    h_ratio=v.get("h_ratio", 0.0))
        rec.set_pose(ia, np.array([1.0, 0, 0, 0]), np.zeros(3))
        rec.set_pose(ib, qv, tv)
        tids = sorted(set(m.kpt_track.get(ia, {}).values())
                      & set(m.kpt_track.get(ib, {}).values()))
        tri = m._triangulate_tracks(rec, tracks, tids,
                                    cfg.init_min_tri_angle_deg,
                                    cfg.init_max_error)
        rec.images[ia].qvec = rec.images[ia].tvec = None
        rec.images[ib].qvec = rec.images[ib].tvec = None
        if len(tri) < 8:
            print(json.dumps({"seed": [int(ia), int(ib)],
                              "n_tri": len(tri), "skipped": True}),
                  flush=True)
            continue
        m._grow_from_init(rec, (ia, ib), tri, qv, tv, verbose=False)
        est = {im.name.rsplit(".", 1)[0]: (im.qvec, im.tvec)
               for im in rec.images.values() if im.registered}
        auc = evaluate_poses(est, gt) if len(est) >= 2 else {}
        errs, tlens = [], []
        for p in rec.points.values():
            errs.append(p["error"])
            tlens.append(len(p["track"]))
        rec_stats = {
            "seed": [int(ia), int(ib)],
            "n_inliers": int(v["n_inliers"]),
            "h_ratio": round(float(v.get("h_ratio", 0.0)), 3),
            "n_tri": len(tri),
            "registered": len(est),
            "n_points": len(rec.points),
            "mean_reproj": round(float(np.mean(errs)), 3) if errs else None,
            "mean_track_len": round(float(np.mean(tlens)), 2)
            if tlens else None,
            "auc5": round(float(auc.get("auc@5", 0.0)), 4),
            "auc10": round(float(auc.get("auc@10", 0.0)), 4),
        }
        print(json.dumps(rec_stats), flush=True)
        reset()


if __name__ == "__main__":
    main()
