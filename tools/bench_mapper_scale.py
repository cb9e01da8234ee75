"""Incremental-mapper scalability bench on a synthetic large scene.

BASELINE.md's north star includes Bridge-scale (hundreds of cameras)
reconstruction; the device work (RANSAC, BA) is batched/jitted, so the risk
at scale is host orchestration loops in sfm/mapper.py. This bench builds an
arc of N cameras with sequential-window covisibility (the structure of a
phototourism / video capture), runs the full mapper, and reports wall time
per phase plus model quality — runnable on CPU (geometry stack only, no
matcher weights needed).

Run: python tools/bench_mapper_scale.py [--cams 60] [--pts 4000] [--window 8]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def _look_at_R(eye, target):
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.array([0.0, 1.0, 0.0]))
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    return np.stack([right, up, fwd])


def build_scene(n_cams, n_pts, window, seed=3, noise=0.4):
    """Cameras on a long arc; each 3D point is visible from a contiguous
    camera range ~window wide (sequential covisibility, like video or a
    walk-around capture)."""
    rng = np.random.default_rng(seed)
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]])
    # Points distributed along the arc so each camera sees a local subset
    centers = rng.uniform(0, n_cams - 1, n_pts)
    pts = np.stack([
        4.0 * np.sin((centers - (n_cams - 1) / 2) * 0.08) * 0.9
        + rng.normal(0, 0.8, n_pts),
        rng.uniform(-1.2, 1.2, n_pts),
        6.0 - 3.6 * np.cos((centers - (n_cams - 1) / 2) * 0.08)
        + rng.normal(0, 0.8, n_pts),
    ], axis=1)
    poses, uvs, vis = [], [], []
    for i in range(n_cams):
        ang = (i - (n_cams - 1) / 2) * 0.08
        eye = np.array([5.5 * np.sin(ang), 0.3 * np.sin(i * 0.7),
                        6.0 - 5.5 * np.cos(ang)])
        R = _look_at_R(eye, np.array([0.0, 0.0, 6.0]))
        t = -R @ eye
        Xc = pts @ R.T + t
        uv = (Xc / np.maximum(Xc[:, 2:], 1e-6)) @ K.T
        inb = ((uv[:, 0] > 0) & (uv[:, 0] < 640)
               & (uv[:, 1] > 0) & (uv[:, 1] < 480) & (Xc[:, 2] > 0.2))
        near = np.abs(centers - i) <= window / 2 + rng.uniform(0, 2, n_pts)
        poses.append((R, t))
        uvs.append(uv[:, :2] + rng.normal(0, noise, (n_pts, 2)))
        vis.append(inb & near)
    vis = np.stack(vis)
    return pts, K, poses, uvs, vis


def scene_to_matches(n_cams, uvs, vis, rng_seed=11):
    rng = np.random.default_rng(rng_seed)
    keypoints, row_of_pt = {}, {}
    for i in range(n_cams):
        ids = np.flatnonzero(vis[i])
        perm = rng.permutation(len(ids))
        keypoints[f"im{i:04d}"] = uvs[i][ids][perm].astype(np.float64)
        row_of_pt[i] = {int(ids[perm[k]]): k for k in range(len(ids))}
    matches = {}
    for i in range(n_cams):
        for j in range(i + 1, n_cams):
            shared = np.flatnonzero(vis[i] & vis[j])
            if len(shared) < 12:
                continue
            m = np.array([[row_of_pt[i][p], row_of_pt[j][p]] for p in shared],
                         np.int32)
            matches[(f"im{i:04d}", f"im{j:04d}")] = m
    return keypoints, matches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=60)
    ap.add_argument("--pts", type=int, default=4000)
    ap.add_argument("--window", type=int, default=8)
    args = ap.parse_args()

    from detectorfreesfm_tpu.sfm.mapper import IncrementalMapper, MapperConfig

    pts, K, poses, uvs, vis = build_scene(args.cams, args.pts, args.window)
    kps, matches = scene_to_matches(args.cams, uvs, vis)
    sizes = {n: (640, 480) for n in kps}
    intrins = {n: K for n in kps}
    n_obs = int(vis.sum())
    print(json.dumps({"cams": args.cams, "pts": args.pts,
                      "pairs": len(matches), "obs": n_obs}), flush=True)

    cfg = MapperConfig()
    t0 = time.perf_counter()
    rec = IncrementalMapper(cfg).run(kps, matches, sizes, intrins)
    dt = time.perf_counter() - t0
    assert rec is not None
    errs = np.concatenate(list(rec.reprojection_errors().values()))
    print(json.dumps({
        "metric": "mapper_wall_s",
        "value": round(dt, 2), "unit": "s",
        "registered": len(rec.registered_images),
        "points": len(rec.points),
        "mean_reproj_px": round(float(np.mean(errs)), 3),
        "obs_per_s": round(n_obs / dt, 1),
    }))


if __name__ == "__main__":
    main()
