"""Quantization-floor probe (VERDICT r3 weak #4 / missing #1 attribution).

How much of the remaining pose error is caused by the coarse matcher's
1/8-grid keypoint quantization — independent of learned-matcher noise?
This feeds PERFECT depth-warped GT correspondences through the SfM stack,
quantized to an N-px grid, on synth5-class scenes at the eval resolution.

  grid=8  — the coarse_only protocol (OnGrid keypoints at 1/8 stride)
  grid=4  — the coarse_fine protocol's round_matches_ratio=4 rounding
            (reference hydra_configs/texturepoor_sfm/dfsfm.yaml:28-49)
  grid=1  — near-continuous (sub-pixel fine matching, no rounding)

Use grids >= 1: tracks form by keypoint-coordinate identity (as in the
real pipeline's grid merge), so fully-unquantized floats (grid=0) cannot
connect observations across pairs and the probe degenerates to 2-view
tracks with garbage incremental scale chaining.

Measured (512 px, synth5-class seed 10000, 2048 matches/pair cap):
  grid=8: AUC@1/5 = 0.57 / 0.91     grid=8 + 10% outliers: 0.55 / 0.91
  grid=4: AUC@1/5 = 0.96 / 0.99     grid=4 + 10% outliers: 0.95 / 0.99
-> the 8px grid caps AUC@1; the coarse_fine 4px protocol removes that cap,
   and uniform-random outliers are rejected fine at 10%. The pipeline's
   remaining gap to this floor comes from the matcher's STRUCTURED errors.

Usage: python tools/probe_quantization.py [--seeds 10000,10001] [--size 832]
Prints per-seed, per-grid AUC rows as JSON lines.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def depth_warp_matches(depths, Ks, Rs, ts, i, j, pts, thr=0.05):
    """GT correspondences i->j from depth maps (numpy, nearest-depth).

    `pts` are the query coordinates in image i (native depth-map scale) —
    the caller samples them exactly at the matcher's grid cell centers, so
    the A side carries NO quantization error (the matcher's OnGrid keypoint
    IS the cell center; only the matched B coordinate is grid-quantized)."""
    S = depths.shape[1]
    d = depths[i][pts[:, 1].astype(int), pts[:, 0].astype(int)]
    ok = d > 1e-6
    pts, d = pts[ok], d[ok]
    Ki, Kj = Ks[i], Ks[j]
    X_c = np.concatenate([pts, np.ones((len(pts), 1))], 1) @ np.linalg.inv(Ki).T * d[:, None]
    X_w = (X_c - ts[i]) @ Rs[i]          # R^T (Xc - t)
    Xj = X_w @ Rs[j].T + ts[j]
    vis = Xj[:, 2] > 1e-6
    uvj = (Xj[:, :2] / Xj[:, 2:]) * Kj[0, 0] + Kj[:2, 2]
    inb = vis & (uvj >= 0).all(1) & (uvj < S - 1).all(1)
    pts, uvj, Xj = pts[inb], uvj[inb], Xj[inb]
    # occlusion check vs j's depth map
    dj = depths[j][np.clip(uvj[:, 1].astype(int), 0, S - 1),
                   np.clip(uvj[:, 0].astype(int), 0, S - 1)]
    keep = np.abs(dj - Xj[:, 2]) < thr * np.maximum(dj, 1e-6)
    return pts[keep], uvj[keep]


def quantize(uv, grid):
    if grid <= 0:
        return uv
    return (np.floor(uv / grid) * grid + grid / 2).astype(np.float64)


def run_probe(seed, size, grid, n_views=8, outlier_frac=0.0,
              max_per_pair=None):
    import jax

    from detectorfreesfm_tpu.data.synthetic import (
        SyntheticConfig, generate_scene,
    )
    from detectorfreesfm_tpu.eval.pose_auc import evaluate_poses
    from detectorfreesfm_tpu.sfm.mapper import IncrementalMapper, MapperConfig
    from detectorfreesfm_tpu.core.geometry import np_quat_to_rotmat

    cfg = SyntheticConfig(size=512, n_views=n_views)
    _imgs, depths, Ks, qv, tv = generate_scene(seed, cfg)
    Rs = np_quat_to_rotmat(np.asarray(qv, np.float64))
    sc = size / 512.0
    Ks = Ks.copy()
    Ks[:, :2] *= sc  # eval resolution

    names = [f"view_{v:03d}.png" for v in range(n_views)]
    keypoints = {n: [] for n in names}
    kp_index = [dict() for _ in range(n_views)]  # quantized coord -> kpt id
    matches = {}

    def kpt_id(v, uv):
        key = (round(uv[0], 3), round(uv[1], 3))
        d = kp_index[v]
        if key not in d:
            d[key] = len(keypoints[names[v]])
            keypoints[names[v]].append(uv)
        return d[key]

    # Query points: exactly the matcher's 8px-grid cell centers in the
    # network (eval-size) frame, expressed at depth-map scale.
    cell = 8.0
    n_cells = int(size // cell)
    ys, xs = np.mgrid[0:n_cells, 0:n_cells]
    query_net = (np.stack([xs.ravel(), ys.ravel()], -1) * cell
                 + cell / 2).astype(np.float64)
    query_512 = query_net / sc

    Ks_512 = Ks.copy()
    Ks_512[:, :2] /= sc  # native depth-map scale; K[2,2] stays 1
    for i in range(n_views):
        for j in range(i + 1, n_views):
            p_i, p_j = depth_warp_matches(
                depths, Ks_512, Rs, tv, i, j, query_512)
            if len(p_i) < 16:
                continue
            q_i = p_i * sc                     # exact cell centers: no error
            q_j = quantize(p_j * sc, grid)     # only the matched side snaps
            rng_o = np.random.default_rng(seed * 1000 + i * 37 + j)
            if max_per_pair and len(q_i) > max_per_pair:
                sel = rng_o.permutation(len(q_i))[:max_per_pair]
                q_i, q_j = q_i[sel], q_j[sel]
            if outlier_frac > 0:
                # Contaminate like a real matcher's mutual-NN failures:
                # a fraction of B coords land on a random (wrong) cell.
                n_bad = int(len(q_j) * outlier_frac)
                bad = rng_o.permutation(len(q_j))[:n_bad]
                rand_cells = rng_o.integers(
                    0, max(1, int(size // max(grid, 8))),
                    (n_bad, 2)).astype(np.float64)
                q_j = q_j.copy()
                q_j[bad] = rand_cells * max(grid, 8) + max(grid, 8) / 2
            # One-to-one per pair, like the matcher's mutual-NN: B-side
            # quantization can collide — keep one per B-cell, else
            # union-find fuses unrelated tracks through shared keypoints.
            seen_b, rows = set(), []
            for a, b in zip(map(tuple, q_i), map(tuple, q_j)):
                if b in seen_b:
                    continue
                seen_b.add(b)
                rows.append([kpt_id(i, a), kpt_id(j, b)])
            m = np.array(rows, np.int32)
            matches[(names[i], names[j])] = m

    keypoints = {n: np.asarray(v, np.float64) for n, v in keypoints.items()}
    sizes = {n: (size, size) for n in names}
    intrin = {n: Ks[v] for v, n in enumerate(names)}
    rec = IncrementalMapper(MapperConfig(refine_focal=False)).run(
        keypoints, matches, sizes, intrin
    )
    if rec is None:
        return {"registered": 0}
    est = {im.name.rsplit(".", 1)[0]: (im.qvec, im.tvec)
           for im in rec.images.values() if im.registered}
    gt = {f"view_{v:03d}": (qv[v], tv[v]) for v in range(n_views)}
    out = evaluate_poses(est, gt)
    out["registered"] = int(sum(im.registered for im in rec.images.values()))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="10000,10001,10002")
    ap.add_argument("--size", type=int, default=832)
    ap.add_argument("--grids", default="8,4,2,1")
    ap.add_argument("--outlier-fracs", default="0", dest="outlier_fracs",
                    help="comma list; wrong-cell contamination rates")
    ap.add_argument("--max-per-pair", type=int, default=2048,
                    dest="max_per_pair",
                    help="cap matches per pair (engine top-K is 2048)")
    args = ap.parse_args()
    import jax

    jax.config.update("jax_platforms", "cpu")
    for seed in (int(s) for s in args.seeds.split(",")):
        for grid in (int(g) for g in args.grids.split(",")):
            for of in (float(x) for x in args.outlier_fracs.split(",")):
                m = run_probe(seed, args.size, grid, outlier_frac=of,
                              max_per_pair=args.max_per_pair)
                row = {"seed": seed, "grid_px": grid, "outlier_frac": of,
                       **{k: round(float(v), 4) for k, v in m.items()}}
                print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
