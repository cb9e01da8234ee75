"""BA kernel bench: LM iterations/s and obs/s, dense Schur vs matrix-free
PCG, at several camera counts — the BASELINE.json "BA iterations/s" metric
(the reference's equivalent hot loop is Ceres inside the COLMAP fork,
src/sfm_runner/sfm_model_geometry_refiner.py:19-21).

Builds a synthetic sequential-covisibility scene (the bench_mapper_scale
generator), perturbs poses/points, then times lm_step/lm_step_pcg + ba_cost
round-trips through the bundle_adjust host driver with a fixed iteration
budget. Reports per-config: LM iters/s, obs/s (= obs * LM iters / s), PCG
CG-iteration counts, and the dense-vs-PCG final cost agreement.

Run:  python tools/bench_ba.py [--cams 50,120,300,1000] [--pts-per-cam 40]
Multi-device: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
              JAX_PLATFORMS=cpu python tools/bench_ba.py --mesh
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

import numpy as np


def build_ba_problem(n_cams, n_pts, window=10, seed=3, noise=0.3):
    from bench_mapper_scale import build_scene

    pts, K, poses, uvs, vis = build_scene(n_cams, n_pts, window, seed=seed)
    obs_uv, obs_cam, obs_pt = [], [], []
    for c in range(n_cams):
        vis_pts = np.flatnonzero(vis[c])
        obs_uv.append(uvs[c][vis_pts] + np.random.default_rng(c).normal(
            0, noise, (len(vis_pts), 2)))
        obs_cam.append(np.full(len(vis_pts), c, np.int32))
        obs_pt.append(vis_pts.astype(np.int32))
    obs_uv = np.concatenate(obs_uv)
    obs_cam = np.concatenate(obs_cam)
    obs_pt = np.concatenate(obs_pt)
    # Keep only points with >= 2 observations
    counts = np.bincount(obs_pt, minlength=n_pts)
    keep = counts >= 2
    remap = np.cumsum(keep) - 1
    sel = keep[obs_pt]
    obs_uv, obs_cam, obs_pt = obs_uv[sel], obs_cam[sel], remap[obs_pt[sel]]
    pts = pts[keep]

    from detectorfreesfm_tpu.core.geometry import np_rotmat_to_quat

    R = np.stack([p[0] for p in poses])
    t = np.stack([p[1] for p in poses])
    q = np_rotmat_to_quat(R)
    rng = np.random.default_rng(seed + 1)
    # Perturb so LM has real work
    q = q + rng.normal(0, 0.01, q.shape)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    t = t + rng.normal(0, 0.05, t.shape)
    pts_in = pts + rng.normal(0, 0.05, pts.shape)
    intr = np.tile(np.array([600.0, 600.0, 320.0, 240.0]), (n_cams, 1))
    return q, t, intr, pts_in, obs_uv, obs_cam, obs_pt


def bench_mode(q, t, intr, pts, obs_uv, obs_cam, obs_pt, mode, iters, mesh):
    from detectorfreesfm_tpu.sfm.ba import bundle_adjust

    fixed = np.zeros(len(q), bool)
    fixed[:2] = True
    t0 = time.perf_counter()
    _q2, _t2, _i2, _p2, cost = bundle_adjust(
        q.copy(), t.copy(), intr.copy(), pts.copy(),
        obs_uv, obs_cam, obs_pt, fixed_cams=fixed,
        max_iters=iters, schur_mode=mode, mesh=mesh,
    )
    dt = time.perf_counter() - t0
    return dt, cost


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", default="50,120,300,1000")
    ap.add_argument("--pts-per-cam", type=int, default=40)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--mesh", action="store_true",
                    help="shard obs over the visible device mesh")
    args = ap.parse_args()

    import jax

    mesh = None
    if args.mesh:
        from detectorfreesfm_tpu.parallel.mesh import get_mesh

        mesh = get_mesh()
    n_dev = jax.device_count()

    for n_cams in [int(x) for x in args.cams.split(",")]:
        n_pts = n_cams * args.pts_per_cam
        q, t, intr, pts, obs_uv, obs_cam, obs_pt = build_ba_problem(
            n_cams, n_pts)
        O = len(obs_uv)
        results = {}
        for mode in (("dense", "pcg") if n_cams <= 300 else ("pcg",)):
            # Warm (compile) with 1 iter, then timed run
            bench_mode(q, t, intr, pts, obs_uv, obs_cam, obs_pt, mode, 1,
                       mesh)
            dt, cost = bench_mode(
                q, t, intr, pts, obs_uv, obs_cam, obs_pt, mode, args.iters,
                mesh)
            results[mode] = (dt, cost)
            print(json.dumps({
                "metric": "ba_lm_iters_per_s", "cams": n_cams, "obs": O,
                "mode": mode, "devices": n_dev,
                "value": round(args.iters / dt, 3),
                "obs_per_s": round(O * args.iters / dt, 1),
                "final_cost_per_obs": round(float(cost), 6),
            }), flush=True)
        if "dense" in results and "pcg" in results:
            cd, cp = results["dense"][1], results["pcg"][1]
            print(json.dumps({
                "metric": "ba_pcg_vs_dense_cost_ratio", "cams": n_cams,
                "value": round(cp / max(cd, 1e-12), 4),
            }), flush=True)


if __name__ == "__main__":
    main()
