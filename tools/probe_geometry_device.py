"""Kernel-level CPU-vs-TPU parity probe for the geometry stack.

Round-4 found that running geometry on the TPU collapses accuracy on
planar-degenerate scenes (scene_0005 coarse AUC@5 0.77 CPU vs 0.03 TPU)
and triaged by hopping ALL geometry to host CPU. Round 5's job is to fix
the kernels on-device (VERDICT r5 #1). This probe pinpoints WHICH kernel
diverges, on the real cached matches that produced the failure:

  * estimate_relative_pose (8-pt E RANSAC + cheirality): per-pair rotation
    error vs GT, CPU vs accel, same PRNG key.
  * estimate_homography + decompose_homography: same.
  * triangulate_dlt: reprojection error of triangulated points, CPU vs accel.
  * pnp _dlt_pose + full estimate_absolute_pose: pose error CPU vs accel.
  * ba lm steps: cost decrease parity.

Usage:
  python tools/probe_geometry_device.py --out .eval/r4_evalA \
      --dataset .data/synth5/eval --scene scene_0005 [--kernels twoview,tri]
"""

import argparse
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def _ensure_accel():
    import jax

    assert jax.default_backend() != "cpu", (
        "probe needs an accelerator backend to compare against"
    )


def load_scene(out_dir, scene_dir):
    """Cached-scene loading, delegated to the sweep tool's loader so the
    artifact contract lives in ONE place (review r5)."""
    from tools.sweep_mapper_robustness import load_scene as _ls

    kps, matches, _sizes, intr, gt = _ls(out_dir, scene_dir)
    return kps, matches, intr, gt


def rel_rot_err_deg(R_est, R_gt):
    cos = (np.trace(R_est.T @ R_gt) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))


def gt_relative(gt, a, b):
    qa, ta = gt[a]
    qb, tb = gt[b]
    from detectorfreesfm_tpu.core.geometry import np_quat_to_rotmat

    Ra, Rb = np_quat_to_rotmat(qa), np_quat_to_rotmat(qb)
    R = Rb @ Ra.T
    t = tb - R @ ta
    n = np.linalg.norm(t)
    return R, (t / n if n > 1e-12 else t)


def run_twoview(kps, matches, intr, gt, device):
    os.environ["DFSFM_GEOMETRY_DEVICE"] = device
    import jax
    import jax.numpy as jnp

    from detectorfreesfm_tpu.sfm.twoview import (
        estimate_relative_pose, normalize_points)
    from detectorfreesfm_tpu.core.geometry import np_quat_to_rotmat

    rows = []
    for (na, nb), m in sorted(matches.items()):
        if len(m) < 16:
            continue
        Ka = np.asarray(intr[na], np.float32)
        Kb = np.asarray(intr[nb], np.float32)
        uv0 = kps[na][m[:, 0]].astype(np.float32)
        uv1 = kps[nb][m[:, 1]].astype(np.float32)
        n_pad = 4096
        N = min(len(m), n_pad)
        x0 = np.zeros((n_pad, 2), np.float32)
        x1 = np.zeros((n_pad, 2), np.float32)
        mask = np.zeros((n_pad,), bool)
        x0[:N] = normalize_points(jnp.asarray(uv0[:N]), jnp.asarray(Ka))
        x1[:N] = normalize_points(jnp.asarray(uv1[:N]), jnp.asarray(Kb))
        mask[:N] = True
        thr = 4.0 / float(Ka[0, 0])
        key = jax.random.PRNGKey(
            abs(hash((na, nb))) % (2**31)
        )
        res = estimate_relative_pose(
            jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(mask), key,
            thr)
        R_est = np_quat_to_rotmat(np.asarray(res.qvec))
        R_gt, t_gt = gt_relative(
            gt, na.rsplit(".", 1)[0], nb.rsplit(".", 1)[0])
        err = rel_rot_err_deg(R_est, R_gt)
        t_est = np.asarray(res.tvec)
        terr = np.degrees(np.arccos(np.clip(
            min(abs(float(t_est @ t_gt)), 1.0), -1.0, 1.0)))
        rows.append((f"{na}|{nb}", err, terr, int(res.n_inliers)))
    return rows


def run_triangulation(kps, matches, intr, gt, device, rng):
    """Parity on realistic DLT problems: GT cameras + noisy projections of
    random points near the scene, including shallow-baseline (ill-cond)."""
    os.environ["DFSFM_GEOMETRY_DEVICE"] = device
    import jax.numpy as jnp

    from detectorfreesfm_tpu.core.geometry import np_quat_to_rotmat
    from detectorfreesfm_tpu.core.triangulation import (
        projection_matrices, reprojection_errors, triangulate_dlt)

    names = sorted(gt)
    V = len(names)
    qv = np.stack([gt[n][0] for n in names])
    tv = np.stack([gt[n][1] for n in names])
    Ks = np.stack(
        [np.asarray(intr[n + ".png"], np.float32) for n in names])
    Rs = np.stack([np_quat_to_rotmat(q) for q in qv])
    centers = -np.einsum("vij,vi->vj", Rs, tv)
    target = centers.mean(0) + np.array([0, 0, 4.0])
    P = np.asarray(
        projection_matrices(jnp.asarray(qv, jnp.float32),
                            jnp.asarray(tv, jnp.float32),
                            jnp.asarray(Ks)))
    B = 4096
    X_gt = target[None] + rng.normal(size=(B, 3)) * 2.0
    Xh = np.concatenate([X_gt, np.ones((B, 1))], -1)
    proj = np.einsum("vij,bj->bvi", P, Xh)
    z = proj[..., 2:]
    uv = proj[..., :2] / np.where(np.abs(z) < 1e-9, 1e-9, z)
    uv += rng.normal(size=uv.shape) * 0.5
    mask = (z[..., 0] > 0.1) & (np.abs(uv) < 2048).all(-1)
    # Also a shallow two-view subset (ill-conditioned): views 0 and 1 only
    mask2 = mask.copy()
    mask2[:, 2:] = False
    out = {}
    for tag, mk in (("allview", mask), ("twoview", mask2)):
        X, ok = triangulate_dlt(
            jnp.asarray(np.broadcast_to(P, (B, V, 3, 4)), jnp.float32),
            jnp.asarray(uv, jnp.float32), jnp.asarray(mk))
        X = np.asarray(X)
        ok = np.asarray(ok) & (mk.sum(-1) >= 2)
        err3d = np.linalg.norm(X - X_gt, axis=-1)
        err_px, _ = reprojection_errors(
            jnp.asarray(X, jnp.float32),
            jnp.asarray(np.broadcast_to(P, (B, V, 3, 4)), jnp.float32),
            jnp.asarray(uv, jnp.float32))
        err_px = np.where(mk, np.asarray(err_px), np.nan)
        out[tag] = dict(
            ok=float(ok.mean()),
            med3d=float(np.median(err3d[ok])),
            p99_3d=float(np.quantile(err3d[ok], 0.99)),
            med_px=float(np.nanmedian(err_px[ok])),
        )
    return out


def run_pnp(kps, matches, intr, gt, device, rng):
    os.environ["DFSFM_GEOMETRY_DEVICE"] = device
    import jax
    import jax.numpy as jnp

    from detectorfreesfm_tpu.core.geometry import np_quat_to_rotmat
    from detectorfreesfm_tpu.sfm.pnp import estimate_absolute_pose

    names = sorted(gt)
    rows = []
    for n in names:
        q, t = gt[n]
        R = np_quat_to_rotmat(q)
        K = np.asarray(intr[n + ".png"], np.float32)
        B = 512
        # points in front of this camera, near-coplanar half the time
        Xc = rng.normal(size=(B, 3)) * np.array([2.0, 2.0, 0.02]) + \
            np.array([0, 0, 6.0])
        X = (Xc - t[None]) @ R  # world = R^T (Xc - t)
        x = Xc[:, :2] / Xc[:, 2:]
        x += rng.normal(size=x.shape) * (0.5 / K[0, 0])
        mask = np.ones((B,), bool)
        res = estimate_absolute_pose(
            jnp.asarray(X, jnp.float32), jnp.asarray(x, jnp.float32),
            jnp.asarray(mask), jax.random.PRNGKey(0),
            8.0 / float(K[0, 0]))
        R_est = np_quat_to_rotmat(np.asarray(res.qvec))
        err = rel_rot_err_deg(R_est, R)
        terr = float(np.linalg.norm(np.asarray(res.tvec) - t))
        rows.append((n, err, terr, int(res.n_inliers)))
    return rows


def summarize_pairs(tag, rows_cpu, rows_acc):
    print(f"--- {tag}: per-item rotation/translation error (deg), "
          f"CPU vs accel ---")
    worst = []
    for (k, ec, tc, nc), (_, ea, ta, na) in zip(rows_cpu, rows_acc):
        worst.append((abs(ea - ec), k, ec, ea, tc, ta, nc, na))
    worst.sort(reverse=True)
    for d, k, ec, ea, tc, ta, nc, na in worst[:8]:
        print(f"  {k}: rot {ec:7.3f} vs {ea:7.3f}  "
              f"t {tc:7.3f} vs {ta:7.3f}  inl {nc} vs {na}")
    ecs = np.array([r[1] for r in rows_cpu])
    eas = np.array([r[1] for r in rows_acc])
    print(f"  median rot err: cpu {np.median(ecs):.3f}  "
          f"accel {np.median(eas):.3f}   "
          f"p90: cpu {np.quantile(ecs, .9):.3f} accel {np.quantile(eas, .9):.3f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=".eval/r4_evalA")
    ap.add_argument("--dataset", default=".data/synth5/eval")
    ap.add_argument("--scene", default="scene_0005")
    ap.add_argument("--kernels", default="twoview,tri,pnp")
    args = ap.parse_args()

    _ensure_accel()
    kps, matches, intr, gt = load_scene(
        args.out if args.scene in ("", None) else (
            os.path.join(args.out, args.scene)
            if os.path.isdir(os.path.join(args.out, args.scene, ""))
            and os.path.exists(
                os.path.join(args.out, args.scene, "matches.h5"))
            else args.out),
        os.path.join(args.dataset, args.scene))
    kern = set(args.kernels.split(","))
    rng = np.random.default_rng(0)

    if "twoview" in kern:
        rows_cpu = run_twoview(kps, matches, intr, gt, "cpu")
        rows_acc = run_twoview(kps, matches, intr, gt, "accel")
        summarize_pairs("estimate_relative_pose", rows_cpu, rows_acc)

    if "tri" in kern:
        rng = np.random.default_rng(0)
        t_cpu = run_triangulation(kps, matches, intr, gt, "cpu",
                                  np.random.default_rng(1))
        t_acc = run_triangulation(kps, matches, intr, gt, "accel",
                                  np.random.default_rng(1))
        print("--- triangulate_dlt ---")
        for tag in t_cpu:
            print(f"  {tag}: cpu {t_cpu[tag]}")
            print(f"  {tag}: acc {t_acc[tag]}")

    if "pnp" in kern:
        p_cpu = run_pnp(kps, matches, intr, gt, "cpu",
                        np.random.default_rng(2))
        p_acc = run_pnp(kps, matches, intr, gt, "accel",
                        np.random.default_rng(2))
        summarize_pairs("estimate_absolute_pose", p_cpu, p_acc)


if __name__ == "__main__":
    main()
