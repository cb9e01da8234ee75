"""Micro-probe: which sub-step of the planar init path diverges on TPU?

The round-4/5 bisection (tools/bisect_geometry_device.py) shows that moving
ONLY estimate_homography onto the accelerator collapses scene_0005 from
AUC@5 0.77 to 0.02. This isolates the stages on the actual init-pair data:

  A. estimate_homography (RANSAC: eigh(AtA) hypotheses + weighted refit)
     -> compare H (transfer error + inlier count) CPU vs accel
  B. decompose_homography on the SAME (CPU-computed) H
     -> compare recovered R vs GT on both devices
  C. _four_point_h weighted refit alone on the CPU-selected inlier weights

Usage: python tools/probe_homography_device.py
"""

import os
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tools.probe_geometry_device import (
        gt_relative, load_scene, rel_rot_err_deg)
    from detectorfreesfm_tpu.core.geometry import np_quat_to_rotmat

    kps, matches, intr, gt = load_scene(
        ".eval/r4_evalA/scene_0005", ".data/synth5/eval/scene_0005")

    from detectorfreesfm_tpu.sfm import twoview as tv

    cpu = jax.local_devices(backend="cpu")[0]

    # pick the pair with the most matches (mapper's likely init pair)
    pairs = sorted(matches.items(), key=lambda kv: -len(kv[1]))
    for (na, nb), m in pairs[:4]:
        Ka = np.asarray(intr[na], np.float32)
        Kb = np.asarray(intr[nb], np.float32)
        uv0 = kps[na][m[:, 0]].astype(np.float32)
        uv1 = kps[nb][m[:, 1]].astype(np.float32)
        n_pad = 4096
        N = min(len(m), n_pad)
        x0 = np.zeros((n_pad, 2), np.float32)
        x1 = np.zeros((n_pad, 2), np.float32)
        mask = np.zeros((n_pad,), bool)
        x0[:N] = (uv0[:N] - Ka[:2, 2]) / np.array([Ka[0, 0], Ka[1, 1]])
        x1[:N] = (uv1[:N] - Kb[:2, 2]) / np.array([Kb[0, 0], Kb[1, 1]])
        mask[:N] = True
        f_mean = float(Ka[0, 0])
        thr = 4.0 / f_mean
        key = jax.random.PRNGKey(7)
        R_gt, t_gt = gt_relative(
            gt, na.rsplit(".", 1)[0], nb.rsplit(".", 1)[0])

        res = {}
        for dev in ("cpu", "accel"):
            os.environ["DFSFM_GEOMETRY_DEVICE"] = dev
            r = tv.estimate_homography(
                jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(mask), key,
                thr)
            res[dev] = r
            # decompose on the device the H lives on
            R, t, _ = tv.decompose_homography(
                r.H, jax.device_put(jnp.asarray(x0), None if dev == "accel" else cpu),
                jax.device_put(jnp.asarray(x1), None if dev == "accel" else cpu),
                r.inliers)
            err = rel_rot_err_deg(np.asarray(R, np.float64), R_gt)
            print(f"{na}|{nb} [{dev:5s}] A: inl {int(r.n_inliers)}  "
                  f"decomp-rot-err {err:6.2f} deg")

        # B: decompose the CPU H on the accelerator
        os.environ["DFSFM_GEOMETRY_DEVICE"] = "accel"
        Hc = np.asarray(res["cpu"].H)
        inlc = np.asarray(res["cpu"].inliers)
        R, t, _ = tv.decompose_homography(
            jnp.asarray(Hc), jnp.asarray(x0), jnp.asarray(x1),
            jnp.asarray(inlc))
        err_acc = rel_rot_err_deg(np.asarray(R, np.float64), R_gt)
        Rc, tc, _ = tv.decompose_homography(
            jax.device_put(jnp.asarray(Hc), cpu),
            jax.device_put(jnp.asarray(x0), cpu),
            jax.device_put(jnp.asarray(x1), cpu),
            jax.device_put(jnp.asarray(inlc), cpu))
        err_cpu = rel_rot_err_deg(np.asarray(Rc, np.float64), R_gt)
        print(f"   B: decompose(CPU-H): cpu {err_cpu:6.2f} deg, "
              f"accel {err_acc:6.2f} deg")

        # C: weighted refit on CPU-chosen inliers, both devices
        w = inlc.astype(np.float32)
        for dev in ("cpu", "accel"):
            dd = cpu if dev == "cpu" else jax.local_devices()[0]
            H = tv._four_point_h(
                jax.device_put(jnp.asarray(x0), dd),
                jax.device_put(jnp.asarray(x1), dd),
                jax.device_put(jnp.asarray(w), dd))
            terr = np.asarray(tv.homography_error(
                H, jnp.asarray(x0), jnp.asarray(x1)))
            med = float(np.median(terr[inlc])) ** 0.5 * f_mean
            n_in = int(((terr < thr * thr) & mask).sum())
            print(f"   C: refit[{dev:5s}]: med transfer {med:8.4f} px,"
                  f" inl {n_in}")
        print()


if __name__ == "__main__":
    main()
