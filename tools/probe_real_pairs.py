"""Real-data matcher probe (VERDICT r5 #9): GT-posed REAL image pairs.

The synthetic eval corpus and the 8-image demo scene are the only data the
pipeline has been measured on; this probes the matcher on real ScanNet
frames with published GT relative poses — the overlap of
third_party/LoFTR/assets/scannet_sample_images with the scannet_test_1500
pair list (14 pairs, indoor, nothing like the synthetic generator's
distribution). Protocol = the matcher diag: match a pair, estimate the
relative pose with OUR two-view RANSAC, report rotation/translation
angular error and the standard pose AUC@{5,10,20}.

Usage: python tools/probe_real_pairs.py --ckpt weights/demo_matcher_r3_bf16.msgpack \
          [--fine] [--cpu] [--img-resize 640]
"""

import argparse
import os
import sys

sys.path.insert(0, ".")

ASSETS = "/root/reference/third_party/LoFTR/assets"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="weights/demo_matcher_r3_bf16.msgpack")
    ap.add_argument("--fine", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--img-resize", type=int, default=640)
    ap.add_argument("--threshold", type=float, default=0.2)
    ap.add_argument("--ransac-px", type=float, default=1.0,
                    help="RANSAC inlier threshold in 640x480-frame pixels."
                         " The synthetic-eval default (1 px) assumes"
                         " sub-pixel matches; on noisier real matches a"
                         " tight threshold collapses the inlier set and"
                         " MSAC converges to arbitrary models")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from detectorfreesfm_tpu.data.images import load_gray
    from detectorfreesfm_tpu.models.loftr import (
        DetectorFreeMatcher, MatcherConfig)
    from detectorfreesfm_tpu.sfm.twoview import (
        estimate_relative_pose, normalize_points)
    from detectorfreesfm_tpu.core.geometry import np_quat_to_rotmat
    from detectorfreesfm_tpu.train.selfsup import load_matcher_params

    d = np.load(os.path.join(ASSETS, "scannet_test_1500/test.npz"),
                allow_pickle=True)
    intr = np.load(os.path.join(ASSETS, "scannet_test_1500/intrinsics.npz"),
                   allow_pickle=True)
    img_dir = os.path.join(ASSETS, "scannet_sample_images")
    have = {}
    for f in os.listdir(img_dir):
        s = int(f[5:9]); fr = int(f.split("frame-")[1][:6])
        have[(s, fr)] = os.path.join(img_dir, f)

    pairs = []
    for (s, _, f0, f1), rp in zip(d["name"], d["rel_pose"]):
        if (s, f0) in have and (s, f1) in have:
            T = np.asarray(rp, np.float64).reshape(3, 4)
            pairs.append((have[(s, f0)], have[(s, f1)],
                          intr[f"scene{s:04d}_00"], T))
    print(f"{len(pairs)} GT real pairs")

    on_tpu = jax.default_backend() == "tpu"
    dtype = "bfloat16" if on_tpu else "float32"
    cfg = MatcherConfig(compute_dtype=dtype, fine_enabled=args.fine,
                        match_threshold=args.threshold, max_matches=2048)
    params = load_matcher_params(args.ckpt, cfg=cfg)
    model = DetectorFreeMatcher(cfg)
    fwd = jax.jit(lambda p, a, b: model.apply(p, a, b))

    errs = []
    for p0, p1, K, T in pairs:
        li0 = load_gray(p0, long_side=args.img_resize,
                        pad_to=args.img_resize)
        li1 = load_gray(p1, long_side=args.img_resize,
                        pad_to=args.img_resize)
        out = fwd(params, jnp.asarray(li0.data)[None, :, :, None],
                  jnp.asarray(li1.data)[None, :, :, None])
        valid = np.asarray(out.valid[0])
        # -> original pixels, then into the 640x480 frame the published
        # ScanNet eval intrinsics are calibrated for (the asset JPEGs are
        # the raw 1296x968 color frames).
        s0 = li0.scale * np.array([640.0, 480.0]) / np.array(li0.orig_size,
                                                            np.float64)
        s1 = li1.scale * np.array([640.0, 480.0]) / np.array(li1.orig_size,
                                                             np.float64)
        uv0 = np.asarray(out.coords0[0], np.float64) * s0[None, :]
        uv1 = np.asarray(out.coords1[0], np.float64) * s1[None, :]
        n = int(valid.sum())
        if n < 16:
            errs.append((180.0, 180.0, n))
            continue
        x0 = np.asarray(normalize_points(jnp.asarray(uv0, jnp.float32),
                                         jnp.asarray(K, jnp.float32)))
        x1 = np.asarray(normalize_points(jnp.asarray(uv1, jnp.float32),
                                         jnp.asarray(K, jnp.float32)))
        res = estimate_relative_pose(
            jnp.asarray(x0), jnp.asarray(x1), jnp.asarray(valid),
            jax.random.PRNGKey(0), args.ransac_px / float(K[0, 0]))
        R_est = np_quat_to_rotmat(np.asarray(res.qvec))
        t_est = np.asarray(res.tvec, np.float64)
        R_gt, t_gt = T[:, :3], T[:, 3]
        # Match quality independent of the pose estimator: median Sampson
        # epipolar error of the matches under the GT pose (px in the
        # 640x480 frame). This is the number that separates "the matcher
        # degrades on real data" from "RANSAC failed".
        gt_epi = _median_sampson_px(uv0[valid], uv1[valid], K,
                                    R_gt, t_gt, np)
        tn = t_gt / max(np.linalg.norm(t_gt), 1e-12)
        r_err = np.degrees(np.arccos(np.clip(
            (np.trace(R_est.T @ R_gt) - 1) / 2, -1, 1)))
        t_err = np.degrees(np.arccos(np.clip(abs(float(t_est @ tn)), 0, 1)))
        errs.append((r_err, t_err, n, gt_epi))
        print(f"{os.path.basename(p0)[:24]}: R {r_err:6.2f} deg  "
              f"t {t_err:6.2f} deg  matches {n}  gt-epi {gt_epi:6.2f} px")

    e = np.array([[max(r, t)] for r, t, _, _ in errs])
    for thr in (5, 10, 20):
        # standard pose AUC over the pair set
        xs = np.linspace(0, thr, 101)
        rec = (e[:, 0][None, :] <= xs[:, None]).mean(1)
        auc = float(np.trapezoid(rec, xs) / thr)
        print(f"pose AUC@{thr}: {auc:.3f}")
    print(f"median max-err: {float(np.median(e)):.2f} deg  "
          f"matches med {int(np.median([n for _, _, n, _ in errs]))}  "
          f"gt-epi med {float(np.median([g for _, _, _, g in errs])):.2f} px")


def _median_sampson_px(uv0, uv1, K, R, t, np):
    Ki = np.linalg.inv(K)
    x0 = (Ki @ np.c_[uv0, np.ones(len(uv0))].T).T
    x1 = (Ki @ np.c_[uv1, np.ones(len(uv1))].T).T
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    Ex0, Etx1 = x0 @ E.T, x1 @ E
    num = np.abs(np.sum(x1 * Ex0, 1))
    den = np.sqrt(Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2
                  + Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2)
    return float(np.median(num / np.maximum(den, 1e-12)) * K[0, 0])


if __name__ == "__main__":
    main()
