"""Self-contained matcher-quality probe: match a (synthetic) eval scene's
pairs with a given checkpoint and score median epipolar error against GT —
no mapper, no artifacts. CPU-runnable, so intermediate training checkpoints
can be scored while the chip keeps training.

Usage: python tools/diag_matcher.py --ckpt CKPT --dataset .data/synth5/eval \
           [--scenes scene_0001,scene_0002] [--img-resize 512] [--cpu]
"""

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--scenes", default=None)
    ap.add_argument("--img-resize", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--threshold", type=float, default=0.2)
    ap.add_argument("--matcher", default="loftr",
                    help="loftr | aspan | matchformer — which architecture "
                         "the checkpoint belongs to")
    ap.add_argument("--fine", action="store_true",
                    help="run the coarse_fine match type (sub-pixel fine "
                         "head, no grid rounding) — measures the fine "
                         "stage's epipolar error directly")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from detectorfreesfm_tpu.match.engine import EngineConfig, PairMatchingEngine
    from detectorfreesfm_tpu.models.loftr import MatcherConfig
    from detectorfreesfm_tpu.core.geometry import np_quat_to_rotmat
    from detectorfreesfm_tpu.pipeline import read_intrin_txt, read_pose_txt
    from detectorfreesfm_tpu.train.selfsup import load_matcher_params

    on_tpu = jax.default_backend() == "tpu"
    dtype = "bfloat16" if on_tpu else "float32"
    if args.matcher in ("loftr", "loftr_official", "detectorfree"):
        params = load_matcher_params(
            args.ckpt, cfg=MatcherConfig(compute_dtype=dtype,
                                         fine_enabled=args.fine))
    else:
        # Alt architectures: init a template at the eval size, restore the
        # trainer checkpoint into it (structure-tolerant).
        import jax.numpy as jnp

        from detectorfreesfm_tpu.models import build_matcher
        from detectorfreesfm_tpu.train.selfsup import _from_bytes_any

        model = build_matcher(args.matcher, compute_dtype=dtype)
        s = args.img_resize
        dummy = jnp.zeros((1, s, s, 1), jnp.float32)
        template = model.init(jax.random.PRNGKey(0), dummy, dummy)
        with open(args.ckpt, "rb") as f:
            blob = f.read()
        params = _from_bytes_any(template, blob, args.ckpt)
    engine = PairMatchingEngine(EngineConfig(
        img_resize=args.img_resize, match_threshold=args.threshold,
        matcher=args.matcher, compute_dtype=dtype,
        fine_enabled=args.fine,
        # fused path skips the dense conf the fine stage needs
        fused_matching=on_tpu and args.matcher == "loftr" and not args.fine,
        batch_size=4 if on_tpu else 1,
    ), params=params)

    scenes = (args.scenes.split(",") if args.scenes else sorted(
        d for d in os.listdir(args.dataset)
        if os.path.isdir(os.path.join(args.dataset, d, "images"))
    ))
    meds = {}
    for s in scenes:
        sd = os.path.join(args.dataset, s)
        img_dir = os.path.join(sd, "images")
        names = sorted(os.listdir(img_dir))
        pairs = list(itertools.combinations(names, 2))
        paths = {n: os.path.join(img_dir, n) for n in names}
        images = engine.load_images(paths)
        raw = engine.match_pairs(pairs, images)
        poses, intrins = {}, {}
        for f in sorted(os.listdir(os.path.join(sd, "poses"))):
            stem = os.path.splitext(f)[0]
            poses[stem] = read_pose_txt(os.path.join(sd, "poses", f))
            intrins[stem] = read_intrin_txt(os.path.join(sd, "intrins", f))
        errs, counts = [], []
        for (a, b), m in raw.items():
            sa, sb = os.path.splitext(a)[0], os.path.splitext(b)[0]
            qa, ta = poses[sa]
            qb, tb = poses[sb]
            Ra = np_quat_to_rotmat(np.asarray(qa)[None])[0]
            Rb = np_quat_to_rotmat(np.asarray(qb)[None])[0]
            R = Rb @ Ra.T
            t = tb - R @ ta
            tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]],
                           [-t[1], t[0], 0]])
            F = (np.linalg.inv(intrins[sb]).T @ (tx @ R)
                 @ np.linalg.inv(intrins[sa]))
            ua, ub = m["kpts0"], m["kpts1"]
            if len(ua) == 0:
                continue
            pa = np.concatenate([ua, np.ones((len(ua), 1))], 1)
            pb = np.concatenate([ub, np.ones((len(ub), 1))], 1)
            ln = pa @ F.T
            d = np.abs(np.sum(pb * ln, 1)) / np.maximum(
                np.hypot(ln[:, 0], ln[:, 1]), 1e-12)
            errs.append(d)
            counts.append(len(d))
        e = np.concatenate(errs) if errs else np.array([1e9])
        meds[s] = float(np.median(e))
        print(json.dumps({
            "scene": s, "n_matches": int(e.size),
            "median_epi_px": round(meds[s], 2),
            "inlier_frac_4px": round(float((e < 4).mean()), 3),
        }), flush=True)
    print(json.dumps({
        "ckpt": os.path.basename(args.ckpt),
        "worst_median_epi_px": round(max(meds.values()), 2),
        "all_below_5px": bool(max(meds.values()) <= 5.0),
    }))


if __name__ == "__main__":
    main()
