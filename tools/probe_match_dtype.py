"""Isolate the bf16-vs-f32 matcher quality gap (round 4).

Round-4 finding: rematching scene_1001 on the CPU backend (f32 dense)
yields 18.4k matches and a 0.69 AUC@5 reconstruction where the TPU run
(same weights, same threshold) yields 10.1k matches and 0.18. This probe
matches one scene's pairs under controlled dtype configs on the CPU
backend and reports match counts + epipolar quality per config, to
attribute the gap to (a) bf16 features/correlation vs (b) the fused
Pallas path vs (c) backend-default matmul precision.

Usage: python tools/probe_match_dtype.py --scene .data/synth5/eval/scene_1001 \
           --ckpt weights/demo_matcher_r3_bf16.msgpack
"""

import argparse
import dataclasses
import itertools
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--img-resize", type=int, default=512)
    ap.add_argument("--threshold", type=float, default=0.2)
    ap.add_argument("--configs", default="f32,bf16")
    args = ap.parse_args()

    import jax

    if jax.default_backend() != "tpu":
        jax.config.update("jax_platforms", "cpu")

    from detectorfreesfm_tpu.match.engine import (
        EngineConfig, PairMatchingEngine,
    )
    from detectorfreesfm_tpu.train.selfsup import load_matcher_params
    from detectorfreesfm_tpu.pipeline import read_intrin_txt, read_pose_txt
    from detectorfreesfm_tpu.core.geometry import np_quat_to_rotmat

    img_dir = os.path.join(args.scene, "images")
    names = sorted(os.listdir(img_dir))
    paths = {n: os.path.join(img_dir, n) for n in names}
    pairs = list(itertools.combinations(names, 2))

    # GT epipolar scoring
    intr, gt = {}, {}
    for f in sorted(os.listdir(os.path.join(args.scene, "intrins"))):
        stem = os.path.splitext(f)[0]
        intr[stem] = read_intrin_txt(os.path.join(args.scene, "intrins", f))
        gt[stem] = read_pose_txt(os.path.join(args.scene, "poses", f))

    def epi_errors(a, b, k0, k1):
        sa, sb = a.rsplit(".", 1)[0], b.rsplit(".", 1)[0]
        Ka, Kb = intr[sa], intr[sb]
        qa, ta = gt[sa]
        qb, tb = gt[sb]
        Ra, Rb = np_quat_to_rotmat(qa), np_quat_to_rotmat(qb)
        R = Rb @ Ra.T
        t = tb - R @ ta
        tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]],
                       [-t[1], t[0], 0]])
        F = np.linalg.inv(Kb).T @ tx @ R @ np.linalg.inv(Ka)
        p0 = np.concatenate([k0, np.ones((len(k0), 1))], 1)
        p1 = np.concatenate([k1, np.ones((len(k1), 1))], 1)
        Fp0 = p0 @ F.T
        d = np.abs(np.sum(p1 * Fp0, 1)) / np.maximum(
            1e-9, np.hypot(Fp0[:, 0], Fp0[:, 1]))
        return d

    for mode in args.configs.split(","):
        base, _, suffix = mode.partition("+")
        dtype = {"f32": "float32", "bf16": "bfloat16"}[base]
        ecfg = EngineConfig(
            img_resize=args.img_resize,
            match_threshold=args.threshold,
            compute_dtype=dtype,
            fused_matching=suffix == "fused",
            batch_size=1,
        )
        # Template init must NOT trace the fused Pallas kernel (it runs on
        # the CPU backend) — load with fused off, same param structure.
        params = load_matcher_params(
            args.ckpt, img_size=args.img_resize,
            cfg=dataclasses.replace(ecfg.matcher_config(),
                                    fused_matching=False))
        eng = PairMatchingEngine(ecfg, params=params)
        images = eng.load_images(paths)
        raw = eng.match_pairs(pairs, images)
        counts, meds, inl = [], [], []
        for (a, b), m in raw.items():
            counts.append(len(m["conf"]))
            if len(m["conf"]) >= 8:
                d = epi_errors(a, b, m["kpts0"], m["kpts1"])
                meds.append(float(np.median(d)))
                inl.append(float(np.mean(d < 4.0)))
        print(json.dumps({
            "config": mode,
            "total_matches": int(np.sum(counts)),
            "mean_per_pair": round(float(np.mean(counts)), 1),
            "med_epi_px": round(float(np.median(meds)), 3),
            "inlier_frac@4px": round(float(np.mean(inl)), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
