"""Subprocess driver for test_ransac_invariance: verify a synthetic scene
and print per-pair inlier counts + the full registered reconstruction as
JSON. Run with XLA_FLAGS=--xla_force_host_platform_device_count=N to pin a
virtual device count; the output must be identical for every N
(VERDICT r2 #4: RANSAC outcomes were device-count dependent through the
sequential RNG stream)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from detectorfreesfm_tpu.sfm.mapper import IncrementalMapper, MapperConfig  # noqa: E402


def main():
    from test_mapper import _multi_view_scene, _scene_to_matches

    n_cams = 5
    pts, K, poses, uvs, visible = _multi_view_scene(n_cams, n_pts=220, noise=0.6)
    keypoints, matches = _scene_to_matches(n_cams, uvs, visible)
    sizes = {n: (640, 480) for n in keypoints}
    intrin = {n: K for n in keypoints}
    cfg = MapperConfig(
        geometry_verify_thr=4.0, init_max_error=4.0, abs_pose_max_error=4.0,
        filter_max_reproj_error=4.0, min_model_size=3,
        abs_pose_min_num_inliers=15,
    )
    mapper = IncrementalMapper(cfg)
    rec = mapper._setup(keypoints, sizes, intrin)
    verified = mapper.verify_pairs(rec, matches)
    out = {
        "n_devices": jax.device_count(),
        "pairs": {
            f"{a}-{b}": [v["n_inliers"], round(float(v.get("h_ratio", -1)), 6)]
            for (a, b), v in sorted(verified.items())
        },
    }
    # Full mapper run: registered set must also be invariant
    rec2 = mapper.run(keypoints, matches, sizes, intrin)
    out["registered"] = sorted(rec2.registered_images) if rec2 else []
    out["n_points"] = len(rec2.points) if rec2 else 0
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
