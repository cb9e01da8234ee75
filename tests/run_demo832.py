"""Single-device runner for the 832 px demo golden test.

Reconstructs the demo scene from the cached 832 px matches with the exact
mapper config the full pipeline derives (pipeline.py auto_scale_thresholds
over MapperConfig defaults, README demo flags), then prints one JSON line.
Kept out of the pytest process because the suite forces 8 virtual devices
(tests/conftest.py) and mesh-padded verification perturbs RANSAC sampling.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from detectorfreesfm_tpu.data.h5io import load_h5
from detectorfreesfm_tpu.sfm.mapper import IncrementalMapper, MapperConfig

DATA_832 = os.path.join(os.path.dirname(__file__), "data", "demo_cached_832")

DEMO_SIZES = {
    "00318781_8039756060.jpg": (1057, 780),
    "01606161_5223112207.jpg": (1019, 679),
    "02786360_4030483701.jpg": (337, 447),
    "02928139_3448003521.jpg": (780, 1063),
    "03599123_13889501361.jpg": (773, 1038),
    "04398000_3306414527.jpg": (888, 1081),
    "04408102_2916920065.jpg": (773, 1039),
    "04477856_4856961901.jpg": (687, 1039),
}


def main():
    kps = load_h5(os.path.join(DATA_832, "keypoints.h5"))
    raw = load_h5(os.path.join(DATA_832, "matches.h5"))
    matches = {tuple(k.split("|")): v.astype(np.int32)
               for k, v in raw.items()}
    sizes = {n: DEMO_SIZES[n] for n in kps}
    f = max(1.0, float(np.mean([max(w, h) for w, h in sizes.values()])) / 832)
    cfg = MapperConfig(
        geometry_verify_thr=10 * f, init_max_error=10 * f,
        abs_pose_max_error=12 * f, filter_max_reproj_error=10 * f,
        tri_merge_max_reproj_error=10 * f,
        tri_complete_max_reproj_error=10 * f,
        abs_pose_min_num_inliers=8, refine_focal=True,
        min_model_size=3, min_tri_angle_deg=1.0,
    )
    rec = IncrementalMapper(cfg).run(kps, matches, sizes, None)
    if rec is None:
        print(json.dumps({"registered": 0, "points": 0,
                          "mean_reproj": float("inf")}))
        return 1
    errs = np.concatenate(list(rec.reprojection_errors().values()))
    print(json.dumps({
        "registered": len(rec.registered_images),
        "points": len(rec.points),
        "mean_reproj": float(np.mean(errs)),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
