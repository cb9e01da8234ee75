"""Golden regression: the bundled demo scene reconstructs from cached
real-image matches.

tests/data/demo_cached/ holds the keypoint/match h5 artifacts produced by the
homography-self-supervised matcher (3100 steps on the scene's own images,
416px, bf16, TPU) on the reference's 8-image example scene. This pins the
whole geometric stack — focal-search verification, track building,
incremental mapping with retriangulation + registration fixpoint, Schur BA —
against real (noisy, wide-baseline, unknown-intrinsics) data without needing
a TPU or weights at test time.
"""

import os

import numpy as np

from detectorfreesfm_tpu.data.h5io import load_h5
from detectorfreesfm_tpu.sfm.mapper import IncrementalMapper, MapperConfig

DATA = os.path.join(os.path.dirname(__file__), "data", "demo_cached")

# Original (W, H) of the demo images (read once from the reference scene)
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


def test_demo_scene_reconstructs_from_cached_matches():
    kps = load_h5(os.path.join(DATA, "keypoints.h5"))
    raw = load_h5(os.path.join(DATA, "matches.h5"))
    matches = {tuple(k.split("|")): v.astype(np.int32) for k, v in raw.items()}
    sizes = {n: DEMO_SIZES[n] for n in kps}
    f = max(1.0, float(np.mean([max(w, h) for w, h in sizes.values()])) / 416)
    cfg = MapperConfig(
        geometry_verify_thr=10 * f, init_max_error=10 * f,
        abs_pose_max_error=12 * f, filter_max_reproj_error=10 * f,
        tri_merge_max_reproj_error=10 * f,
        tri_complete_max_reproj_error=10 * f,
        abs_pose_min_num_inliers=8, refine_focal=True,
        min_model_size=3, min_tri_angle_deg=1.0,
    )
    rec = IncrementalMapper(cfg).run(kps, matches, sizes, None)
    assert rec is not None, "demo scene must reconstruct"
    assert len(rec.registered_images) >= 4, rec.registered_images
    assert len(rec.points) >= 200, len(rec.points)
    errs = np.concatenate(list(rec.reprojection_errors().values()))
    assert float(np.mean(errs)) < 8.0, float(np.mean(errs))


DATA_832 = os.path.join(os.path.dirname(__file__), "data", "demo_cached_832")


def test_demo_scene_832_reconstructs_fully():
    """Round-2 golden: the 832 px match cache (depth-warp-trained matcher,
    `weights/demo_matcher_r2_bf16.msgpack`) registers ALL 8 images.

    Pins the dense focal-grid uncalibrated registration (sfm/mapper.py) and
    the relaxed second-chance pass against real wide-baseline data. Observed:
    8/8, 1508 points, 2.82 px mean reprojection (coarse only; the full
    pipeline with refinement lands at 1.26 px).

    Runs in a CPU subprocess at the suite's 8 virtual devices: since the
    content-hash RANSAC keys (sfm/mapper.py::_stable_rngs, round 3) the
    outcome is device-count invariant — the former single-device pin is
    gone (tests/test_ransac_invariance.py proves 1 == 2 == 8 devices)."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update({
        "PYTHONPATH": repo,           # drop the axon sitecustomize dir
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    })
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "run_demo832.py")],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["registered"] == 8, res
    assert res["points"] >= 1000, res
    assert res["mean_reproj"] < 5.0, res


import pytest

REF_IMAGES = "/root/reference/SfM_dataset/example_dataset/example_scene/images"


@pytest.mark.skipif(not os.path.isdir(REF_IMAGES),
                    reason="reference demo images not mounted")
def test_demo_full_pipeline_with_bundled_weights(tmp_path):
    """Cached matches -> mapper -> trained-refiner refinement must reach at
    least the coarse model's quality and keep >= 5 images (observed: the
    refinement pass re-registers a 6th image and drops mean reprojection
    5.05 -> 3.78 px)."""
    import shutil

    from detectorfreesfm_tpu.pipeline import PipelineConfig, reconstruct_scene
    from detectorfreesfm_tpu.refine.loop import RefineConfig
    from detectorfreesfm_tpu.sfm.mapper import MapperConfig
    from detectorfreesfm_tpu.train.refiner_selfsup import load_refiner_params

    out = tmp_path / "scene"
    out.mkdir()
    for f in ("keypoints.h5", "matches.h5"):
        shutil.copy(os.path.join(DATA, f), out / f)
    weights = os.path.join(os.path.dirname(__file__), "..", "weights",
                           "demo_refiner_bf16.msgpack")
    rparams = load_refiner_params(weights)
    cfg = PipelineConfig(
        img_resize=416, n_refine_iters=2,
        mapper=MapperConfig(abs_pose_min_num_inliers=8, refine_focal=True,
                            min_model_size=3, min_tri_angle_deg=1.0),
        refine=RefineConfig(windows=(15, 11), chunk_tracks=256,
                            filter_thresholds=(6.0, 4.0)),
    )
    rec = reconstruct_scene(REF_IMAGES, str(out), cfg, refiner_params=rparams)
    assert rec is not None
    assert len(rec.registered_images) >= 5
    errs = np.concatenate(list(rec.reprojection_errors().values()))
    assert float(np.mean(errs)) < 6.0, float(np.mean(errs))
    assert len(rec.points) >= 150
