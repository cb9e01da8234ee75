"""SIMPLE_RADIAL end-to-end: a scene observed through k1 != 0 distortion
reconstructs accurately only when the mapper models distortion, and BA
recovers k1 (VERDICT r2 #3; reference default camera model for ETH3D SfM is
SIMPLE_RADIAL — hydra_configs/eth3d_sfm/dfsfm.yaml:94)."""

import numpy as np

from detectorfreesfm_tpu.core.geometry import (
    np_distort_pixels, np_undistort_pixels,
)
from detectorfreesfm_tpu.sfm.mapper import IncrementalMapper, MapperConfig

from test_mapper import _multi_view_scene, _scene_to_matches

GT_K1 = -0.15


def _distorted_scene(n_cams=6, noise=0.2):
    pts, K, poses, uvs, visible = _multi_view_scene(
        n_cams, n_pts=500, seed=3, noise=0.0)
    # Distort the observations: what a real SIMPLE_RADIAL camera measures
    rng = np.random.default_rng(5)
    uvs_d = [np_distort_pixels(uv[:, :2], K, GT_K1)
             + rng.normal(0, noise, (len(uv), 2)) for uv in uvs]
    # keep only in-frame after distortion
    for i in range(n_cams):
        inb = ((uvs_d[i][:, 0] > 0) & (uvs_d[i][:, 0] < 640)
               & (uvs_d[i][:, 1] > 0) & (uvs_d[i][:, 1] < 480))
        visible[i] &= inb
    keypoints, matches = _scene_to_matches(n_cams, uvs_d, visible)
    sizes = {n: (640, 480) for n in keypoints}
    intrin = {n: K for n in keypoints}
    return keypoints, matches, sizes, intrin


def _mean_reproj(rec):
    errs = np.concatenate(list(rec.reprojection_errors().values()))
    return float(np.mean(errs))


def test_distortion_roundtrip():
    K = np.array([[600.0, 0, 320.0], [0, 600.0, 240.0], [0, 0, 1.0]])
    rng = np.random.default_rng(0)
    uv = rng.uniform([10, 10], [630, 470], (500, 2))
    d = np_distort_pixels(uv, K, GT_K1)
    u = np_undistort_pixels(d, K, GT_K1)
    assert np.abs(u - uv).max() < 1e-5  # fixed-point iteration tolerance
    # the distortion is substantial at the corners (the test below is
    # meaningless if it isn't)
    assert np.abs(d - uv).max() > 10.0


def test_simple_radial_recovers_k1_and_subpixel():
    keypoints, matches, sizes, intrin = _distorted_scene()
    base = dict(
        geometry_verify_thr=8.0, init_max_error=8.0, abs_pose_max_error=8.0,
        filter_max_reproj_error=8.0, min_model_size=3,
        abs_pose_min_num_inliers=15,
    )
    rec_sr = IncrementalMapper(MapperConfig(
        camera_model="SIMPLE_RADIAL", refine_extra_params=True, **base
    )).run(keypoints, matches, sizes, intrin)
    assert rec_sr is not None
    assert len(rec_sr.registered_images) == 6
    err_sr = _mean_reproj(rec_sr)
    assert err_sr < 1.0, err_sr
    k1s = [rec_sr.cameras[rec_sr.images[i].camera_id].k1()
           for i in rec_sr.registered_images]
    k1 = float(np.median(k1s))
    assert abs(k1 - GT_K1) < 0.1 * abs(GT_K1), (k1, GT_K1)

    # PINHOLE on the same data: the unmodeled distortion must show as
    # clearly worse residuals (it gets partially absorbed into poses/points
    # but cannot reach the modeled accuracy)
    rec_ph = IncrementalMapper(MapperConfig(**base)).run(
        keypoints, matches, sizes, intrin)
    assert rec_ph is not None
    if len(rec_ph.registered_images) == 6:
        assert _mean_reproj(rec_ph) > 2.0 * err_sr, (
            _mean_reproj(rec_ph), err_sr)
