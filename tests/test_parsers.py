"""Dataset parser tests: ETH3D / IMC layouts -> the CLI scene layout.

Builds miniature datasets with colmap_io-written ground-truth models and
checks the parsers emit poses/intrins/images that round-trip through the
CLI's own scene loader (reference tools/parse_data/*.py)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from detectorfreesfm_tpu.core.geometry import np_quat_to_rotmat
from detectorfreesfm_tpu.data import colmap_io


def _tiny_model(n=3, seed=0):
    rng = np.random.default_rng(seed)
    cams, imgs = {}, {}
    for i in range(1, n + 1):
        cams[i] = colmap_io.Camera(
            id=i, model="PINHOLE", width=64, height=48,
            params=np.array([60.0, 60.0, 32.0, 24.0]),
        )
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        imgs[i] = colmap_io.Image(
            id=i, qvec=q, tvec=rng.normal(size=3), camera_id=i,
            name=f"im{i}.png", xys=np.zeros((0, 2)),
            point3D_ids=np.zeros((0,), np.int64),
        )
    return cams, imgs, {}


def _write_dataset(root, model_subdir, img_subdir, n=3):
    from PIL import Image as PILImage

    cams, imgs, pts = _tiny_model(n)
    os.makedirs(os.path.join(root, model_subdir), exist_ok=True)
    colmap_io.write_model(cams, imgs, pts, os.path.join(root, model_subdir),
                          ext=".txt")
    os.makedirs(os.path.join(root, img_subdir), exist_ok=True)
    for im in imgs.values():
        arr = (np.random.default_rng(im.id).uniform(0, 255, (48, 64))
               .astype(np.uint8))
        PILImage.fromarray(arr).save(os.path.join(root, img_subdir, im.name))
    return cams, imgs


def _check_layout(out, cams, imgs):
    from detectorfreesfm_tpu.cli import _load_scene_gt as load_scene_ground_truth

    for im in imgs.values():
        stem = os.path.splitext(im.name)[0]
        assert os.path.exists(os.path.join(out, "images", im.name))
        m = np.loadtxt(os.path.join(out, "poses", f"{stem}.txt"))
        R_gt = np_quat_to_rotmat(np.asarray(im.qvec, np.float64))
        np.testing.assert_allclose(m[:3, :3], R_gt, atol=1e-8)
        np.testing.assert_allclose(m[:3, 3], im.tvec, atol=1e-8)
        K = np.loadtxt(os.path.join(out, "intrins", f"{stem}.txt"))
        np.testing.assert_allclose(K, cams[im.camera_id].K(), atol=1e-8)
    poses, intrins = load_scene_ground_truth(out)
    assert poses is not None and len(poses) == len(imgs)
    assert intrins is not None and len(intrins) == len(imgs)


def test_parse_eth3d_layout(tmp_path):
    from parse_eth3d_dataset import parse_scene

    scene = tmp_path / "courtyard"
    cams, imgs = _write_dataset(str(scene), "dslr_calibration_undistorted",
                                "images")
    out = tmp_path / "parsed" / "courtyard"
    parse_scene(str(scene), str(out), "dslr_calibration_undistorted")
    _check_layout(str(out), cams, imgs)


def test_parse_imc_set100_layout(tmp_path):
    """IMC keeps images NEXT TO the model (set_100/images); regression for
    the parser silently emitting zero image links."""
    from parse_eth3d_dataset import parse_scene

    scene = tmp_path / "british_museum"
    cams, imgs = _write_dataset(str(scene), os.path.join("set_100", "sfm"),
                                os.path.join("set_100", "images"))
    out = tmp_path / "parsed" / "british_museum"
    parse_scene(str(scene), str(out), os.path.join("set_100", "sfm"),
                img_subdir=os.path.join("set_100", "images"))
    _check_layout(str(out), cams, imgs)


def test_parse_scene_raises_on_missing_images(tmp_path):
    import pytest
    from parse_eth3d_dataset import parse_scene

    scene = tmp_path / "broken"
    _write_dataset(str(scene), "sfm", "images")
    with pytest.raises(FileNotFoundError):
        parse_scene(str(scene), str(tmp_path / "out"), "sfm",
                    img_subdir="set_100/images")  # wrong image root
