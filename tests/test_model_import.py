"""Empty-model generation / pose import + coarse_fine matcher mode."""

import jax
import jax.numpy as jnp
import numpy as np

from detectorfreesfm_tpu.sfm.model_import import (
    generate_empty_model,
    import_from_colmap_prior,
    load_intrin_dir,
    load_pose_dir,
)


def test_generate_empty_model_from_txt_dirs(tmp_path):
    poses_dir = tmp_path / "poses"
    intrin_dir = tmp_path / "intrins"
    poses_dir.mkdir()
    intrin_dir.mkdir()
    K = np.array([[500.0, 0, 320], [0, 500, 240], [0, 0, 1]])
    m = np.eye(4)
    m[:3, 3] = [0, 0, 2.0]
    np.savetxt(poses_dir / "im0.txt", m)
    np.savetxt(intrin_dir / "im0.txt", K)
    poses = load_pose_dir(str(poses_dir))
    intrins = load_intrin_dir(str(intrin_dir))
    rec = generate_empty_model(
        {"im0.png": (640, 480), "im1.png": (640, 480)}, poses, intrins
    )
    im0 = rec.image_by_name("im0.png")
    assert im0.registered
    np.testing.assert_allclose(im0.tvec, [0, 0, 2.0])
    np.testing.assert_allclose(rec.K_of_image(im0.id), K)
    assert not rec.image_by_name("im1.png").registered
    assert len(rec.points) == 0


def test_generate_empty_c2w_inversion(tmp_path):
    from detectorfreesfm_tpu.core.geometry import quat_to_rotmat

    poses_dir = tmp_path / "poses"
    poses_dir.mkdir()
    # camera at (1, 0, 0) looking along +z, stored as c2w
    m = np.eye(4)
    m[:3, 3] = [1.0, 0, 0]
    np.savetxt(poses_dir / "a.txt", m)
    poses = load_pose_dir(str(poses_dir), pose_format="c2w")
    q, t = poses["a"]
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    C = -R.T @ t  # camera center must be (1, 0, 0)
    np.testing.assert_allclose(C, [1.0, 0, 0], atol=1e-9)


def test_import_from_colmap_prior_strips_points(tmp_path):
    from detectorfreesfm_tpu.data.colmap_io import Camera
    from detectorfreesfm_tpu.sfm.reconstruction import Reconstruction, RImage

    rec = Reconstruction()
    rec.add_camera(Camera(1, "PINHOLE", 64, 64, np.array([50.0, 50, 32, 32])))
    for i in (1, 2):
        rec.add_image(RImage(id=i, name=f"i{i}", camera_id=1,
                             xys=np.random.rand(5, 2)))
        rec.set_pose(i, np.array([1.0, 0, 0, 0]), np.array([0.0, 0, float(i)]))
    rec.add_point(np.array([0.0, 0, 3]), [(1, 0), (2, 0)])
    out = str(tmp_path / "model")
    import os

    os.makedirs(out)
    rec.write(out)
    rec2 = import_from_colmap_prior(out)
    assert len(rec2.points) == 0
    assert len(rec2.registered_images) == 2
    assert (rec2.images[1].point3D_ids == -1).all()


def test_matcher_coarse_fine_mode():
    """fine_enabled=True must produce sub-grid-cell coordinates."""
    from detectorfreesfm_tpu.models.loftr import DetectorFreeMatcher, MatcherConfig

    cfg = MatcherConfig(fine_enabled=True, max_matches=64,
                        match_threshold=0.01, border=1)
    model = DetectorFreeMatcher(cfg)
    rng = jax.random.PRNGKey(0)
    img = jax.random.uniform(rng, (1, 64, 64, 1), jnp.float32)
    params = model.init(rng, img, img)
    out = model.apply(params, img, img)
    v = np.asarray(out.valid[0])
    assert v.sum() > 0
    c1 = np.asarray(out.coords1[0])[v]
    # coords0 stay on the 8px grid; coords1 should carry fractional offsets
    c0 = np.asarray(out.coords0[0])[v]
    assert np.allclose(c0 % 8.0, 0.0, atol=1e-5)
    assert not np.allclose(c1 % 8.0, 0.0, atol=1e-3)
