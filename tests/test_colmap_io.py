import numpy as np

from detectorfreesfm_tpu.data import colmap_io as C


def make_model(rng):
    cams = {
        1: C.Camera(1, "PINHOLE", 640, 480, np.array([500.0, 480.0, 320.0, 240.0])),
        2: C.Camera(2, "SIMPLE_RADIAL", 800, 600, np.array([650.0, 400.0, 300.0, 0.01])),
    }
    images = {}
    for i in range(1, 4):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        n = int(rng.integers(0, 20))
        images[i] = C.Image(
            i, q, rng.normal(size=3), 1 + (i % 2), f"img_{i:04d}.jpg",
            rng.uniform(0, 640, size=(n, 2)),
            rng.integers(-1, 50, size=(n,)).astype(np.int64),
        )
    pts = {}
    for j in range(1, 6):
        t = int(rng.integers(1, 4))
        pts[j] = C.Point3D(
            j, rng.normal(size=3), rng.integers(0, 255, size=3).astype(np.uint8),
            float(rng.uniform(0, 2)),
            rng.integers(1, 4, size=(t,)).astype(np.int32),
            rng.integers(0, 10, size=(t,)).astype(np.int32),
        )
    return cams, images, pts


def assert_models_equal(a, b, atol=0.0):
    ca, ia, pa = a
    cb, ib, pb = b
    assert set(ca) == set(cb) and set(ia) == set(ib) and set(pa) == set(pb)
    for k in ca:
        assert ca[k].model == cb[k].model
        assert (ca[k].width, ca[k].height) == (cb[k].width, cb[k].height)
        np.testing.assert_allclose(ca[k].params, cb[k].params, atol=atol)
    for k in ia:
        np.testing.assert_allclose(ia[k].qvec, ib[k].qvec, atol=atol)
        np.testing.assert_allclose(ia[k].tvec, ib[k].tvec, atol=atol)
        assert ia[k].name == ib[k].name
        assert ia[k].camera_id == ib[k].camera_id
        np.testing.assert_allclose(ia[k].xys, ib[k].xys, atol=atol)
        np.testing.assert_array_equal(ia[k].point3D_ids, ib[k].point3D_ids)
    for k in pa:
        np.testing.assert_allclose(pa[k].xyz, pb[k].xyz, atol=atol)
        np.testing.assert_array_equal(pa[k].rgb, pb[k].rgb)
        np.testing.assert_array_equal(pa[k].image_ids, pb[k].image_ids)
        np.testing.assert_array_equal(pa[k].point2D_idxs, pb[k].point2D_idxs)


def test_bin_roundtrip(tmp_path):
    model = make_model(np.random.default_rng(0))
    C.write_model(*model, str(tmp_path), ext=".bin")
    back = C.read_model(str(tmp_path))
    assert_models_equal(model, back)


def test_txt_roundtrip(tmp_path):
    model = make_model(np.random.default_rng(1))
    C.write_model(*model, str(tmp_path), ext=".txt")
    back = C.read_model(str(tmp_path), ext=".txt")
    assert_models_equal(model, back, atol=1e-12)


def test_ply_write(tmp_path):
    _, _, pts = make_model(np.random.default_rng(2))
    path = tmp_path / "model.ply"
    C.write_ply(pts, str(path))
    data = path.read_bytes()
    assert data.startswith(b"ply")
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    assert len(data) - header_end == len(pts) * 15  # 3*f4 + 3*u1


def test_h5_roundtrip(tmp_path):
    from detectorfreesfm_tpu.data import h5io

    d = {"a/b.jpg": np.arange(10.0), "c.jpg": np.ones((3, 2), np.float32)}
    p = str(tmp_path / "kpts.h5")
    h5io.save_h5(d, p)
    back = h5io.load_h5(p)
    assert set(back) == set(d)
    for k in d:
        np.testing.assert_array_equal(back[k], d[k])
