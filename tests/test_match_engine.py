"""Pair construction + mesh-sharded matching engine tests (8 virtual CPU devs)."""

import numpy as np
import pytest

from detectorfreesfm_tpu.data.images import LoadedImage
from detectorfreesfm_tpu.match.engine import EngineConfig, PairMatchingEngine
from detectorfreesfm_tpu.match.pairs import (
    exhaustive_pairs,
    read_pairs_txt,
    sequential_pairs,
    write_pairs_txt,
)
from detectorfreesfm_tpu.parallel.mesh import make_mesh, pad_to_multiple


def test_exhaustive_pairs():
    names = ["a", "b", "c", "d"]
    pairs = exhaustive_pairs(names)
    assert len(pairs) == 6
    assert ("a", "d") in pairs and ("b", "c") in pairs
    assert all(names.index(x) < names.index(y) for x, y in pairs)


def test_sequential_pairs():
    names = [f"i{k}" for k in range(5)]
    pairs = sequential_pairs(names, window=2)
    assert ("i0", "i1") in pairs and ("i0", "i2") in pairs
    assert ("i0", "i3") not in pairs


def test_pairs_txt_roundtrip(tmp_path):
    pairs = exhaustive_pairs(["x.png", "y.png", "z.png"])
    p = str(tmp_path / "pairs.txt")
    write_pairs_txt(p, pairs)
    assert read_pairs_txt(p) == pairs


def test_pad_to_multiple():
    assert pad_to_multiple(5, 8) == 8
    assert pad_to_multiple(8, 8) == 8
    assert pad_to_multiple(0, 8) == 0


def _fake_image(size, rng):
    data = rng.uniform(0.0, 1.0, (size, size)).astype(np.float32)
    return LoadedImage(
        data=data,
        scale=np.array([1.0, 1.0], np.float32),
        orig_size=(size, size),
        valid_size=(size, size),
    )


def test_engine_matches_identical_images_on_mesh():
    """Two identical images must match near-diagonally; runs sharded over all
    8 virtual devices (5 pairs padded to 8)."""
    rng = np.random.default_rng(0)
    size = 64
    cfg = EngineConfig(img_resize=size, batch_size=1, max_matches=32,
                      match_threshold=0.01)
    mesh = make_mesh()
    engine = PairMatchingEngine(cfg, mesh=mesh)
    images = {f"im{i}": _fake_image(size, rng) for i in range(3)}
    # im_same is a copy of im0 -> the (im0, im_same) pair must self-match
    images["im_same"] = LoadedImage(
        images["im0"].data.copy(), images["im0"].scale,
        images["im0"].orig_size, images["im0"].valid_size,
    )
    pairs = [("im0", "im_same"), ("im0", "im1"), ("im0", "im2"),
             ("im1", "im2"), ("im1", "im_same")]
    out = engine.match_pairs(pairs, images)
    assert set(out) == set(pairs)
    m = out[("im0", "im_same")]
    assert len(m["conf"]) > 0, "identical images should produce matches"
    # untrained net: identical inputs -> identical features -> diagonal matches
    np.testing.assert_allclose(m["kpts0"], m["kpts1"], atol=1e-3)


def test_native_image_loader_matches_pil(tmp_path):
    """The C++ loader (native/imageloader.cpp) must agree with the PIL path
    on dims/scale bookkeeping and pixels (~1/255: JPEG luma is taken from
    the Y channel directly instead of PIL's YCbCr->RGB->L double rounding;
    the resize filter is identical)."""
    import numpy as np
    import pytest
    from PIL import Image as PILImage

    from detectorfreesfm_tpu.data.images import _load_native_loader, load_gray

    if _load_native_loader() is None:
        pytest.skip("native loader unavailable (no g++/libjpeg)")
    rng = np.random.default_rng(0)
    arr = (rng.uniform(0, 255, (123, 87, 3))).astype(np.uint8)
    for name, fmt in (("a.jpg", "JPEG"), ("a.png", "PNG")):
        p = str(tmp_path / name)
        PILImage.fromarray(arr).save(p, fmt)
        a = load_gray(p, 64, pad_to=64, backend="native")
        b = load_gray(p, 64, pad_to=64, backend="pil")
        assert a.valid_size == b.valid_size
        assert a.orig_size == b.orig_size
        np.testing.assert_allclose(a.scale, b.scale)
        tol = 0.02 if fmt == "JPEG" else 0.008
        assert float(np.abs(a.data - b.data).max()) < tol, fmt
        # padding stays exactly zero (width is the short side here)
        nw = a.valid_size[0]
        assert float(np.abs(a.data[:, nw:]).max()) == 0.0
