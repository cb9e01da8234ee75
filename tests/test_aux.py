"""Auxiliary subsystems: database, aggregation, profiler, orchestration,
model selection, vis exports."""

import os

import numpy as np

from detectorfreesfm_tpu.data.database import (
    COLMAPDatabase,
    export_scene_to_database,
    image_ids_to_pair_id,
    pair_id_to_image_ids,
)
from detectorfreesfm_tpu.eval.aggregate import (
    aggregate_multi_scene_metrics,
    format_report,
)
from detectorfreesfm_tpu.parallel.orchestrate import (
    chunk_index_balance,
    chunks,
    chunks_balance,
    run_scenes,
    split_dict,
)
from detectorfreesfm_tpu.sfm.model_select import best_model, model_stats
from detectorfreesfm_tpu.utils.profiler import SimpleProfiler, get_profiler


def test_pair_id_roundtrip():
    for a, b in [(1, 2), (2, 1), (7, 7), (1, 2**20)]:
        pid = image_ids_to_pair_id(a, b)
        lo, hi = min(a, b), max(a, b)
        assert pair_id_to_image_ids(pid) == (lo, hi)


def test_database_roundtrip(tmp_path):
    path = str(tmp_path / "db.db")
    kpts = {"a.png": np.random.rand(10, 2).astype(np.float32) * 100,
            "b.png": np.random.rand(12, 2).astype(np.float32) * 100}
    matches = {("a.png", "b.png"): np.array([[0, 1], [2, 3]], np.int32)}
    export_scene_to_database(
        path, kpts, matches, {"a.png": (640, 480), "b.png": (640, 480)}
    )
    with COLMAPDatabase(path) as db:
        images = db.read_images()
        assert sorted(n for n, _ in images.values()) == ["a.png", "b.png"]
        rk = db.read_keypoints()
        by_name = {images[i][0]: k for i, k in rk.items()}
        # +0.5 COLMAP offset applied; 4 columns
        np.testing.assert_allclose(
            by_name["a.png"][:, :2], kpts["a.png"] + 0.5, atol=1e-5
        )
        rm = db.read_matches()
        assert len(rm) == 1
        m = next(iter(rm.values()))
        np.testing.assert_array_equal(m, [[0, 1], [2, 3]])


def test_aggregate_with_bags():
    per_scene = {
        "sceneA_5bag_x": {"auc@1": 0.5, "auc@3": 0.7},
        "sceneB_5bag_y": {"auc@1": 0.7, "auc@3": 0.9},
        "sceneC_10bag_z": {"auc@1": 0.2, "auc@3": 0.3},
    }
    agg = aggregate_multi_scene_metrics(per_scene, group_bags=True)
    assert abs(agg["all"]["auc@1"] - (0.5 + 0.7 + 0.2) / 3) < 1e-9
    assert abs(agg["5bag"]["auc@1"] - 0.6) < 1e-9
    assert abs(agg["10bag"]["auc@1"] - 0.2) < 1e-9
    report = format_report(agg, per_scene, title="test")
    assert "5bag" in report and "sceneC_10bag_z" in report


def test_chunkers_deterministic():
    assert chunks([1, 2, 3, 4, 5], 2) == [[1, 2], [3, 4], [5]]
    assert chunks_balance([1, 2, 3, 4, 5], 2) == [[1, 3, 5], [2, 4]]
    assert chunk_index_balance(4, 3) == [[0, 3], [1], [2]]
    assert split_dict({"a": 1, "b": 2, "c": 3}, 2) == [{"a": 1, "c": 3}, {"b": 2}]


def test_run_scenes_isolates_failures(capsys):
    def fn(s):
        if s == "bad":
            raise RuntimeError("boom")
        return {"status": "ok", "scene": s}

    res = run_scenes(fn, ["good", "bad", "also_good"])
    assert res["good"]["status"] == "ok"
    assert res["bad"]["status"] == "failed"
    assert res["also_good"]["status"] == "ok"


def test_profiler_scopes():
    prof = SimpleProfiler()
    with prof.record_function("phase_a"):
        x = sum(range(1000))
    with prof.record_function("phase_a"):
        x += sum(range(1000))
    s = prof.summary()
    assert "phase_a" in s
    assert prof.counts["phase_a"] == 2
    assert get_profiler(None).summary() == ""


def test_model_selection():
    from detectorfreesfm_tpu.sfm.reconstruction import Reconstruction, RImage
    from detectorfreesfm_tpu.data.colmap_io import Camera

    def make(n_reg, n_pts):
        rec = Reconstruction()
        for i in range(1, n_reg + 1):
            rec.add_camera(Camera(i, "PINHOLE", 100, 100,
                                  np.array([50.0, 50, 50, 50])))
            rec.add_image(RImage(id=i, name=f"i{i}", camera_id=i,
                                 xys=np.zeros((10, 2))))
            rec.set_pose(i, np.array([1.0, 0, 0, 0]), np.zeros(3))
        for p in range(n_pts):
            rec.add_point(np.zeros(3), [(1, p), (2, p)])
        return rec

    a, b = make(3, 4), make(5, 2)
    assert best_model([a, b, None]) == 1
    st = model_stats(b)
    assert st["n_registered"] == 5 and st["n_points"] == 2


def test_export_ply(tmp_path):
    from test_aux import test_model_selection  # reuse builder inline
    from detectorfreesfm_tpu.sfm.reconstruction import Reconstruction, RImage
    from detectorfreesfm_tpu.data.colmap_io import Camera
    from detectorfreesfm_tpu.utils.vis import export_reconstruction_ply

    rec = Reconstruction()
    rec.add_camera(Camera(1, "PINHOLE", 100, 100, np.array([50.0, 50, 50, 50])))
    rec.add_image(RImage(id=1, name="x", camera_id=1, xys=np.zeros((4, 2))))
    rec.add_image(RImage(id=2, name="y", camera_id=1, xys=np.zeros((4, 2))))
    rec.set_pose(1, np.array([1.0, 0, 0, 0]), np.zeros(3))
    rec.set_pose(2, np.array([1.0, 0, 0, 0]), np.array([1.0, 0, 0]))
    rec.add_point(np.array([0.0, 0, 5]), [(1, 0), (2, 0)])
    p = str(tmp_path / "out.ply")
    export_reconstruction_ply(rec, p)
    data = open(p, "rb").read()
    assert data.startswith(b"ply")
    assert b"element vertex 11" in data  # 1 point + 2 cams x (1 + 4 corners)


def test_geometry_placement_policy(monkeypatch):
    """'auto' keeps batch kernels on the default device, hops the rest to
    CPU on accelerator processes, and honors the BA size hint + overrides
    (round-5 placement policy, core/precision.py)."""
    import contextlib

    from detectorfreesfm_tpu.core import precision as P

    def ctx_is_null(name):
        return isinstance(P._geometry_device_ctx(name), contextlib.nullcontext)

    # On this CPU test process every ctx is null (no hop needed) — exercise
    # the decision logic by faking an accelerator default backend.
    monkeypatch.setattr(P.jax, "default_backend", lambda: "tpu")

    monkeypatch.delenv("DFSFM_GEOMETRY_DEVICE", raising=False)
    assert ctx_is_null("estimate_relative_pose_batch")   # batch -> accel
    assert ctx_is_null("triangulate_dlt")
    assert not ctx_is_null("lm_step")                    # LM -> host
    assert not ctx_is_null("decompose_homography")
    with P.prefer_accelerator_geometry():                # BA size hint
        assert ctx_is_null("lm_step")
    assert not ctx_is_null("lm_step")

    monkeypatch.setenv("DFSFM_GEOMETRY_DEVICE", "accel")
    assert ctx_is_null("lm_step")

    monkeypatch.setenv("DFSFM_GEOMETRY_DEVICE", "cpu")
    assert not ctx_is_null("estimate_relative_pose_batch")
    monkeypatch.setenv("DFSFM_GEOMETRY_ACCEL_ONLY", "lm_step")
    assert ctx_is_null("lm_step")                        # bisection override
    assert not ctx_is_null("triangulate_dlt")
