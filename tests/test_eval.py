import numpy as np
import jax.numpy as jnp

from detectorfreesfm_tpu.eval import pose_auc as PA
from detectorfreesfm_tpu.eval import pointcloud as PC
from detectorfreesfm_tpu.core import geometry as G


def test_pose_auc_perfect_and_empty():
    assert PA.pose_auc(np.zeros(10), [1, 5]) == [1.0, 1.0]
    aucs = PA.pose_auc(np.full(10, np.inf), [1, 5])
    assert aucs == [0.0, 0.0]


def test_pose_auc_monotone():
    errs = np.array([0.5, 1.5, 2.5, 4.0, 8.0, np.inf])
    a1, a5, a10 = PA.pose_auc(errs, [1, 5, 10])
    assert 0 < a1 < a5 < a10 < 1


def test_evaluate_poses_identity():
    rng = np.random.default_rng(0)
    gt = {}
    for i in range(5):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        gt[f"im{i}"] = (q, rng.normal(size=3))
    res = PA.evaluate_poses(gt, gt)
    assert res["auc@1"] > 0.999
    assert res["n_registered"] == 5
    assert res["n_pairs"] == 10


def _np_q2r(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def test_evaluate_poses_gauge_invariance():
    # Estimated poses in a different global frame must still score perfectly
    rng = np.random.default_rng(1)
    gt, est = {}, {}
    qg = rng.normal(size=4); qg /= np.linalg.norm(qg)
    tg = rng.normal(size=3)
    Rg = _np_q2r(qg)
    for i in range(4):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        t = rng.normal(size=3)
        gt[f"im{i}"] = (q, t)
        # compose in float64: T_est = T ∘ T_gauge
        R = _np_q2r(q)
        Rc = R @ Rg
        tc = R @ tg + t
        # rotmat -> quat via trace method (w>0 branch adequate for random data)
        w = np.sqrt(max(1 + np.trace(Rc), 1e-12)) / 2
        qc = np.array([
            w,
            (Rc[2, 1] - Rc[1, 2]) / (4 * w),
            (Rc[0, 2] - Rc[2, 0]) / (4 * w),
            (Rc[1, 0] - Rc[0, 1]) / (4 * w),
        ])
        est[f"im{i}"] = (qc, tc)
    res = PA.evaluate_poses(est, gt)
    assert res["auc@1"] > 0.99


def test_evaluate_poses_unregistered_penalty():
    rng = np.random.default_rng(2)
    gt = {}
    for i in range(4):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        gt[f"im{i}"] = (q, rng.normal(size=3))
    est = {k: gt[k] for k in list(gt)[:2]}  # half unregistered
    res = PA.evaluate_poses(est, gt)
    # only 1 of 6 pairs valid
    assert res["auc@20"] < 0.2


def test_pointcloud_metrics():
    rng = np.random.default_rng(3)
    gt = rng.uniform(0, 1, size=(500, 3))
    rec = gt[:250] + rng.normal(scale=0.001, size=(250, 3))
    out = PC.accuracy_completeness(rec, gt, tolerances=(0.01, 0.05))
    assert out["accuracy@0.01"] > 0.95
    assert 0.3 < out["completeness@0.01"] < 0.9
    # far-away junk lowers accuracy
    rec_bad = np.concatenate([rec, rng.uniform(10, 11, size=(250, 3))])
    out2 = PC.accuracy_completeness(rec_bad, gt, tolerances=(0.01,))
    assert out2["accuracy@0.01"] < 0.6
