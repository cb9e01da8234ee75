import numpy as np
import jax.numpy as jnp
import pytest

from detectorfreesfm_tpu.core import geometry as G
from detectorfreesfm_tpu.core import epipolar as E
from detectorfreesfm_tpu.core import triangulation as T


def random_rotation(rng, n=()):
    q = rng.normal(size=n + (4,))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q


def test_quat_rotmat_roundtrip():
    rng = np.random.default_rng(0)
    q = random_rotation(rng, (64,))
    R = np.asarray(G.quat_to_rotmat(jnp.asarray(q)))
    # Valid rotations
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), np.tile(np.eye(3), (64, 1, 1)), atol=1e-6)
    q2 = np.asarray(G.rotmat_to_quat(jnp.asarray(R)))
    # Same rotation up to sign (canonicalized w>=0)
    dot = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-6)


def test_rotmat_to_quat_near_pi():
    # 180-degree rotations exercise the degenerate trace branch
    for axis in [(1, 0, 0), (0, 1, 0), (0, 0, 1), (0.6, 0.8, 0.0)]:
        w = np.array(axis) * np.pi
        R = np.asarray(G.so3_exp(jnp.asarray(w)))
        q = np.asarray(G.rotmat_to_quat(jnp.asarray(R)))
        R2 = np.asarray(G.quat_to_rotmat(jnp.asarray(q)))
        np.testing.assert_allclose(R, R2, atol=1e-5)


def test_se3_compose_inverse():
    rng = np.random.default_rng(1)
    q = random_rotation(rng, (8,))
    t = rng.normal(size=(8, 3))
    qi, ti = G.se3_inverse(jnp.asarray(q), jnp.asarray(t))
    qc, tc = G.se3_compose(jnp.asarray(q), jnp.asarray(t), qi, ti)
    np.testing.assert_allclose(np.abs(np.asarray(qc)[:, 0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-6)


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(32, 3))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0, 3.0, (32, 1))
    R = G.so3_exp(jnp.asarray(w))
    w2 = np.asarray(G.so3_log(R))
    np.testing.assert_allclose(w, w2, atol=1e-4)


def test_project_unproject_roundtrip():
    rng = np.random.default_rng(3)
    q = random_rotation(rng, ())
    t = rng.normal(size=(3,))
    K = np.array([[500.0, 0, 320], [0, 480.0, 240], [0, 0, 1]])
    pts_c = np.concatenate([rng.normal(size=(50, 2)), rng.uniform(2, 10, (50, 1))], axis=-1)
    # world points from camera points
    qi, ti = G.se3_inverse(jnp.asarray(q), jnp.asarray(t))
    pts_w = np.asarray(G.se3_apply(qi, ti, jnp.asarray(pts_c)))
    uv, depth = G.project(jnp.asarray(pts_w), jnp.asarray(q), jnp.asarray(t), jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(depth), pts_c[:, 2], atol=1e-5)
    back = np.asarray(G.unproject(uv, depth, jnp.asarray(K)))
    np.testing.assert_allclose(back, pts_c, atol=1e-4)


def test_essential_epipolar_constraint():
    rng = np.random.default_rng(4)
    q0, q1 = random_rotation(rng), random_rotation(rng)
    t0, t1 = rng.normal(size=3), rng.normal(size=3)
    K = np.array([[600.0, 0, 300], [0, 600.0, 250], [0, 0, 1]])
    pts_w = rng.normal(size=(40, 3)) * 2 + np.array([0, 0, 8.0])
    uv0, _ = G.project(jnp.asarray(pts_w), jnp.asarray(q0), jnp.asarray(t0), jnp.asarray(K))
    uv1, _ = G.project(jnp.asarray(pts_w), jnp.asarray(q1), jnp.asarray(t1), jnp.asarray(K))
    q_rel, t_rel = G.relative_pose(jnp.asarray(q0), jnp.asarray(t0), jnp.asarray(q1), jnp.asarray(t1))
    Em = E.essential_from_pose(q_rel, t_rel)
    F = E.fundamental_from_essential(Em, jnp.asarray(K), jnp.asarray(K))
    d = np.asarray(E.sampson_distance(F, uv0, uv1))
    np.testing.assert_allclose(d, 0.0, atol=1e-4)
    d_sym = np.asarray(E.symmetric_epipolar_distance(F, uv0, uv1))
    np.testing.assert_allclose(d_sym, 0.0, atol=1e-3)


def test_decompose_essential_recovers_pose():
    rng = np.random.default_rng(5)
    q_rel = random_rotation(rng)
    t_rel = rng.normal(size=3)
    t_rel /= np.linalg.norm(t_rel)
    Em = np.asarray(E.essential_from_pose(jnp.asarray(q_rel), jnp.asarray(t_rel)))
    R_cands, t_cands = E.decompose_essential(jnp.asarray(Em))
    R_true = np.asarray(G.quat_to_rotmat(jnp.asarray(q_rel)))
    errs_R = [np.abs(np.asarray(R_cands)[i] - R_true).max() for i in range(4)]
    errs_t = [min(np.abs(np.asarray(t_cands)[i] - t_rel).max(),
                  np.abs(np.asarray(t_cands)[i] + t_rel).max()) for i in range(4)]
    assert min(errs_R) < 1e-5
    assert min(errs_t) < 1e-5


def test_triangulate_dlt_masked():
    rng = np.random.default_rng(6)
    n_views, n_pts = 6, 30
    K = np.array([[700.0, 0, 400], [0, 700.0, 300], [0, 0, 1]])
    qs = random_rotation(rng, (n_views,)) * 0.1 + np.array([1.0, 0, 0, 0])
    qs /= np.linalg.norm(qs, axis=-1, keepdims=True)
    ts = rng.normal(size=(n_views, 3)) * 0.5
    pts_w = rng.normal(size=(n_pts, 3)) + np.array([0, 0, 10.0])
    P = np.asarray(T.projection_matrices(jnp.asarray(qs), jnp.asarray(ts), jnp.asarray(np.tile(K, (n_views, 1, 1)))))
    uv = np.stack([
        np.asarray(G.project(jnp.asarray(pts_w), jnp.asarray(qs[v]), jnp.asarray(ts[v]), jnp.asarray(K))[0])
        for v in range(n_views)
    ], axis=1)  # (n_pts, V, 2)
    mask = np.ones((n_pts, n_views), dtype=bool)
    mask[:, 4:] = False  # only first 4 views valid; garbage in the rest
    uv_noisy = uv.copy()
    uv_noisy[:, 4:] = 1e6
    X, ok = T.triangulate_dlt(jnp.asarray(np.tile(P, (n_pts, 1, 1, 1))), jnp.asarray(uv_noisy), jnp.asarray(mask))
    assert np.asarray(ok).all()
    np.testing.assert_allclose(np.asarray(X), pts_w, atol=1e-3)
    err, depth = T.reprojection_errors(X, jnp.asarray(np.tile(P, (n_pts, 1, 1, 1))), jnp.asarray(uv))
    assert np.asarray(err)[:, :4].max() < 0.1
    assert (np.asarray(depth)[:, :4] > 0).all()


def test_np_quat_helpers_match_jax():
    """Host-loop numpy quat<->R must agree with the jitted versions to f32
    eps (they replaced eager jnp calls in mapper/BA/refine host code)."""
    rng = np.random.default_rng(5)
    q = rng.normal(size=(64, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R_np = G.np_quat_to_rotmat(q)
    R_jx = np.asarray(G.quat_to_rotmat(jnp.asarray(q, jnp.float64)))
    np.testing.assert_allclose(R_np, R_jx, atol=1e-6)
    q_np = G.np_rotmat_to_quat(R_np)
    q_jx = np.asarray(G.rotmat_to_quat(jnp.asarray(R_np, jnp.float64)))
    # quaternion double cover: compare up to sign
    sign = np.sign(np.sum(q_np * q_jx, axis=-1, keepdims=True))
    np.testing.assert_allclose(q_np * sign, q_jx, atol=1e-6)
    # roundtrip to the original (up to sign)
    sign0 = np.sign(np.sum(q_np * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q_np * sign0, q, atol=1e-6)
