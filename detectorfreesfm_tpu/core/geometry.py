"""Core geometry: quaternions, SE(3), camera models, projection.

Conventions (COLMAP-compatible, see reference
src/utils/colmap/read_write_model.py:453-476 for the qvec layout):
  * Quaternions are (w, x, y, z), unit norm.
  * A pose (qvec, tvec) is world-to-camera:  x_cam = R(qvec) @ x_world + tvec.
  * Pixel coordinates follow COLMAP: the center of the top-left pixel is
    (0.5, 0.5).

Everything here is pure jnp, shape-polymorphic over leading batch dims, and
safe to use inside jit / shard_map / Pallas-adjacent code (no Python branching
on traced values).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions
# ---------------------------------------------------------------------------


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize to unit quaternion, keeping w >= 0 for canonical form."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)
    sign = jnp.where(q[..., :1] < 0.0, -1.0, 1.0)
    return q * sign


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b, both (..., 4) in (w, x, y, z)."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def np_quat_to_rotmat(q: "np.ndarray") -> "np.ndarray":
    """Pure-numpy (..., 4) wxyz -> (..., 3, 3): for HOST loops (mapper
    bookkeeping, COLMAP export). Eager JAX dispatch costs ~ms per call; host
    code calling quat_to_rotmat per image/observation dominated mapper wall
    time at scale. Same formula as quat_to_rotmat."""
    import numpy as np

    q = q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-15)
    w, x, y, z = np.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    r = np.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def np_rotmat_to_quat(R: "np.ndarray") -> "np.ndarray":
    """Pure-numpy (..., 3, 3) -> (..., 4) wxyz, for HOST loops (same
    branch-free Shepperd method as rotmat_to_quat; see np_quat_to_rotmat for
    why host code must not dispatch eager jnp)."""
    import numpy as np

    m00, m11, m22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    m01, m02, m10, m12, m20, m21 = (
        R[..., 0, 1], R[..., 0, 2], R[..., 1, 0],
        R[..., 1, 2], R[..., 2, 0], R[..., 2, 1],
    )
    tr = m00 + m11 + m22
    s = lambda x: np.sqrt(np.maximum(x, 1e-24))
    s0 = s(1.0 + tr)
    s1 = s(1.0 + m00 - m11 - m22)
    s2 = s(1.0 - m00 + m11 - m22)
    s3 = s(1.0 - m00 - m11 + m22)
    cands = np.stack([
        np.stack([s0 * s0, m21 - m12, m02 - m20, m10 - m01], axis=-1),
        np.stack([m21 - m12, s1 * s1, m01 + m10, m02 + m20], axis=-1),
        np.stack([m02 - m20, m01 + m10, s2 * s2, m12 + m21], axis=-1),
        np.stack([m10 - m01, m02 + m20, m12 + m21, s3 * s3], axis=-1),
    ], axis=-2)
    scores = np.stack([tr, m00, m11, m22], axis=-1)
    idx = np.argmax(scores, axis=-1)
    q = np.take_along_axis(cands, idx[..., None, None], axis=-2)[..., 0, :]
    return q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-15)


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    r = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def rotmat_to_quat(R: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz quaternion.

    Branch-free Shepperd's method: compute all four candidate quaternions and
    select the one seeded from the largest diagonal combination (numerically
    stable for any rotation, jit-safe).
    """
    m00 = R[..., 0, 0]
    m11 = R[..., 1, 1]
    m22 = R[..., 2, 2]
    m01, m02, m10, m12, m20, m21 = (
        R[..., 0, 1], R[..., 0, 2], R[..., 1, 0],
        R[..., 1, 2], R[..., 2, 0], R[..., 2, 1],
    )
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-24))

    # Candidate 0: seed w
    s0 = safe_sqrt(1.0 + tr)
    q0 = jnp.stack([s0 * s0, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    # Candidate 1: seed x
    s1 = safe_sqrt(1.0 + m00 - m11 - m22)
    q1 = jnp.stack([m21 - m12, s1 * s1, m01 + m10, m02 + m20], axis=-1)
    # Candidate 2: seed y
    s2 = safe_sqrt(1.0 - m00 + m11 - m22)
    q2 = jnp.stack([m02 - m20, m01 + m10, s2 * s2, m12 + m21], axis=-1)
    # Candidate 3: seed z
    s3 = safe_sqrt(1.0 - m00 - m11 + m22)
    q3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, s3 * s3], axis=-1)

    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4cand, 4)
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# SE(3) as (qvec, tvec) pairs
# ---------------------------------------------------------------------------


def se3_apply(qvec: jax.Array, tvec: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply world-to-camera transform to (..., N, 3) points."""
    R = quat_to_rotmat(qvec)
    return jnp.einsum("...ij,...nj->...ni", R, pts) + tvec[..., None, :]


def se3_inverse(qvec: jax.Array, tvec: jax.Array):
    """Inverse transform: returns (qvec_inv, tvec_inv)."""
    q_inv = quat_conjugate(quat_normalize(qvec))
    R_inv = quat_to_rotmat(q_inv)
    t_inv = -jnp.einsum("...ij,...j->...i", R_inv, tvec)
    return q_inv, t_inv


def se3_compose(qa: jax.Array, ta: jax.Array, qb: jax.Array, tb: jax.Array):
    """Compose: (qa, ta) ∘ (qb, tb), i.e. apply b first then a."""
    q = quat_multiply(qa, qb)
    Ra = quat_to_rotmat(qa)
    t = jnp.einsum("...ij,...j->...i", Ra, tb) + ta
    return quat_normalize(q), t


def camera_center(qvec: jax.Array, tvec: jax.Array) -> jax.Array:
    """Camera center in world coordinates: C = -R^T t."""
    R = quat_to_rotmat(qvec)
    return -jnp.einsum("...ji,...j->...i", R, tvec)


# --- so(3) exp / log (used by BA parameterization) -------------------------


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation matrix.

    Written on the *unnormalized* skew matrix W with Taylor fallbacks near
    θ=0 so it is differentiable everywhere (BA/PnP take jacfwd at w=0; a
    norm-based formulation has a NaN gradient at the origin). The unselected
    jnp.where branch is evaluated with a substituted safe θ, keeping forward-
    mode tangents finite.
    """
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    small = theta2 < 1e-8
    theta2_safe = jnp.where(small, jnp.ones_like(theta2), theta2)
    theta_safe = jnp.sqrt(theta2_safe)
    A = jnp.where(
        small, 1.0 - theta2 / 6.0, jnp.sin(theta_safe) / theta_safe
    )
    B = jnp.where(
        small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta_safe)) / theta2_safe
    )
    wx, wy, wz = jnp.moveaxis(w, -1, 0)
    zero = jnp.zeros_like(wx)
    W = jnp.stack(
        [zero, -wz, wy, wz, zero, -wx, -wy, wx, zero], axis=-1
    ).reshape(w.shape[:-1] + (3, 3))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A * W + B * (W @ W)


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix -> axis-angle (..., 3)."""
    tr = jnp.clip((R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2] - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(tr)
    w_raw = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = jnp.sin(theta)
    # theta / (2 sin theta), Taylor near 0; near pi fall back to quaternion log
    scale = jnp.where(
        theta < 1e-6,
        0.5 + theta * theta / 12.0,
        theta / jnp.maximum(2.0 * sin_theta, 1e-12),
    )
    w = w_raw * scale[..., None]
    # Near pi the anti-symmetric part vanishes; use quaternion route instead.
    q = rotmat_to_quat(R)
    qv = q[..., 1:]
    qn = jnp.linalg.norm(qv, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(qn[..., 0], q[..., 0])
    w_quat = qv / jnp.maximum(qn, 1e-12) * angle[..., None]
    return jnp.where((theta > 3.0)[..., None], w_quat, w)


# ---------------------------------------------------------------------------
# Camera models & projection
# ---------------------------------------------------------------------------

# COLMAP camera model ids (format spec, mirrored by reference
# src/utils/colmap/read_write_model.py:31-47):
SIMPLE_PINHOLE = 0  # f, cx, cy
PINHOLE = 1         # fx, fy, cx, cy
SIMPLE_RADIAL = 2   # f, cx, cy, k
RADIAL = 3          # f, cx, cy, k1, k2
OPENCV = 4          # fx, fy, cx, cy, k1, k2, p1, p2

CAMERA_MODEL_NUM_PARAMS = {
    0: 3, 1: 4, 2: 4, 3: 5, 4: 8, 5: 8, 6: 12, 7: 5, 8: 4, 9: 5, 10: 12,
}
CAMERA_MODEL_NAMES = {
    0: "SIMPLE_PINHOLE", 1: "PINHOLE", 2: "SIMPLE_RADIAL", 3: "RADIAL",
    4: "OPENCV", 5: "OPENCV_FISHEYE", 6: "FULL_OPENCV", 7: "FOV",
    8: "SIMPLE_RADIAL_FISHEYE", 9: "RADIAL_FISHEYE", 10: "THIN_PRISM_FISHEYE",
}
CAMERA_MODEL_IDS = {v: k for k, v in CAMERA_MODEL_NAMES.items()}


def intrinsics_to_K(fx, fy, cx, cy) -> jax.Array:
    """Build (..., 3, 3) K from focal/principal-point arrays."""
    fx, fy, cx, cy = jnp.broadcast_arrays(
        jnp.asarray(fx), jnp.asarray(fy), jnp.asarray(cx), jnp.asarray(cy)
    )
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    K = jnp.stack(
        [fx, zero, cx, zero, fy, cy, zero, zero, one], axis=-1
    ).reshape(fx.shape + (3, 3))
    return K


def project(
    pts_w: jax.Array, qvec: jax.Array, tvec: jax.Array, K: jax.Array,
    eps: float = 1e-8,
):
    """Project world points into a pinhole camera.

    Args:
      pts_w: (..., N, 3) world points.
      qvec/tvec: (..., 4) / (..., 3) world-to-camera pose.
      K: (..., 3, 3) intrinsics.
    Returns:
      uv: (..., N, 2) pixel coordinates; depth: (..., N).
    """
    pts_c = se3_apply(qvec, tvec, pts_w)
    depth = pts_c[..., 2]
    z = jnp.where(jnp.abs(depth) < eps, jnp.where(depth < 0, -eps, eps), depth)
    xy = pts_c[..., :2] / z[..., None]
    fx = K[..., 0, 0][..., None]
    fy = K[..., 1, 1][..., None]
    cx = K[..., 0, 2][..., None]
    cy = K[..., 1, 2][..., None]
    uv = jnp.stack([xy[..., 0] * fx + cx, xy[..., 1] * fy + cy], axis=-1)
    return uv, depth


def unproject(uv: jax.Array, depth: jax.Array, K: jax.Array) -> jax.Array:
    """Pixel + depth -> camera-frame 3D points. uv (..., N, 2), depth (..., N)."""
    fx = K[..., 0, 0][..., None]
    fy = K[..., 1, 1][..., None]
    cx = K[..., 0, 2][..., None]
    cy = K[..., 1, 2][..., None]
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    return jnp.stack([x * depth, y * depth, depth], axis=-1)


def relative_pose(qa, ta, qb, tb):
    """Relative pose taking camera-a frame to camera-b frame: T_ba = T_b ∘ T_a^-1."""
    qai, tai = se3_inverse(qa, ta)
    return se3_compose(qb, tb, qai, tai)


def rotation_angle_deg(R: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Geodesic rotation angle of (..., 3, 3) in degrees."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0 + eps, 1.0 - eps)
    return jnp.degrees(jnp.arccos(cos))


def translation_angle_deg(t_a: jax.Array, t_b: jax.Array, eps: float = 1e-10) -> jax.Array:
    """Angle between translation directions in degrees, sign-invariant
    (matches the pairwise-pose protocol of reference
    src/utils/metric_utils.py:60-77)."""
    na = jnp.linalg.norm(t_a, axis=-1)
    nb = jnp.linalg.norm(t_b, axis=-1)
    cos = jnp.sum(t_a * t_b, axis=-1) / jnp.maximum(na * nb, eps)
    cos = jnp.clip(jnp.abs(cos), 0.0, 1.0 - 1e-7)
    ang = jnp.degrees(jnp.arccos(cos))
    # Degenerate (near-zero) translations compare as 0 error only vs themselves
    both_zero = jnp.logical_and(na < eps, nb < eps)
    return jnp.where(both_zero, 0.0, ang)


# -- radial distortion (SIMPLE_RADIAL, COLMAP model id 2) ---------------------
# The reference's default camera model for ETH3D SfM is SIMPLE_RADIAL
# (hydra_configs/eth3d_sfm/dfsfm.yaml:94) and its refinement dataset handles
# it explicitly (src/post_optimization/utils/geometry_utils.py:30). Forward
# model on NORMALIZED coords: x_d = x_u * (1 + k1 * r_u^2).


def np_radial_distort(xn: "np.ndarray", k1: float) -> "np.ndarray":
    """Distort normalized coords (..., 2): x_d = x_u (1 + k1 |x_u|^2)."""
    import numpy as np

    r2 = np.sum(xn * xn, axis=-1, keepdims=True)
    return xn * (1.0 + k1 * r2)


def np_radial_undistort(xd: "np.ndarray", k1: float,
                        iters: int = 10) -> "np.ndarray":
    """Invert the SIMPLE_RADIAL model by fixed-point iteration
    x <- x_d / (1 + k1 |x|^2) (COLMAP IterativeUndistortion equivalent;
    converges in a handful of iterations for |k1 r^2| < 0.5)."""
    import numpy as np

    if k1 == 0.0:
        return xd
    x = xd.copy()
    for _ in range(iters):
        r2 = np.sum(x * x, axis=-1, keepdims=True)
        x = xd / (1.0 + k1 * r2)
    return x


def np_undistort_pixels(uv: "np.ndarray", K: "np.ndarray",
                        k1: float) -> "np.ndarray":
    """Undistort pixel observations through K (pinhole uv out)."""
    import numpy as np

    if k1 == 0.0:
        return uv
    f = np.array([K[0, 0], K[1, 1]])
    c = np.array([K[0, 2], K[1, 2]])
    xu = np_radial_undistort((uv - c) / f, k1)
    return xu * f + c


def np_distort_pixels(uv: "np.ndarray", K: "np.ndarray",
                      k1: float) -> "np.ndarray":
    """Distort ideal pinhole pixels through K (observed-space uv out)."""
    import numpy as np

    if k1 == 0.0:
        return uv
    f = np.array([K[0, 0], K[1, 1]])
    c = np.array([K[0, 2], K[1, 2]])
    xd = np_radial_distort((uv - c) / f, k1)
    return xd * f + c
