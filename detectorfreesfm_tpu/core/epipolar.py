"""Epipolar geometry: essential/fundamental matrices, residuals, decomposition.

Pure-jnp, batched, jit-safe. Used by two-view initialization (sfm/ransac.py)
and by training metrics (train/metrics.py), covering the roles of the
reference's cv2-based pose estimation (src/refinement_models/utils/metrics.py)
with TPU-friendly fixed-iteration algorithms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import quat_to_rotmat


def skew(v: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    ).reshape(v.shape[:-1] + (3, 3))


def essential_from_pose(qvec_rel: jax.Array, tvec_rel: jax.Array) -> jax.Array:
    """E = [t]_x R for the relative pose taking frame a to frame b."""
    R = quat_to_rotmat(qvec_rel)
    return skew(tvec_rel) @ R


def fundamental_from_essential(E: jax.Array, K0: jax.Array, K1: jax.Array) -> jax.Array:
    """F = K1^-T E K0^-1."""
    K0i = jnp.linalg.inv(K0)
    K1i = jnp.linalg.inv(K1)
    return jnp.swapaxes(K1i, -1, -2) @ E @ K0i


def _homogeneous(x: jax.Array) -> jax.Array:
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def sampson_distance(F: jax.Array, x0: jax.Array, x1: jax.Array, eps=1e-12) -> jax.Array:
    """First-order geometric epipolar error.

    Args:
      F: (..., 3, 3); x0, x1: (..., N, 2) matched points (x1^T F x0 = 0).
    Returns: (..., N) squared Sampson distance (pixels^2 when F is in pixels).
    """
    p0 = _homogeneous(x0)
    p1 = _homogeneous(x1)
    Fx0 = jnp.einsum("...ij,...nj->...ni", F, p0)
    Ftx1 = jnp.einsum("...ji,...nj->...ni", F, p1)
    num = jnp.einsum("...ni,...ni->...n", p1, Fx0) ** 2
    den = (
        Fx0[..., 0] ** 2 + Fx0[..., 1] ** 2 + Ftx1[..., 0] ** 2 + Ftx1[..., 1] ** 2
    )
    return num / jnp.maximum(den, eps)


def symmetric_epipolar_distance(F, x0, x1, eps=1e-12):
    """Sum of squared point-to-epipolar-line distances in both images,
    matching reference src/refinement_models/utils/metrics.py:9-48."""
    p0 = _homogeneous(x0)
    p1 = _homogeneous(x1)
    Fx0 = jnp.einsum("...ij,...nj->...ni", F, p0)
    Ftx1 = jnp.einsum("...ji,...nj->...ni", F, p1)
    d = jnp.einsum("...ni,...ni->...n", p1, Fx0) ** 2
    return d * (
        1.0 / jnp.maximum(Fx0[..., 0] ** 2 + Fx0[..., 1] ** 2, eps)
        + 1.0 / jnp.maximum(Ftx1[..., 0] ** 2 + Ftx1[..., 1] ** 2, eps)
    )


def decompose_essential(E: jax.Array):
    """E -> 4 candidate (R, t) pairs via SVD (classic result).

    Returns R: (..., 4, 3, 3), t: (..., 4, 3) with unit-norm t.
    """
    U, _, Vt = jnp.linalg.svd(E)
    # Enforce proper rotations
    detU = jnp.linalg.det(U)
    detV = jnp.linalg.det(Vt)
    U = U * jnp.where(detU < 0, -1.0, 1.0)[..., None, None]
    Vt = Vt * jnp.where(detV < 0, -1.0, 1.0)[..., None, None]
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    R = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return R, ts


def triangulate_midpoint_depths(R: jax.Array, t: jax.Array, x0n: jax.Array, x1n: jax.Array, eps=1e-9):
    """Cheap two-view depth solve used for cheirality voting.

    Frame 0 is identity; frame 1 is (R, t) (world==cam0). x0n/x1n are
    normalized image coordinates (..., N, 2). Returns depths (z0, z1) each
    (..., N) via the linear two-ray least squares along bearing directions.
    """
    d0 = _homogeneous(x0n)  # bearing in cam0 frame (world)
    d1 = _homogeneous(x1n)  # bearing in cam1 frame
    # Rotate cam1 bearings into world: d1w = R^T d1; cam1 center c1 = -R^T t
    d1w = jnp.einsum("...ji,...nj->...ni", R, d1)
    c1 = -jnp.einsum("...ji,...j->...i", R, t)[..., None, :]
    # Solve min || z0 d0 - (c1 + z1 d1w) ||^2 for z0, z1 (2x2 normal equations)
    a = jnp.sum(d0 * d0, axis=-1)
    b = -jnp.sum(d0 * d1w, axis=-1)
    c = jnp.sum(d1w * d1w, axis=-1)
    rhs0 = jnp.sum(d0 * c1, axis=-1)
    rhs1 = -jnp.sum(d1w * c1, axis=-1)
    det = a * c - b * b
    det = jnp.where(jnp.abs(det) < eps, eps, det)
    z0 = (c * rhs0 - b * rhs1) / det
    z1w = (a * rhs1 - b * rhs0) / det
    return z0, z1w
