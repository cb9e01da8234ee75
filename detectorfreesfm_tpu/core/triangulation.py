"""Multi-view triangulation (DLT) with masked-view support.

TPU-first design: all tracks are triangulated in one batched, fixed-shape
call — tracks shorter than the max view count are padded and masked, so the
whole scene's triangulation is a single einsum + batched 4x4 eigendecomposition
instead of the reference's per-point C++ loop inside COLMAP's
point_triangulator (SURVEY.md §2.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .geometry import quat_to_rotmat


def projection_matrices(qvec: jax.Array, tvec: jax.Array, K: jax.Array) -> jax.Array:
    """(..., 4)/(..., 3)/(..., 3, 3) -> (..., 3, 4) P = K [R | t]."""
    R = quat_to_rotmat(qvec)
    Rt = jnp.concatenate([R, tvec[..., :, None]], axis=-1)
    return K @ Rt


from .precision import geometry_jit


# jit is load-bearing: mapper host code calls this dozens of times per scene;
# unjitted it dispatches each op eagerly (one XLA mini-compile per op/shape).
@geometry_jit(static_argnames=("eps",))
def triangulate_dlt(
    P: jax.Array, uv: jax.Array, mask: jax.Array | None = None, eps: float = 1e-12
):
    """Batched DLT triangulation.

    Args:
      P:    (..., V, 3, 4) per-view projection matrices.
      uv:   (..., V, 2) observed pixels per view.
      mask: (..., V) bool/float validity; padded views contribute zero rows.

    Returns:
      X: (..., 3) triangulated world points.
      ok: (..., ) bool — smallest eigenvalue is isolated & solution finite.

    Solves min ||A x||, x in P^3, by eigen-decomposing the 4x4 normal matrix
    A^T A (cheaper and static-shape-friendlier on TPU than an SVD over the
    (2V, 4) stacked system; V only enters via one einsum).
    """
    # Rows: u * P[2] - P[0],  v * P[2] - P[1]
    u = uv[..., 0:1]
    v = uv[..., 1:2]
    r0 = u * P[..., 2, :] - P[..., 0, :]  # (..., V, 4)
    r1 = v * P[..., 2, :] - P[..., 1, :]
    A = jnp.concatenate([r0, r1], axis=-2)  # (..., 2V, 4)
    if mask is not None:
        m = jnp.concatenate([mask, mask], axis=-1).astype(A.dtype)[..., None]
        A = A * m
    # Row normalization improves conditioning for large pixel coords.
    norm = jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), eps)
    A = A / norm
    AtA = jnp.einsum("...vi,...vj->...ij", A, A)
    w, V4 = jnp.linalg.eigh(AtA)
    x_h = V4[..., :, 0]  # eigenvector of smallest eigenvalue
    wd = x_h[..., 3]
    w_safe = jnp.where(jnp.abs(wd) < eps, jnp.where(wd < 0, -eps, eps), wd)
    X = x_h[..., :3] / w_safe[..., None]
    ok = jnp.isfinite(X).all(axis=-1) & (jnp.abs(wd) > eps)
    return X, ok


def reprojection_errors(
    X: jax.Array, P: jax.Array, uv: jax.Array, eps: float = 1e-8
):
    """Pixel reprojection error per view.

    X: (..., 3); P: (..., V, 3, 4); uv: (..., V, 2).
    Returns err: (..., V) L2 pixel error, depth: (..., V).
    """
    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)
    proj = jnp.einsum("...vij,...j->...vi", P, Xh)
    z = proj[..., 2]
    z_safe = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    xy = proj[..., :2] / z_safe[..., None]
    err = jnp.linalg.norm(xy - uv, axis=-1)
    return err, z


def triangulation_angles_deg(X: jax.Array, centers: jax.Array, mask=None):
    """Max pairwise triangulation angle per point.

    X: (..., 3) points; centers: (..., V, 3) camera centers.
    Returns (..., ) max angle over valid view pairs, degrees.
    """
    rays = centers - X[..., None, :]
    rays = rays / jnp.maximum(jnp.linalg.norm(rays, axis=-1, keepdims=True), 1e-12)
    cos = jnp.einsum("...vi,...wi->...vw", rays, rays)
    if mask is not None:
        m = mask[..., :, None] & mask[..., None, :]
        cos = jnp.where(m, cos, 1.0)
    v = cos.shape[-1]
    eye = jnp.eye(v, dtype=bool)
    cos = jnp.where(eye, 1.0, cos)
    ang = jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))
    return jnp.max(ang, axis=(-2, -1))
