"""Absolute pose (PnP) via batched DLT RANSAC + Gauss-Newton polish.

Replaces COLMAP's P3P/EPnP RANSAC absolute-pose registration (reference
mapper thresholds `abs_pose_max_error`, hydra_configs/eth3d_sfm/dfsfm.yaml:105).
TPU-first shape discipline as in twoview.py: fixed hypothesis count, padded
correspondence arrays, no data-dependent control flow.

Minimal sample is 6 (DLT) rather than 3 (P3P): quartic root-finding doesn't
map to TPU-friendly batched linear algebra, while the 12x12 DLT normal
eigendecomposition does; detector-free SfM feeds PnP hundreds-to-thousands of
verified 2D-3D correspondences with high inlier ratios, where the larger
sample costs a negligible number of extra hypotheses.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.geometry import quat_to_rotmat, rotmat_to_quat, so3_exp
from ..core.precision import with_highest_matmul_precision


class PnPResult(NamedTuple):
    qvec: jax.Array       # (4,) world->cam
    tvec: jax.Array       # (3,)
    inliers: jax.Array    # (N,) bool
    n_inliers: jax.Array  # () int32


def _dlt_pose(X: jax.Array, x: jax.Array, w: jax.Array):
    """Weighted DLT: (..., N, 3) world pts + (..., N, 2) normalized image
    coords -> (..., 3, 3) R, (..., 3) t (projected to SO(3))."""
    ones = jnp.ones_like(X[..., :1])
    Xh = jnp.concatenate([X, ones], axis=-1)  # (..., N, 4)
    zeros = jnp.zeros_like(Xh)
    # Rows: [X 0 -u X ; 0 X -v X] for P = [R|t] (normalized camera)
    r1 = jnp.concatenate([Xh, zeros, -x[..., 0:1] * Xh], axis=-1)  # (..., N, 12)
    r2 = jnp.concatenate([zeros, Xh, -x[..., 1:2] * Xh], axis=-1)
    A = jnp.concatenate([r1 * w[..., None], r2 * w[..., None]], axis=-2)
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    p = vecs[..., :, 0].reshape(*X.shape[:-2], 3, 4)
    # Resolve the overall sign so det(M) > 0: the true P = s[R|t] (s > 0,
    # points in front) has det(M) = s^3 > 0; the mirrored -P has det < 0.
    sign = jnp.sign(jnp.linalg.det(p[..., :3]))
    sign = jnp.where(sign == 0.0, 1.0, sign)
    p = p * sign[..., None, None]
    R_raw, t_raw = p[..., :3], p[..., 3]
    # Project M onto SO(3); det(M) > 0 makes det(U) det(Vt) = +1, so U Vt is
    # a proper rotation and the scale is the mean singular value.
    U, S, Vt = jnp.linalg.svd(R_raw)
    R = U @ Vt
    scale = jnp.sum(S, axis=-1) / 3.0
    t = t_raw / jnp.maximum(scale[..., None], 1e-12)
    return R, t


def _reproj_err2(R, t, X, x):
    """Squared reprojection error in normalized coords; behind-camera points
    get +inf. R (..., 3, 3), t (..., 3), X/x (..., N, 3/2) -> (..., N)."""
    Xc = jnp.einsum("...ij,...nj->...ni", R, X) + t[..., None, :]
    z = Xc[..., 2]
    uv = Xc[..., :2] / jnp.where(jnp.abs(z[..., None]) < 1e-12, 1e-12, z[..., None])
    err = jnp.sum((uv - x) ** 2, axis=-1)
    return jnp.where(z > 1e-6, err, jnp.inf)


def _gauss_newton_pose(R, t, X, x, w, iters: int = 10):
    """Masked Gauss-Newton on the 6-dof pose (so3 ⊕ R^3), normalized coords."""

    def residual(params, Xn, xn):
        dw, dt = params[:3], params[3:]
        Rc = so3_exp(dw) @ R
        tc = t + dt
        Xc = Xn @ Rc.T + tc
        z = jnp.where(jnp.abs(Xc[..., 2:]) < 1e-9, 1e-9, Xc[..., 2:])
        return ((Xc[..., :2] / z) - xn).reshape(-1)

    params = jnp.zeros((6,), X.dtype)
    ww = jnp.repeat(w, 2)

    def step(_, params):
        J = jax.jacfwd(residual)(params, X, x)       # (2N, 6)
        r = residual(params, X, x)
        JtJ = (J * ww[:, None]).T @ J + 1e-8 * jnp.eye(6, dtype=X.dtype)
        Jtr = (J * ww[:, None]).T @ r
        return params - jnp.linalg.solve(JtJ, Jtr)

    params = jax.lax.fori_loop(0, iters, step, params)
    return so3_exp(params[:3]) @ R, t + params[3:]



@functools.partial(jax.jit, static_argnames=("n_hypotheses",))
@with_highest_matmul_precision
def estimate_absolute_pose(
    X: jax.Array,       # (N, 3) world points (padded)
    x: jax.Array,       # (N, 2) normalized image coords
    mask: jax.Array,    # (N,) bool
    rng: jax.Array,
    threshold: float,   # reprojection threshold (normalized coords)
    n_hypotheses: int = 256,
) -> PnPResult:
    n = X.shape[0]
    gumbel = jax.random.gumbel(rng, (n_hypotheses, n))
    scores = jnp.where(mask[None, :], gumbel, -jnp.inf)
    _, idx = jax.lax.top_k(scores, 6)
    R_h, t_h = _dlt_pose(X[idx], x[idx], jnp.ones(idx.shape, X.dtype))
    err = _reproj_err2(R_h, t_h, X[None], x[None])

    # LO-RANSAC-style annealed local optimization (COLMAP pairs its P3P
    # hypotheses with local optimization; a 6-pt DLT hypothesis from
    # grid-quantized detector-free correspondences is noisy enough that the
    # raw max-consensus at the final threshold is often near-empty even when
    # a consistent pose exists). Hypotheses are scored at 3x the threshold,
    # the best is Gauss-Newton-polished on that wide consensus, then the
    # polish-and-recount repeats at 1.5x and 1x. Each round can only keep or
    # grow the final-threshold count vs the raw-best hypothesis.
    inl_wide = (err < (3.0 * threshold) ** 2) & mask[None, :]
    counts_wide = jnp.sum(inl_wide.astype(jnp.int32), axis=1)
    best = jnp.argmax(counts_wide)
    R_cur, t_cur = R_h[best], t_h[best]

    for factor in (3.0, 1.5, 1.0):
        err_cur = _reproj_err2(R_cur, t_cur, X, x)
        w = ((err_cur < (factor * threshold) ** 2) & mask).astype(X.dtype)
        R_try, t_try = _gauss_newton_pose(R_cur, t_cur, X, x, w)
        # Keep the polish only if it does not lose final-threshold inliers
        n_cur = jnp.sum((_reproj_err2(R_cur, t_cur, X, x) < threshold**2)
                        & mask)
        n_try = jnp.sum((_reproj_err2(R_try, t_try, X, x) < threshold**2)
                        & mask)
        keep = n_try >= n_cur
        R_cur = jnp.where(keep, R_try, R_cur)
        t_cur = jnp.where(keep, t_try, t_cur)

    # Also compare against the best raw hypothesis at the final threshold
    inl_raw = (err < threshold**2) & mask[None, :]
    counts_raw = jnp.sum(inl_raw.astype(jnp.int32), axis=1)
    best_raw = jnp.argmax(counts_raw)
    err_lo = _reproj_err2(R_cur, t_cur, X, x)
    inl_lo = (err_lo < threshold**2) & mask
    use_lo = jnp.sum(inl_lo) >= counts_raw[best_raw]
    R_fin = jnp.where(use_lo, R_cur, R_h[best_raw])
    t_fin = jnp.where(use_lo, t_cur, t_h[best_raw])
    inliers = jnp.where(use_lo, inl_lo, inl_raw[best_raw])
    return PnPResult(
        qvec=rotmat_to_quat(R_fin),
        tvec=t_fin,
        inliers=inliers,
        n_inliers=jnp.sum(inliers.astype(jnp.int32)),
    )


@functools.partial(jax.jit, static_argnames=("n_hypotheses",))
@with_highest_matmul_precision
def estimate_absolute_pose_batch(
    X: jax.Array,           # (B, N, 3)
    x: jax.Array,           # (B, N, 2)
    mask: jax.Array,        # (B, N)
    rngs: jax.Array,        # (B, 2)
    thresholds: jax.Array,  # (B,)
    n_hypotheses: int = 256,
) -> PnPResult:
    """vmapped PnP-RANSAC — one program for a batch of registration
    attempts (e.g. the mapper's per-registration focal-factor search, the
    analogue of COLMAP's focal-length refinement during absolute pose
    estimation for cameras without trusted intrinsics)."""
    return jax.vmap(
        lambda a, b, m, r, t: estimate_absolute_pose(
            a, b, m, r, t, n_hypotheses=n_hypotheses
        )
    )(X, x, mask, rngs, thresholds)


def refine_pose(qvec, tvec, X, x, mask, iters: int = 10):
    """Public pose polish used after registration (normalized coords)."""
    R = quat_to_rotmat(qvec)
    R2, t2 = _gauss_newton_pose(R, tvec, X, x, mask.astype(X.dtype), iters)
    return rotmat_to_quat(R2), t2
