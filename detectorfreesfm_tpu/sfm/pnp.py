"""Absolute pose (PnP) via batched P3P + DLT RANSAC + Gauss-Newton polish.

Replaces COLMAP's P3P/EPnP RANSAC absolute-pose registration (reference
mapper thresholds `abs_pose_max_error`, hydra_configs/eth3d_sfm/dfsfm.yaml:105).
TPU-first shape discipline as in twoview.py: fixed hypothesis count, padded
correspondence arrays, no data-dependent control flow.

Hypotheses come from BOTH minimal families, scored in one consensus pass:

* P3P (Grunert): the 3-point minimal solver COLMAP registers with. The
  quartic is solved by a fixed-iteration Durand-Kerner sweep in complex
  arithmetic — batched, branch-free, no host eig/companion-matrix — so it
  maps onto the TPU unlike classical root finders. At inlier ratio w a
  3-point sample survives with probability w^3 vs w^6 for DLT, which is the
  difference between registering and losing an image on contaminated
  correspondence sets (w=0.3: 2.7% vs 0.07% per hypothesis).
* 6-point DLT: overdetermined-sample fallback that tolerates grid-quantized
  keypoint noise better at high inlier ratios (more points per hypothesis
  average the noise down) and needs no root disambiguation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.geometry import quat_to_rotmat, rotmat_to_quat, so3_exp
from ..core.precision import geometry_jit


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


def _quartic_roots(coef: jax.Array, iters: int = 60) -> jax.Array:
    """Roots of c4 x^4 + ... + c0 (coef ascending (..., 5)) by Durand-Kerner.

    Fixed-iteration, branch-free, complex64 — jit/vmap/TPU friendly. Returns
    (..., 4) complex roots; callers filter by |imag| and domain constraints.
    Degenerate leading coefficients are guarded (the affected sample simply
    yields no valid root, which RANSAC absorbs)."""
    lead = coef[..., 4:5]
    lead = jnp.where(jnp.abs(lead) < 1e-12, 1e-12, lead)
    c = (coef / lead).astype(jnp.complex64)  # monic: x^4 + c3 x^3 + ... + c0

    # Standard DK seeds: powers of (0.4 + 0.9i), distinct and non-real
    seed = jnp.asarray(
        [(0.4 + 0.9j) ** k for k in range(1, 5)], jnp.complex64
    )
    z = jnp.broadcast_to(seed, (*c.shape[:-1], 4))

    def horner(z_):
        p = jnp.ones_like(z_)
        for k in (3, 2, 1, 0):
            p = p * z_ + c[..., k : k + 1]
        return p

    def step(_, z_):
        pz = horner(z_)
        diff = z_[..., :, None] - z_[..., None, :]
        eye = jnp.eye(4, dtype=jnp.complex64)
        denom = jnp.prod(diff + eye, axis=-1)
        denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        return z_ - pz / denom

    return jax.lax.fori_loop(0, iters, step, z)


def _poly_mul(p: jax.Array, q: jax.Array, out_deg: int) -> jax.Array:
    """Coefficient convolution, ascending powers, (..., dp+1) x (..., dq+1)
    -> (..., out_deg+1)."""
    out = jnp.zeros((*p.shape[:-1], out_deg + 1), p.dtype)
    for i in range(p.shape[-1]):
        for j in range(q.shape[-1]):
            if i + j <= out_deg:
                out = out.at[..., i + j].add(p[..., i] * q[..., j])
    return out


def _p3p_candidates(X: jax.Array, x: jax.Array):
    """Grunert P3P: (..., 3, 3) world points + (..., 3, 2) normalized image
    coords -> (R (..., 4, 3, 3), t (..., 4, 3), valid (..., 4)).

    Up to 4 pose candidates per sample (quartic roots); invalid roots are
    flagged, their poses are identity-ish garbage the caller's scoring
    rejects via the valid mask."""
    f = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
    f = f * jax.lax.rsqrt(jnp.sum(f * f, axis=-1, keepdims=True) + 1e-20)
    P1, P2, P3 = X[..., 0, :], X[..., 1, :], X[..., 2, :]
    f1, f2, f3 = f[..., 0, :], f[..., 1, :], f[..., 2, :]

    a2 = jnp.sum((P2 - P3) ** 2, axis=-1)  # side opposite P1
    b2 = jnp.sum((P1 - P3) ** 2, axis=-1)
    c2 = jnp.sum((P1 - P2) ** 2, axis=-1)
    ca = jnp.sum(f2 * f3, axis=-1)         # cos(angle) opposite side a
    cb = jnp.sum(f1 * f3, axis=-1)
    cg = jnp.sum(f1 * f2, axis=-1)

    b2s = jnp.where(b2 < 1e-12, 1e-12, b2)
    A = (a2 - c2) / b2s

    # s2 = u s1, s3 = v s1. Eliminating s1 and u leaves a quartic in v:
    #   E(v) = N(v)^2 - 2 ca v N(v) D(v) + (v^2 - Q(v)) D(v)^2 = 0
    # with  N(v) = (A-1) v^2 - 2 A cb v + (A+1)        [u = N / D]
    #       D(v) = 2 (cg - ca v)
    #       Q(v) = (a2/b2)(1 + v^2 - 2 cb v)
    one = jnp.ones_like(A)
    N = jnp.stack([A + one, -2.0 * A * cb, A - one], axis=-1)      # deg 2
    D = jnp.stack([2.0 * cg, -2.0 * ca], axis=-1)                  # deg 1
    q_ = a2 / b2s
    # v^2 - Q(v)  (deg 2, ascending)
    VQ = jnp.stack([-q_, 2.0 * q_ * cb, one - q_], axis=-1)
    NN = _poly_mul(N, N, 4)
    ND = _poly_mul(N, D, 3)
    # 2 ca v * (N D): shift by one power, scale
    vND = jnp.concatenate([jnp.zeros_like(ND[..., :1]), ND], axis=-1)
    DD = _poly_mul(D, D, 2)
    E = NN - 2.0 * ca[..., None] * vND + _poly_mul(VQ, DD, 4)

    roots = _quartic_roots(E)                                       # (..., 4)
    v = jnp.real(roots)
    real_ok = jnp.abs(jnp.imag(roots)) < 1e-4 * (1.0 + jnp.abs(v))

    # Newton-polish the (near-)real roots in real f32: DK gets within ~1e-3;
    # three quadratically-converging steps take the pose error to float eps.
    dE = jnp.stack(
        [E[..., 1], 2.0 * E[..., 2], 3.0 * E[..., 3], 4.0 * E[..., 4]],
        axis=-1,
    )

    def _eval(p, vv):
        out = jnp.zeros_like(vv)
        for k in range(p.shape[-1] - 1, -1, -1):
            out = out * vv + p[..., k : k + 1]
        return out

    for _ in range(3):
        dEn = _eval(dE, v)
        dEn = jnp.where(jnp.abs(dEn) < 1e-12, 1e-12, dEn)
        v = v - _eval(E, v) / dEn

    # Back-substitute each root (same Horner evaluator as the polish above)
    Dn = _eval(D, v)
    Dn = jnp.where(jnp.abs(Dn) < 1e-10, 1e-10, Dn)
    u = _eval(N, v) / Dn                                            # (..., 4)
    s1sq_den = 1.0 + v * v - 2.0 * v * cb[..., None]
    s1 = jnp.sqrt(b2s[..., None] / jnp.where(s1sq_den < 1e-12, 1e-12, s1sq_den))
    s2 = u * s1
    s3 = v * s1
    valid = (
        real_ok & (s1 > 1e-9) & (s2 > 1e-9) & (s3 > 1e-9)
        & (s1sq_den > 1e-12) & jnp.isfinite(s1 + s2 + s3)
    )

    # Newton-polish the depths on the law-of-cosines residuals directly.
    # The quartic coefficients are products of f32 inputs, so its root (and
    # everything derived from it) carries ~1e-3 relative rounding -> ~1 deg
    # pose error on some geometries; the residuals below are computed from
    # the raw data, so a few quadratic steps reach the f32 floor.
    caa = ca[..., None]
    cbb = cb[..., None]
    cgg = cg[..., None]
    a2e = a2[..., None]
    b2e = b2s[..., None]
    c2e = c2[..., None]
    for _ in range(4):
        g = jnp.stack([
            s2 * s2 + s3 * s3 - 2.0 * s2 * s3 * caa - a2e,
            s1 * s1 + s3 * s3 - 2.0 * s1 * s3 * cbb - b2e,
            s1 * s1 + s2 * s2 - 2.0 * s1 * s2 * cgg - c2e,
        ], axis=-1)                                          # (..., 4, 3)
        zero = jnp.zeros_like(s1)
        J = jnp.stack([
            jnp.stack([zero, 2.0 * (s2 - s3 * caa),
                       2.0 * (s3 - s2 * caa)], axis=-1),
            jnp.stack([2.0 * (s1 - s3 * cbb), zero,
                       2.0 * (s3 - s1 * cbb)], axis=-1),
            jnp.stack([2.0 * (s1 - s2 * cgg),
                       2.0 * (s2 - s1 * cgg), zero], axis=-1),
        ], axis=-2)                                          # (..., 4, 3, 3)
        ridge = 1e-9 * jnp.eye(3, dtype=J.dtype)
        delta = jnp.linalg.solve(J + ridge, g[..., None])[..., 0]
        ok_step = jnp.isfinite(delta).all(axis=-1, keepdims=False)
        s1 = jnp.where(ok_step, s1 - delta[..., 0], s1)
        s2 = jnp.where(ok_step, s2 - delta[..., 1], s2)
        s3 = jnp.where(ok_step, s3 - delta[..., 2], s3)
    valid = valid & (s1 > 1e-9) & (s2 > 1e-9) & (s3 > 1e-9)

    # Camera-frame points Y_i = s_i f_i; absolute orientation (Horn/SVD)
    Y = jnp.stack(
        [s1[..., None] * f1[..., None, :],
         s2[..., None] * f2[..., None, :],
         s3[..., None] * f3[..., None, :]], axis=-2,
    )  # (..., 4, 3pts, 3)
    Pw = jnp.broadcast_to(X[..., None, :, :], Y.shape)
    Pc = jnp.mean(Pw, axis=-2, keepdims=True)
    Yc = jnp.mean(Y, axis=-2, keepdims=True)
    M = jnp.einsum("...ni,...nj->...ij", Y - Yc, Pw - Pc)
    U, _S, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt))
    Dfix = jnp.concatenate(
        [jnp.ones((*det.shape, 2)), det[..., None]], axis=-1
    )
    R = jnp.einsum("...ij,...j,...jk->...ik", U, Dfix, Vt)
    t = Yc[..., 0, :] - jnp.einsum("...ij,...j->...i", R, Pc[..., 0, :])
    return R, t, valid


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



@geometry_jit(static_argnames=("n_hypotheses",))
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
    R_dlt, t_dlt = _dlt_pose(X[idx], x[idx], jnp.ones(idx.shape, X.dtype))
    # P3P on the first 3 indices of every sample: up to 4 poses each. Both
    # families share one consensus pass below (COLMAP's registration solver
    # is P3P; DLT covers the high-inlier grid-noise regime better).
    R_p3p, t_p3p, valid_p3p = _p3p_candidates(X[idx[:, :3]], x[idx[:, :3]])
    R_h = jnp.concatenate([R_dlt, R_p3p.reshape(-1, 3, 3)], axis=0)
    t_h = jnp.concatenate([t_dlt, t_p3p.reshape(-1, 3)], axis=0)
    hyp_ok = jnp.concatenate(
        [jnp.ones((n_hypotheses,), bool), valid_p3p.reshape(-1)], axis=0
    )
    err = _reproj_err2(R_h, t_h, X[None], x[None])
    err = jnp.where(hyp_ok[:, None], err, jnp.inf)

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


@geometry_jit(static_argnames=("n_hypotheses",))
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
