"""Bundle adjustment: Schur-complement Levenberg-Marquardt, fully jitted.

Replaces the reference's Ceres BA inside the COLMAP fork (the `mapper` /
`incremental_model_refiner` hot loop — SURVEY.md §3.3/§3.4). TPU-first
design:

  * Static shapes everywhere: observations are padded (O,) arrays with a
    validity mask; cameras and points are padded blocks. One compiled
    program per (C, P, O, T_max) bucket serves every LM iteration.
  * Per-observation 2x(8|3) Jacobians come from vmapped jacfwd of the
    projection residual — exact derivatives, no hand-coded chain rule.
  * The camera-block Schur complement S = U - W V^{-1} W^T is assembled by
    regrouping observations into per-point padded tracks and scatter-adding
    the (T x T) camera-pair outer products into a dense (C*8, C*8) system;
    for C <= a few hundred a dense Cholesky on the MXU beats any sparse
    solver. (Multi-host sharding of the point reduction rides the same
    segment-sum structure — the obs arrays shard over "data".)
  * Camera block = 6-dof pose ⊕ log-focal ⊕ radial k1 (8 params); the
    focal/k1 columns are masked by refine flags, so one program covers all
    modes. Gauge-fixed cameras freeze only the pose columns.
  * Gauge: with exactly two `fixed_cams` the wrapper freezes a proper
    7-DOF similarity gauge — camera A's full pose (6) plus ONE translation
    component of camera B (the one most aligned with the scale direction),
    COLMAP BundleAdjustmentConfig semantics. Camera B's rotation and the
    remaining translation DOF stay LIVE, so BA can correct an imperfect
    two-view init instead of warping the whole map around it (freezing
    both poses over-constrains by 5 DOF and locks init error in). Both
    anchors' focals stay frozen (focal/depth gauge in unknown-intrinsics
    scenes). Any other fixed count freezes those cameras fully (the
    triangulation-mode / known-poses contract; reference
    write_fixed_images.py fix_farest_images).
  * Robustness: Huber weights re-evaluated each iteration (IRLS form).

Scene normalization (centering + unit scale) is applied by the host wrapper
to keep float32 well-conditioned; Ceres runs f64, we trade that for MXU f32
throughput + normalization.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import np_quat_to_rotmat, np_rotmat_to_quat, so3_exp
from ..core.precision import geometry_jit

CAM_DOF = 8  # 3 rot + 3 trans + 1 log-focal + 1 radial k1


class BAProblem(NamedTuple):
    """Static-shape BA problem. All arrays padded; masks mark live entries."""

    cam_R: jax.Array        # (C, 3, 3) world->cam rotations
    cam_t: jax.Array        # (C, 3)
    intr: jax.Array         # (C, 5) fx, fy, cx, cy, k1 (SIMPLE_RADIAL)
    points: jax.Array       # (P, 3)
    obs_uv: jax.Array       # (O, 2) pixel observations
    obs_cam: jax.Array      # (O,) int32
    obs_pt: jax.Array       # (O,) int32
    obs_mask: jax.Array     # (O,) bool
    track_obs: jax.Array    # (P, T) int32 obs index per point (padded with O)
    track_mask: jax.Array   # (P, T) bool
    fixed_cams: jax.Array   # (C,) bool — anchor cameras (focal gauge)
    pose_free: jax.Array    # (C, 6) float — per-pose-column freedom mask
    refine_focal: jax.Array # () bool
    refine_dist: jax.Array  # () bool — refine the radial k1 column


class BAState(NamedTuple):
    cam_R: jax.Array
    cam_t: jax.Array
    intr: jax.Array
    points: jax.Array
    lam: jax.Array   # LM damping
    cost: jax.Array  # current robust cost


def _proj(R, t, f_scale, intr, X, dk=0.0):
    """Project one world point with SIMPLE_RADIAL distortion.

    f_scale multiplies (fx, fy); dk is a local additive update to the k1
    stored in intr[4] (so jacfwd differentiates through it). The distorted-
    space residual matches COLMAP/Ceres exactly: observed pixels are the
    raw (distorted) measurements (src/post_optimization/utils/
    geometry_utils.py:30 handles the same model on the reference side)."""
    Xc = R @ X + t
    z = jnp.where(jnp.abs(Xc[2]) < 1e-9, 1e-9, Xc[2])
    x, y = Xc[0] / z, Xc[1] / z
    k1 = intr[4] + dk
    d = 1.0 + k1 * (x * x + y * y)
    x, y = x * d, y * d
    fx, fy, cx, cy = intr[0] * f_scale, intr[1] * f_scale, intr[2], intr[3]
    return jnp.stack([fx * x + cx, fy * y + cy]), Xc[2]


def _obs_residual(delta_cam, delta_pt, R0, t0, intr0, X0, uv):
    """Residual as a function of the *local* update (8,) ⊕ (3,)."""
    w, dt, dlf = delta_cam[:3], delta_cam[3:6], delta_cam[6]
    R = so3_exp(w) @ R0
    t = t0 + dt
    f_scale = jnp.exp(dlf)
    pred, _z = _proj(R, t, f_scale, intr0, X0 + delta_pt, dk=delta_cam[7])
    return pred - uv


def _huber_weight(r2, delta):
    """IRLS sqrt-weight for the Huber loss on squared residual norm r2."""
    r = jnp.sqrt(jnp.maximum(r2, 1e-18))
    return jnp.where(r <= delta, 1.0, jnp.sqrt(delta / r))


def _jacobians(prob: BAProblem):
    """Per-observation residuals + Jacobians at the current state.

    Returns r (O, 2), A (O, 2, 8), B (O, 2, 3), already masked and
    Huber-weighted.
    """
    R0 = prob.cam_R[prob.obs_cam]
    t0 = prob.cam_t[prob.obs_cam]
    K0 = prob.intr[prob.obs_cam]
    X0 = prob.points[prob.obs_pt]

    zero_c = jnp.zeros((prob.obs_uv.shape[0], CAM_DOF), prob.points.dtype)
    zero_p = jnp.zeros((prob.obs_uv.shape[0], 3), prob.points.dtype)

    def res(dc, dp, R, t, K, X, uv):
        return _obs_residual(dc, dp, R, t, K, X, uv)

    r = jax.vmap(res)(zero_c, zero_p, R0, t0, K0, X0, prob.obs_uv)
    A = jax.vmap(jax.jacfwd(res, argnums=0))(
        zero_c, zero_p, R0, t0, K0, X0, prob.obs_uv
    )
    B = jax.vmap(jax.jacfwd(res, argnums=1))(
        zero_c, zero_p, R0, t0, K0, X0, prob.obs_uv
    )
    return r, A, B


def _weighted_system(prob: BAProblem, huber_delta: float):
    r, A, B = _jacobians(prob)
    w = _huber_weight(jnp.sum(r * r, -1), huber_delta)
    w = w * prob.obs_mask.astype(w.dtype)
    # Per-camera COLUMN mask. Pose columns come from the wrapper-built
    # pose_free mask (7-DOF similarity gauge for two anchors, full freeze
    # otherwise — see bundle_adjust). Anchor cameras additionally freeze
    # their focal column (the two anchor focals pin the focal/depth gauge
    # in unknown-intrinsics scenes — letting them float regressed the demo
    # scene 8/8 -> 6/8), but their DISTORTION column stays live: k1 is a
    # lens property with no gauge coupling, and freezing it on gauge
    # cameras left their k1 stuck at 0 (tests/test_simple_radial.py).
    C = prob.cam_R.shape[0]
    dtype = A.dtype
    focal_on = prob.refine_focal.astype(dtype)
    dist_on = prob.refine_dist.astype(dtype)
    anchor_free = (1.0 - prob.fixed_cams.astype(dtype))[:, None]  # (C, 1)
    cam_col = jnp.concatenate([
        prob.pose_free.astype(dtype),
        focal_on * anchor_free,
        jnp.full((C, 1), dist_on, dtype),
    ], axis=1)                                                    # (C, 8)
    A = A * cam_col[prob.obs_cam][:, None, :]
    rw = r * w[:, None]
    Aw = A * w[:, None, None]
    Bw = B * w[:, None, None]
    return rw, Aw, Bw, w, cam_col



@geometry_jit(static_argnames=("huber_delta",))
def ba_cost(prob: BAProblem, huber_delta: float = 2.0) -> jax.Array:
    """Total robust cost (Huber rho of pixel residuals) over live obs."""
    R0 = prob.cam_R[prob.obs_cam]
    t0 = prob.cam_t[prob.obs_cam]
    K0 = prob.intr[prob.obs_cam]
    X0 = prob.points[prob.obs_pt]
    pred, _ = jax.vmap(lambda R, t, K, X: _proj(R, t, 1.0, K, X))(R0, t0, K0, X0)
    r2 = jnp.sum((pred - prob.obs_uv) ** 2, -1)
    d = huber_delta
    rho = jnp.where(r2 <= d * d, r2, 2.0 * d * jnp.sqrt(jnp.maximum(r2, 1e-18)) - d * d)
    return jnp.sum(rho * prob.obs_mask.astype(rho.dtype))


@geometry_jit(static_argnames=("huber_delta",))
def lm_step(prob: BAProblem, lam: jax.Array, huber_delta: float = 2.0):
    """One damped Schur LM solve. Returns proposed (cam_R, cam_t, intr,
    points) — acceptance is decided by the host loop via ba_cost."""
    C = prob.cam_R.shape[0]
    P = prob.points.shape[0]
    dtype = prob.points.dtype
    rw, Aw, Bw, _, cam_col = _weighted_system(prob, huber_delta)

    # Per-camera U blocks and rhs
    U = jax.ops.segment_sum(
        jnp.einsum("oik,oil->okl", Aw, Aw), prob.obs_cam, num_segments=C
    )
    b_cam = jax.ops.segment_sum(
        -jnp.einsum("oik,oi->ok", Aw, rw), prob.obs_cam, num_segments=C
    )
    V = jax.ops.segment_sum(
        jnp.einsum("oik,oil->okl", Bw, Bw), prob.obs_pt, num_segments=P
    )
    b_pt = jax.ops.segment_sum(
        -jnp.einsum("oik,oi->ok", Bw, rw), prob.obs_pt, num_segments=P
    )

    # LM damping (multiplicative on the diagonal, Ceres-style)
    eyeC = jnp.eye(CAM_DOF, dtype=dtype)
    eyeP = jnp.eye(3, dtype=dtype)
    U = U + lam * (U * eyeC) + 1e-8 * eyeC
    V = V + lam * (V * eyeP) + 1e-8 * eyeP
    V_inv = jnp.linalg.inv(V)

    # Per-obs W = A^T B, Y = W V^{-1}
    W = jnp.einsum("oik,oil->okl", Aw, Bw)          # (O, 8, 3)
    Y = jnp.einsum("okl,olm->okm", W, V_inv[prob.obs_pt])

    # Reduced rhs: b̃_c = b_cam - sum_obs Y_o b_pt[pt(o)]
    red = jax.ops.segment_sum(
        jnp.einsum("okm,om->ok", Y, b_pt[prob.obs_pt]),
        prob.obs_cam, num_segments=C,
    )
    b_red = b_cam - red

    # Schur S: start from block-diag U, subtract per-point camera-pair terms.
    # Regroup obs by point: track_obs (Pt, T) indexes into the obs arrays
    # (Pt >= P when the table is padded to a device multiple; pad rows point
    # at the masked dummy observation and contribute zeros).
    Pt, T = prob.track_obs.shape
    Wt = W[prob.track_obs] * prob.track_mask[..., None, None].astype(dtype)   # (Pt, T, 7, 3)
    Yt = Y[prob.track_obs] * prob.track_mask[..., None, None].astype(dtype)
    cams_t = prob.obs_cam[prob.track_obs]                                     # (Pt, T)
    # (Pt, T, T, 7, 7) pairwise Y_i W_j^T
    pair = jnp.einsum("ptkm,pslm->ptskl", Yt, Wt)
    S = jnp.zeros((C, C, CAM_DOF, CAM_DOF), dtype)
    idx_i = jnp.broadcast_to(cams_t[:, :, None], (Pt, T, T)).reshape(-1)
    idx_j = jnp.broadcast_to(cams_t[:, None, :], (Pt, T, T)).reshape(-1)
    S = S.at[idx_i, idx_j].add(pair.reshape(-1, CAM_DOF, CAM_DOF))
    S = -S
    S = S.at[jnp.arange(C), jnp.arange(C)].add(U)

    # Masked columns (fixed pose DOF / disabled intrinsic DOF / empty
    # cameras) -> unit diagonal entries (keeps Cholesky SPD)
    occupied = jax.ops.segment_sum(
        prob.obs_mask.astype(dtype), prob.obs_cam, num_segments=C
    ) > 0
    free_col = cam_col * occupied[:, None].astype(dtype)   # (C, 8)
    S = S * free_col[:, None, :, None] * free_col[None, :, None, :]
    S = S.at[jnp.arange(C), jnp.arange(C)].add(
        jax.vmap(jnp.diag)(1.0 - free_col)
    )
    b_red = b_red * free_col

    # Dense solve on the MXU
    S_dense = S.transpose(0, 2, 1, 3).reshape(C * CAM_DOF, C * CAM_DOF)
    delta_c = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(S_dense), b_red.reshape(-1)
    ).reshape(C, CAM_DOF)

    # Back-substitute points: δX_p = V^{-1} (b_pt - Σ_o W_o^T δc_{cam(o)})
    WtD = jax.ops.segment_sum(
        jnp.einsum("okl,ok->ol", W, delta_c[prob.obs_cam]),
        prob.obs_pt, num_segments=P,
    )
    delta_p = jnp.einsum("pkl,pl->pk", V_inv, b_pt - WtD)

    # Apply updates
    dR = so3_exp(delta_c[:, :3])
    cam_R = dR @ prob.cam_R
    cam_t = prob.cam_t + delta_c[:, 3:6]
    f_scale = jnp.exp(delta_c[:, 6])
    intr = prob.intr.at[:, 0].mul(f_scale).at[:, 1].mul(f_scale)
    intr = intr.at[:, 4].add(delta_c[:, 7])
    points = prob.points + delta_p
    return cam_R, cam_t, intr, points


@geometry_jit(static_argnames=("huber_delta", "cg_iters", "cg_rtol"))
def lm_step_pcg(prob: BAProblem, lam: jax.Array, huber_delta: float = 2.0,
                cg_iters: int = 100, cg_rtol: float = 1e-2):
    """One damped LM step solving the camera Schur system with MATRIX-FREE
    preconditioned conjugate gradients (Ceres ITERATIVE_SCHUR +
    SCHUR_JACOBI equivalent).

    The dense path (lm_step) assembles S as (C, C, 7, 7) plus a
    (P, T, T, 7, 7) pair tensor — O(C^2 + P T^2) memory, hopeless past a few
    hundred cameras. Here S is never formed: each CG iteration applies
      S v = (U + lam diag) v  -  sum_o Y_o ( sum_{o' in track(pt(o))} W_{o'}^T v_{cam(o')} )
    as two segment-sums + per-observation einsums — O(O) memory, and the
    reductions shard over the mesh exactly like the Jacobian work (BASELINE
    north star: Bridge-scale multi-host Schur over ICI/DCN).

    Preconditioner: exact S diagonal blocks D_c = U_c - sum_{o: cam(o)=c}
    Y_o W_o^T (one observation per camera per track, so the off-diagonal
    same-camera terms vanish) — the SCHUR_JACOBI block preconditioner.
    """
    C = prob.cam_R.shape[0]
    P = prob.points.shape[0]
    dtype = prob.points.dtype
    rw, Aw, Bw, _, cam_col = _weighted_system(prob, huber_delta)

    U = jax.ops.segment_sum(
        jnp.einsum("oik,oil->okl", Aw, Aw), prob.obs_cam, num_segments=C
    )
    b_cam = jax.ops.segment_sum(
        -jnp.einsum("oik,oi->ok", Aw, rw), prob.obs_cam, num_segments=C
    )
    V = jax.ops.segment_sum(
        jnp.einsum("oik,oil->okl", Bw, Bw), prob.obs_pt, num_segments=P
    )
    b_pt = jax.ops.segment_sum(
        -jnp.einsum("oik,oi->ok", Bw, rw), prob.obs_pt, num_segments=P
    )

    eyeC = jnp.eye(CAM_DOF, dtype=dtype)
    eyeP = jnp.eye(3, dtype=dtype)
    U = U + lam * (U * eyeC) + 1e-8 * eyeC
    V = V + lam * (V * eyeP) + 1e-8 * eyeP
    V_inv = jnp.linalg.inv(V)

    W = jnp.einsum("oik,oil->okl", Aw, Bw)               # (O, 8, 3)
    Y = jnp.einsum("okl,olm->okm", W, V_inv[prob.obs_pt])

    occupied = jax.ops.segment_sum(
        prob.obs_mask.astype(dtype), prob.obs_cam, num_segments=C
    ) > 0
    # Per-COLUMN freedom (pose frozen for gauge cameras, intrinsic columns
    # still live — see _weighted_system)
    free_col = cam_col * occupied[:, None].astype(dtype)   # (C, 8)

    # Reduced rhs
    red = jax.ops.segment_sum(
        jnp.einsum("okm,om->ok", Y, b_pt[prob.obs_pt]),
        prob.obs_cam, num_segments=C,
    )
    b_red = (b_cam - red) * free_col

    def S_mv(v):  # v (C, 8) -> S v (C, 8), masked columns = identity
        vf = v * free_col
        u = jnp.einsum("ckl,cl->ck", U, vf)
        z = jax.ops.segment_sum(
            jnp.einsum("okl,ok->ol", W, vf[prob.obs_cam]),
            prob.obs_pt, num_segments=P,
        )                                                # (P, 3)
        corr = jax.ops.segment_sum(
            jnp.einsum("okm,om->ok", Y, z[prob.obs_pt]),
            prob.obs_cam, num_segments=C,
        )
        return (u - corr) * free_col + v * (1.0 - free_col)

    # SCHUR_JACOBI preconditioner blocks
    diag_corr = jax.ops.segment_sum(
        jnp.einsum("okm,olm->okl", Y, W), prob.obs_cam, num_segments=C
    )
    D = U - diag_corr
    D = (D * free_col[:, :, None] * free_col[:, None, :]
         + jax.vmap(jnp.diag)(1.0 - free_col))
    D_inv = jnp.linalg.inv(D + 1e-8 * eyeC)

    def M_inv(v):
        return jnp.einsum("ckl,cl->ck", D_inv, v)

    # PCG on (C, 8) with tolerance-based early exit (Ceres' per-LM-iteration
    # forcing term: stop at ||r|| <= cg_rtol * ||b||). A while_loop, not a
    # fixed fori_loop — converged solves stop paying for the remaining
    # iterations (VERDICT r2 weak #8). The iteration count is returned so
    # callers/benches can report real CG work.
    x0 = jnp.zeros((C, CAM_DOF), dtype)
    r0 = b_red - S_mv(x0)
    z0 = M_inv(r0)
    p0 = z0
    rz0 = jnp.sum(r0 * z0)
    b2 = jnp.sum(b_red * b_red)
    tol2 = (cg_rtol * cg_rtol) * b2

    def cond(state):
        _x, r, _p, _rz, it = state
        return (it < cg_iters) & (jnp.sum(r * r) > tol2)

    def body(state):
        x, r, p, rz, it = state
        Sp = S_mv(p)
        denom = jnp.sum(p * Sp)
        alpha = jnp.where(jnp.abs(denom) > 1e-20, rz / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * Sp
        z = M_inv(r)
        rz_new = jnp.sum(r * z)
        beta = jnp.where(jnp.abs(rz) > 1e-20, rz_new / rz, 0.0)
        p = z + beta * p
        return (x, r, p, rz_new, it + 1)

    delta_c, _, _, _, cg_used = jax.lax.while_loop(
        cond, body, (x0, r0, p0, rz0, jnp.zeros((), jnp.int32))
    )
    delta_c = delta_c * free_col

    # Back-substitute points
    WtD = jax.ops.segment_sum(
        jnp.einsum("okl,ok->ol", W, delta_c[prob.obs_cam]),
        prob.obs_pt, num_segments=P,
    )
    delta_p = jnp.einsum("pkl,pl->pk", V_inv, b_pt - WtD)

    dR = so3_exp(delta_c[:, :3])
    cam_R = dR @ prob.cam_R
    cam_t = prob.cam_t + delta_c[:, 3:6]
    f_scale = jnp.exp(delta_c[:, 6])
    intr = prob.intr.at[:, 0].mul(f_scale).at[:, 1].mul(f_scale)
    intr = intr.at[:, 4].add(delta_c[:, 7])
    points = prob.points + delta_p
    return cam_R, cam_t, intr, points, cg_used


def bundle_adjust(
    qvec: np.ndarray,        # (C, 4)
    tvec: np.ndarray,        # (C, 3)
    intr: np.ndarray,        # (C, 4) fx, fy, cx, cy  or  (C, 5) ... + k1
    points: np.ndarray,      # (P, 3)
    obs_uv: np.ndarray,      # (O, 2)
    obs_cam: np.ndarray,     # (O,)
    obs_pt: np.ndarray,      # (O,)
    fixed_cams: np.ndarray | None = None,
    refine_focal: bool = False,
    refine_dist: bool = False,  # refine SIMPLE_RADIAL k1 (intr column 5)
    max_iters: int = 30,
    huber_delta: float = 2.0,
    max_track: int | None = None,
    mesh=None,               # jax.sharding.Mesh -> shard obs over "data"
    schur_mode: str = "auto",  # "dense" | "pcg" | "auto" (pcg past 120 cams)
    cg_iters: int = 100,
    cg_rtol: float = 1e-2,   # CG forcing term (||r|| <= rtol ||b||)
    gauge: str = "auto",     # "similarity" | "full" | "auto"
    verbose: bool = False,
):
    """Host LM driver around the jitted Schur step.

    Inputs are live (unpadded) numpy arrays; padding/bucketing happens here.
    Returns (qvec, tvec, intr, points, final_cost_per_obs).

    With `mesh`, the observation arrays (and per-point track tables) shard
    over the mesh's "data" axis: the per-observation Jacobians and the
    segment-sum reductions into camera/point blocks then run SPMD, with XLA
    inserting the cross-chip psums — the distributed-Schur design of
    BASELINE.md (camera blocks reduced over ICI, points partitioned).
    Cameras, points, and the reduced (C·7)^2 system stay replicated: the
    dense Cholesky is tiny next to the residual/Jacobian work on big scenes.
    """
    C, P, O = len(qvec), len(points), len(obs_uv)
    in_cols = intr.shape[1]
    if in_cols == 4:  # pinhole callers: k1 = 0 column appended internally
        intr = np.concatenate([intr, np.zeros((C, 1))], axis=1)
    if O == 0 or P == 0:
        return qvec, tvec, intr[:, :in_cols], points, 0.0
    use_pcg = schur_mode == "pcg" or (schur_mode == "auto" and C > 120)

    # Scene normalization for f32 conditioning
    center = points.mean(0)
    scale = float(np.median(np.linalg.norm(points - center, axis=1)) + 1e-9)
    pts_n = (points - center) / scale
    # x_cam = R x_w + t ; with x_w = s*x_n + c: x_cam = s (R x_n + (R c + t)/s)
    # → normalized pose t_n = (R c + t)/s, and pixels are scale-invariant.
    R_all = np_quat_to_rotmat(np.asarray(qvec, np.float64))
    t_n = (np.einsum("cij,j->ci", R_all, center) + tvec) / scale

    # Gauge pose mask, selected EXPLICITLY by the caller (not inferred from
    # the fixed count — a known-poses 2-camera scene must NOT get the
    # similarity gauge; see triangulate_known_poses):
    #   "similarity": proper 7-DOF gauge over exactly two anchor cameras —
    #     freeze cam A's full pose and the single translation component of
    #     cam B most aligned with the residual scale direction
    #     d t_B/ds = t_B - R_B R_A^T t_A  (= R_B (C_A - C_B), the baseline
    #     in B's frame). Everything else on B stays live so BA can correct
    #     an imperfect init-pair estimate.
    #   "full": every fixed camera's pose is frozen completely (known-poses
    #     triangulation contract — COLMAP BundleAdjustmentConfig constant
    #     poses, reference write_fixed_images.py:31).
    #   "auto": legacy inference — similarity iff exactly 2 fixed.
    fixed = np.asarray(
        fixed_cams if fixed_cams is not None else np.zeros(C, bool), bool
    )
    pose_free_np = np.ones((C, 6), np.float32)
    fix_idx = np.flatnonzero(fixed)
    if gauge not in ("similarity", "full", "auto"):
        raise ValueError(f"unknown gauge {gauge!r}")
    if gauge == "similarity" and len(fix_idx) != 2:
        raise ValueError(
            f"gauge='similarity' needs exactly 2 fixed cameras, got "
            f"{len(fix_idx)}")
    use_sim = gauge == "similarity" or (gauge == "auto" and len(fix_idx) == 2)
    if use_sim:
        a, b = int(fix_idx[0]), int(fix_idx[1])
        pose_free_np[a] = 0.0
        d = t_n[b] - R_all[b] @ R_all[a].T @ t_n[a]
        if np.max(np.abs(d)) > 1e-12:
            pose_free_np[b, 3 + int(np.argmax(np.abs(d)))] = 0.0
        else:  # zero baseline: degenerate pair, pin it fully
            pose_free_np[b] = 0.0
    else:
        pose_free_np[fixed] = 0.0

    # Build per-point padded track->obs table (vectorized: rank of each
    # observation within its point's sorted group). The PCG path never
    # touches it — its Schur product is matrix-free — so it gets a minimal
    # dummy instead of an O(P*T) table.
    if use_pcg:
        T = 1
        track_obs = np.full((P, 1), O, np.int32)
        track_mask = np.zeros((P, 1), bool)
    else:
        order = np.argsort(obs_pt, kind="stable")
        counts = np.bincount(obs_pt, minlength=P)
        T = int(max_track or max(int(counts.max()), 2))
        track_obs = np.full((P, T), O, np.int32)
        track_mask = np.zeros((P, T), bool)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pt_sorted = obs_pt[order]
        rank = np.arange(O) - starts[pt_sorted]
        keep = rank < T
        track_obs[pt_sorted[keep], rank[keep]] = order[keep].astype(np.int32)
        track_mask[pt_sorted[keep], rank[keep]] = True

    # Pad obs arrays by one dummy slot (index O used by padded track entries),
    # then (sharded path) up to a device multiple so leading axes split evenly
    n_shard = 1
    if mesh is not None:
        n_shard = int(np.prod([mesh.shape[a] for a in ("data",) if a in mesh.shape]))
    o_pad = ((O + 1 + n_shard - 1) // n_shard) * n_shard

    def pad(a, v):
        extra = o_pad - O
        return np.concatenate(
            [a, np.full((extra,) + a.shape[1:], v, a.dtype)]
        )

    p_rows = ((P + n_shard - 1) // n_shard) * n_shard
    if p_rows > P:
        track_obs = np.concatenate(
            [track_obs, np.full((p_rows - P, T), O, np.int32)]
        )
        track_mask = np.concatenate(
            [track_mask, np.zeros((p_rows - P, T), bool)]
        )
    dt = np.float32
    # Placement: mesh path keeps its explicit TPU shardings (flag below
    # stops the geometry decorator's CPU hop); single-device path creates
    # the problem directly on the geometry device so the LM state never
    # bounces between devices across iterations. In "auto" mode the device
    # is chosen by problem size: the host-driven LM loop is dispatch-
    # latency-bound on small problems (accel 2.7x slower at C=50) but the
    # Schur solve amortizes past ~150 cameras (0.65x at C=300) —
    # tools/bench_geometry_placement.py.
    from ..core.precision import (
        _geometry_device_ctx, keep_geometry_on_default_device,
        prefer_accelerator_geometry,
    )
    import contextlib as _ctx

    _stack = _ctx.ExitStack()
    if mesh is not None:
        _stack.enter_context(keep_geometry_on_default_device())
    else:
        if C >= 150:
            _stack.enter_context(prefer_accelerator_geometry())
        _stack.enter_context(_geometry_device_ctx())
    with _stack:
        prob = BAProblem(
            cam_R=jnp.asarray(R_all, dt),
            cam_t=jnp.asarray(t_n, dt),
            intr=jnp.asarray(intr, dt),
            points=jnp.asarray(pts_n, dt),
            obs_uv=jnp.asarray(pad(obs_uv.astype(dt), 0.0)),
            obs_cam=jnp.asarray(pad(obs_cam.astype(np.int32), 0)),
            obs_pt=jnp.asarray(pad(obs_pt.astype(np.int32), 0)),
            obs_mask=jnp.asarray(
                pad(np.ones(O, bool), False)
            ),
            track_obs=jnp.asarray(track_obs),
            track_mask=jnp.asarray(track_mask),
            fixed_cams=jnp.asarray(fixed),
            pose_free=jnp.asarray(pose_free_np),
            refine_focal=jnp.asarray(refine_focal),
            refine_dist=jnp.asarray(refine_dist),
        )

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            data_sh = NamedSharding(mesh, PartitionSpec("data"))
            repl = NamedSharding(mesh, PartitionSpec())
            prob = BAProblem(*[
                jax.device_put(
                    v,
                    data_sh if name in (
                        "obs_uv", "obs_cam", "obs_pt", "obs_mask",
                        "track_obs", "track_mask",
                    ) else repl,
                )
                for name, v in zip(BAProblem._fields, prob)
            ])

        lam = 1e-3
        cost = float(ba_cost(prob, huber_delta))
        for it in range(max_iters):
            cg_used = 0
            if use_pcg:
                cam_R, cam_t, new_intr, new_pts, cg_used = lm_step_pcg(
                    prob, jnp.asarray(lam, dt), huber_delta, cg_iters,
                    cg_rtol
                )
                cg_used = int(cg_used)
            else:
                cam_R, cam_t, new_intr, new_pts = lm_step(
                    prob, jnp.asarray(lam, dt), huber_delta
                )
            cand = prob._replace(
                cam_R=cam_R, cam_t=cam_t, intr=new_intr, points=new_pts)
            new_cost = float(ba_cost(cand, huber_delta))
            if verbose:
                extra = f" cg {cg_used}" if use_pcg else ""
                print(f"  LM it {it}: cost {cost:.4f} -> {new_cost:.4f} "
                      f"lam {lam:.2e}{extra}")
            if np.isfinite(new_cost) and new_cost < cost:
                rel = (cost - new_cost) / max(cost, 1e-12)
                prob = cand
                cost = new_cost
                lam = max(lam / 3.0, 1e-8)
                if rel < 1e-6:
                    break
            else:
                lam = min(lam * 5.0, 1e6)
                if lam >= 1e6:
                    break

    # Denormalize
    q_out = np_rotmat_to_quat(np.asarray(prob.cam_R, np.float64))
    R_out = np.asarray(prob.cam_R, np.float64)
    t_out = np.asarray(prob.cam_t, np.float64) * scale - np.einsum(
        "cij,j->ci", R_out, center
    )
    pts_out = np.asarray(prob.points, np.float64) * scale + center
    return (
        q_out.astype(np.float64),
        t_out,
        np.asarray(prob.intr, np.float64)[:, :in_cols],
        pts_out,
        cost / max(O, 1),
    )
