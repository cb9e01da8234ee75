"""Two-view geometry: batched 8-point essential-matrix RANSAC + pose recovery.

TPU-native replacement for COLMAP's two-view geometric verification and
initial-pair pose estimation (reference call sites: hloc geometric
verification inside coarse_SfM_runner, SURVEY.md §2.3). Design:

  * RANSAC is a *fixed-iteration, fully batched* program: all H hypotheses
    are sampled, solved (8-pt eigendecomposition of the 9x9 normal matrix),
    and scored against all N correspondences in one einsum pipeline — no
    data-dependent control flow, so one compilation serves every pair.
  * Correspondence arrays are padded to a static N with a validity mask.
  * Pose recovery: E -> 4 (R, t) candidates -> cheirality vote by midpoint
    triangulation over all inliers.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.geometry import rotmat_to_quat
from ..core.precision import geometry_jit


class TwoViewResult(NamedTuple):
    E: jax.Array          # (3, 3) essential matrix (normalized coords)
    qvec: jax.Array       # (4,) rotation cam0 -> cam1 (world = cam0 frame)
    tvec: jax.Array       # (3,) unit-norm translation
    inliers: jax.Array    # (N,) bool
    n_inliers: jax.Array  # () int32


def normalize_points(uv: jax.Array, K: jax.Array) -> jax.Array:
    """Pixels -> unit-plane coordinates: x = (u - cx)/fx, y = (v - cy)/fy."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    return jnp.stack(
        [(uv[..., 0] - cx[..., None]) / fx[..., None],
         (uv[..., 1] - cy[..., None]) / fy[..., None]],
        axis=-1,
    )


def _nullvec(A: jax.Array) -> jax.Array:
    """Smallest-singular-vector of (..., M, 9) design matrices, computed on
    the DESIGN matrix instead of its 9x9 normal matrix: eigh(A^T A) squares
    the condition number, and the TPU's f32 eigh loses the smallest
    eigenvector on the near-rank-deficient systems planar scenes produce
    (VERDICT r5 #1 — the prescribed SVD/QR-on-A fix).

    * M == 8 (minimal 8-pt/4-pt samples): the nullspace is exact — the last
      column of the COMPLETE Householder QR of A^T spans it, accuracy
      O(eps * kappa(A)) with no iteration.
    * M > 8 (weighted refits): thin-QR A = QR, then the smallest right
      singular vector of the 9x9 R (kappa(R) = kappa(A))."""
    if A.shape[-2] == 8:
        Q, _ = jnp.linalg.qr(jnp.swapaxes(A, -1, -2), mode="complete")
        return Q[..., :, -1]
    R = jnp.linalg.qr(A, mode="r")
    _, _, Vt = jnp.linalg.svd(R)
    return Vt[..., -1, :]


def _eight_point(x0: jax.Array, x1: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted 8-point: (..., N, 2) correspondences -> (..., 3, 3) E.

    Solves min ||A e|| via QR/SVD on the design matrix (_nullvec), then
    projects to the essential manifold (two equal singular values, third
    zero).
    """
    ones = jnp.ones_like(x0[..., :1])
    p0 = jnp.concatenate([x0, ones], axis=-1)  # (..., N, 3)
    p1 = jnp.concatenate([x1, ones], axis=-1)
    # A rows: kron(p1, p0) so that p1^T E p0 = 0
    A = (p1[..., :, None] * p0[..., None, :]).reshape(*x0.shape[:-1], 9)
    A = A * w[..., None]
    e = _nullvec(A)
    E = e.reshape(*e.shape[:-1], 3, 3)
    # Project onto essential manifold
    U, S, Vt = jnp.linalg.svd(E)
    s = (S[..., 0] + S[..., 1]) * 0.5
    S_new = jnp.stack([s, s, jnp.zeros_like(s)], axis=-1)
    return U @ (S_new[..., :, None] * Vt)


def sampson_error(E: jax.Array, x0: jax.Array, x1: jax.Array) -> jax.Array:
    """Squared Sampson distance in normalized coords. E (..., 3, 3),
    x0/x1 (..., N, 2) -> (..., N)."""
    ones = jnp.ones_like(x0[..., :1])
    p0 = jnp.concatenate([x0, ones], axis=-1)
    p1 = jnp.concatenate([x1, ones], axis=-1)
    Ep0 = jnp.einsum("...ij,...nj->...ni", E, p0)
    Etp1 = jnp.einsum("...ji,...nj->...ni", E, p1)
    num = jnp.einsum("...ni,...ni->...n", p1, Ep0) ** 2
    den = (
        Ep0[..., 0] ** 2 + Ep0[..., 1] ** 2
        + Etp1[..., 0] ** 2 + Etp1[..., 1] ** 2
    )
    return num / jnp.maximum(den, 1e-12)


def decompose_E(E: jax.Array):
    """E -> ((R1, R2), t): the four candidate poses are (R_i, ±t)."""
    U, _, Vt = jnp.linalg.svd(E)
    # Enforce proper rotations
    det_u = jnp.linalg.det(U)
    det_v = jnp.linalg.det(Vt)
    U = U * jnp.stack([jnp.ones_like(det_u), jnp.ones_like(det_u), det_u], -1)[..., None, :]
    Vt = Vt * jnp.stack([jnp.ones_like(det_v), jnp.ones_like(det_v), det_v], -1)[..., :, None]
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    return R1, R2, t


def _cheirality_count(R, t, x0, x1, mask):
    """Count correspondences with positive depth in both views under (R, t)
    via the midpoint of the two viewing rays (camera0 at origin)."""
    ones = jnp.ones_like(x0[..., :1])
    d0 = jnp.concatenate([x0, ones], axis=-1)                 # rays in cam0
    d1c0 = jnp.einsum("ji,nj->ni", R, jnp.concatenate([x1, ones], -1))
    c1 = -R.T @ t                                             # cam1 center in cam0
    # Solve [d0, -d1] [s; r] = c1 per correspondence (2x2 normal equations)
    a = jnp.sum(d0 * d0, -1)
    b = -jnp.sum(d0 * d1c0, -1)
    c = jnp.sum(d1c0 * d1c0, -1)
    e0 = jnp.sum(d0 * c1, -1)
    e1 = -jnp.sum(d1c0 * c1, -1)
    det = a * c - b * b
    s = (c * e0 - b * e1) / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    r = (a * e1 - b * e0) / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    ok = (s > 1e-4) & (r > 1e-4) & mask
    return jnp.sum(ok.astype(jnp.int32))


class HomographyResult(NamedTuple):
    H: jax.Array          # (3, 3) homography x1 ~ H x0 (normalized coords)
    inliers: jax.Array    # (N,) bool
    n_inliers: jax.Array  # () int32


def _four_point_h(x0: jax.Array, x1: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted DLT homography: (..., N, 2) -> (..., 3, 3) with x1 ~ H x0.

    Rows of A per correspondence (u0,v0)->(u1,v1):
      [ -u0 -v0 -1   0   0  0  u1*u0 u1*v0 u1 ]
      [  0   0   0 -u0 -v0 -1  v1*u0 v1*v0 v1 ]
    Solved via QR/SVD on the design matrix (_nullvec — see its docstring
    for why not eigh of A^T A).
    """
    u0, v0 = x0[..., 0], x0[..., 1]
    u1, v1 = x1[..., 0], x1[..., 1]
    one = jnp.ones_like(u0)
    zero = jnp.zeros_like(u0)
    r1 = jnp.stack([-u0, -v0, -one, zero, zero, zero,
                    u1 * u0, u1 * v0, u1], axis=-1)
    r2 = jnp.stack([zero, zero, zero, -u0, -v0, -one,
                    v1 * u0, v1 * v0, v1], axis=-1)
    A = jnp.concatenate([r1 * w[..., None], r2 * w[..., None]], axis=-2)
    h = _nullvec(A)
    return h.reshape(*h.shape[:-1], 3, 3)


def homography_error(H: jax.Array, x0: jax.Array, x1: jax.Array) -> jax.Array:
    """Squared forward transfer error |x1 - H(x0)|^2 in normalized coords."""
    ones = jnp.ones_like(x0[..., :1])
    p0 = jnp.concatenate([x0, ones], axis=-1)
    Hp = jnp.einsum("...ij,...nj->...ni", H, p0)
    z = Hp[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    pred = Hp[..., :2] / z_safe[..., None]
    return jnp.sum((pred - x1) ** 2, axis=-1)



@geometry_jit(static_argnames=("n_hypotheses",))
def estimate_homography(
    x0: jax.Array,      # (N, 2) normalized coords
    x1: jax.Array,
    mask: jax.Array,    # (N,) bool
    rng: jax.Array,
    threshold: float,   # transfer-error threshold (normalized units)
    n_hypotheses: int = 256,
) -> HomographyResult:
    """Batched-hypothesis 4-point homography RANSAC. Used for COLMAP-style
    degenerate-configuration detection: a pair whose correspondences are
    mostly H-consistent is planar or near-pure-rotation, where 8-point E
    estimation silently produces junk (COLMAP TwoViewGeometry model
    selection — SURVEY.md §2.3 L0 geometric-verification contract)."""
    n = x0.shape[0]
    t2 = threshold**2
    gumbel = jax.random.gumbel(rng, (n_hypotheses, n))
    scores = jnp.where(mask[None, :], gumbel, -jnp.inf)
    _, idx = jax.lax.top_k(scores, 4)
    s0, s1 = x0[idx], x1[idx]
    H_h = _four_point_h(s0, s1, jnp.ones(idx.shape, jnp.float32))
    err = homography_error(H_h, x0[None], x1[None])
    # MSAC score (continuous truncated loss): near-tie hypotheses that an
    # integer inlier count cannot separate — the cross-backend chaos driver
    # on planar scenes — get a smooth total ordering.
    msac = jnp.sum(jnp.minimum(err, t2) * mask[None, :], axis=1)
    best = jnp.argmin(msac)
    H_best = H_h[best]
    inl_best = (err[best] < t2) & mask
    msac_best = msac[best]

    # Local optimization to a fixpoint (LO-RANSAC): refit on the current
    # inliers, reclassify, keep if the MSAC score improves. Both backends
    # converge to the same attractor from slightly different hypothesis
    # winners, collapsing f32-rounding divergence — and the iterated refit
    # is more accurate than a single one.
    def lo_round(state, _):
        H_cur, inl_cur, msac_cur = state
        w = inl_cur.astype(jnp.float32) * mask.astype(jnp.float32)
        H_new = _four_point_h(x0, x1, w)
        err_new = homography_error(H_new, x0, x1)
        msac_new = jnp.sum(jnp.minimum(err_new, t2) * mask)
        better = msac_new <= msac_cur
        return (
            jnp.where(better, H_new, H_cur),
            jnp.where(better, (err_new < t2) & mask, inl_cur),
            jnp.where(better, msac_new, msac_cur),
        ), None

    (H_best, inliers, _), _ = jax.lax.scan(
        lo_round, (H_best, inl_best, msac_best), None, length=4)
    return HomographyResult(
        H=H_best, inliers=inliers,
        n_inliers=jnp.sum(inliers.astype(jnp.int32)),
    )


@geometry_jit(static_argnames=("n_hypotheses",))
def estimate_homography_batch(
    x0: jax.Array, x1: jax.Array, mask: jax.Array, rngs: jax.Array,
    thresholds: jax.Array, n_hypotheses: int = 256,
) -> HomographyResult:
    return jax.vmap(
        lambda a, b, m, r, t: estimate_homography(
            a, b, m, r, t, n_hypotheses=n_hypotheses
        )
    )(x0, x1, mask, rngs, thresholds)


@geometry_jit()
def decompose_homography(H: jax.Array, x0: jax.Array, x1: jax.Array,
                         mask: jax.Array, all_mask: jax.Array | None = None):
    """Pose from a normalized-coordinate homography (planar scene):
    H ~ R + t n^T / d. Returns (R, t_unit, n) of the best candidate
    (Malis-Vargas / Faugeras analytic decomposition, the role of COLMAP's
    PoseFromHomographyMatrix for planar init pairs).

    Candidate selection — this was the round-4 "TPU geometry is broken"
    failure (scene_0005 AUC@5 0.02 on TPU vs 0.77 on CPU;
    tools/bisect_geometry_device.py isolated it to this kernel and
    tools/probe_homography_device.py to this exact mechanism):

    * Cheirality votes over the H-INLIERS (`mask`) cannot separate the two
      plane solutions — on-plane points have positive depth under BOTH
      (measured: votes [0, N, N, 0]), and the SVD's per-device-arbitrary
      eigenvector signs swap which solution comes first in the candidate
      list, so a bare argmax picked the good one on CPU and the bad one on
      TPU by luck. Two fixes: eigenvector signs are canonicalized
      (max-|component| entry positive) so candidate order is deterministic
      across backends, and vote ties are broken by the capped Sampson error
      of each candidate's essential matrix over ALL correspondences
      (`all_mask`, defaulting to `mask`) — off-plane true matches satisfy
      only the true solution's epipolar geometry, while outliers saturate
      the cap equally for every candidate.
    * geometry_jit is LOAD-BEARING for accuracy too: eager on a TPU process
      the matmuls here (Hn^T Hn, vote reductions) ran in default-precision
      bf16 passes — a 3e-3 singular-value perturbation that the
      sqrt(1-s3)/sqrt(s1-1) chain amplifies into 10-18 deg of rotation
      error. Under HIGHEST precision every decomposition (eigh/svd) is
      device-parity at f32."""
    if all_mask is None:
        all_mask = mask
    U, S, Vt = jnp.linalg.svd(H)
    H_n = H / S[1]                      # normalize so middle singular value=1
    # Resolve the DLT sign ambiguity: projective H and -H are equivalent but
    # the decomposition needs the sign with positive transfer scale,
    # mean over valid correspondences of p1 . (H p0) > 0 (without it every
    # candidate rotation comes out 180 deg off and cheirality rejects all).
    ones = jnp.ones_like(x0[..., :1])
    p0 = jnp.concatenate([x0, ones], axis=-1)
    p1 = jnp.concatenate([x1, ones], axis=-1)
    dots = jnp.sum(p1 * (p0 @ H_n.T), -1) * mask.astype(H_n.dtype)
    H_n = H_n * jnp.sign(jnp.sum(dots))
    # Work in the frame of H_n^T H_n's eigenvectors
    _, S2, V2t = jnp.linalg.svd(H_n.T @ H_n)
    V2 = V2t.T
    # Canonicalize eigenvector signs (largest-|component| entry positive):
    # SVD sign conventions differ between backends, and v1/v3 signs control
    # which plane solution lands first in the candidate list below.
    comp = jnp.take_along_axis(
        V2, jnp.argmax(jnp.abs(V2), axis=0)[None, :], axis=0)[0]
    V2 = V2 * jnp.where(comp < 0, -1.0, 1.0)[None, :]
    # Restore right-handedness by flipping v2 only: R below is invariant to
    # v2's sign (it flips U1/W1 columns 1 and 3 together) and (t, n) just
    # swaps within the +/- candidate pairs, so the v1/v3 canon is preserved.
    det_sign = jnp.sign(jnp.linalg.det(V2))
    V2 = V2 * jnp.stack(
        [jnp.ones_like(det_sign), det_sign, jnp.ones_like(det_sign)])[None, :]
    s1, s3 = S2[0], S2[2]
    v1, v2, v3 = V2[:, 0], V2[:, 1], V2[:, 2]
    # Degenerate (pure rotation): s1 ~ s3 ~ 1
    denom = jnp.sqrt(jnp.maximum(s1 - s3, 1e-12))
    u1 = (jnp.sqrt(jnp.maximum(1.0 - s3, 0.0)) * v1
          + jnp.sqrt(jnp.maximum(s1 - 1.0, 0.0)) * v3) / denom
    u2 = (jnp.sqrt(jnp.maximum(1.0 - s3, 0.0)) * v1
          - jnp.sqrt(jnp.maximum(s1 - 1.0, 0.0)) * v3) / denom

    def pose_from(u):
        U1 = jnp.stack([v2, u, jnp.cross(v2, u)], axis=1)
        W1 = jnp.stack([H_n @ v2, H_n @ u,
                        jnp.cross(H_n @ v2, H_n @ u)], axis=1)
        R = W1 @ U1.T
        n = jnp.cross(v2, u)
        t = (H_n - R) @ n
        return R, t, n

    cands = []
    for u in (u1, u2):
        R, t, n = pose_from(u)
        cands.append((R, t, n))
        cands.append((R, -t, -n))

    votes = jnp.stack([
        _cheirality_count(R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12),
                          x0, x1, mask)
        for (R, t, n) in cands
    ])
    # Epipolar tie-break over ALL correspondences: each candidate's
    # E = [t]x R is scored by capped Sampson error — off-plane true matches
    # separate the two plane solutions that cheirality cannot (they satisfy
    # only the true epipolar geometry), while outliers hit the cap for
    # every candidate equally.
    def _skew(v):
        zero = jnp.zeros_like(v[0])
        return jnp.stack([zero, -v[2], v[1],
                          v[2], zero, -v[0],
                          -v[1], v[0], zero]).reshape(3, 3)

    cap = 1e-4  # (normalized units)^2; ~4 px at f=1000
    wa = all_mask.astype(H.dtype)
    epi = jnp.stack([
        jnp.sum(jnp.minimum(
            sampson_error(
                _skew(t / jnp.maximum(jnp.linalg.norm(t), 1e-12)) @ R,
                x0, x1), cap) * wa) / jnp.maximum(jnp.sum(wa), 1.0)
        for (R, t, n) in cands
    ])
    # Within 2% of the best vote count => eligible; among those, min error.
    # Compare in FLOAT: flooring 0.98*max_v to int made candidates with up
    # to ~10-20% fewer votes eligible at small inlier counts (review r5).
    max_v = jnp.max(votes)
    eligible = votes.astype(jnp.float32) >= max_v.astype(jnp.float32) * 0.98
    k = jnp.argmax(jnp.where(eligible, -epi, -jnp.inf))
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    ns = jnp.stack([c[2] for c in cands])
    t = ts[k]
    return Rs[k], t / jnp.maximum(jnp.linalg.norm(t), 1e-12), ns[k]


@geometry_jit(static_argnames=("n_hypotheses",))
def estimate_relative_pose_batch(
    x0: jax.Array,          # (B, N, 2)
    x1: jax.Array,          # (B, N, 2)
    mask: jax.Array,        # (B, N)
    rngs: jax.Array,        # (B, 2) PRNG keys
    thresholds: jax.Array,  # (B,) per-row Sampson thresholds
    n_hypotheses: int = 512,
) -> TwoViewResult:
    """Verify a whole bucket of pairs as ONE program: vmapped essential
    RANSAC. Replaces the reference's Ray fan-out of per-pair geometric
    verification (src/coarse_match/coarse_match.py:104-160) — pairs are
    padded to a shared N and the batch shards over the device mesh."""
    return jax.vmap(
        lambda a, b, m, r, t: estimate_relative_pose(
            a, b, m, r, t, n_hypotheses=n_hypotheses
        )
    )(x0, x1, mask, rngs, thresholds)


@geometry_jit(static_argnames=("n_hypotheses",))
def estimate_relative_pose(
    x0: jax.Array,      # (N, 2) normalized coords in view0 (padded)
    x1: jax.Array,      # (N, 2) normalized coords in view1
    mask: jax.Array,    # (N,) bool validity of the padded slots
    rng: jax.Array,     # PRNG key
    threshold: float,   # Sampson threshold in normalized coords
    n_hypotheses: int = 512,
) -> TwoViewResult:
    """Batched-hypothesis essential RANSAC + cheirality pose recovery."""
    n = x0.shape[0]
    w_valid = mask.astype(jnp.float32)

    # --- hypothesis generation: H x 8 random valid samples -----------------
    # Sample indices proportional to the validity mask (invalid rows get -inf
    # Gumbel scores, so they are never picked when >= 8 valid rows exist).
    gumbel = jax.random.gumbel(rng, (n_hypotheses, n))
    scores = jnp.where(mask[None, :], gumbel, -jnp.inf)
    _, idx = jax.lax.top_k(scores, 8)                 # (H, 8)
    s0 = x0[idx]                                       # (H, 8, 2)
    s1 = x1[idx]
    E_h = _eight_point(s0, s1, jnp.ones(idx.shape, jnp.float32))  # (H, 3, 3)

    # --- scoring ------------------------------------------------------------
    t2 = threshold**2
    err = sampson_error(E_h, x0[None], x1[None])       # (H, N)
    # MSAC (continuous truncated loss) instead of integer counts: on
    # degenerate (planar) pairs many hypotheses tie in inlier COUNT and the
    # argmax winner flips with f32 rounding across backends; the smooth
    # score gives a stable total order.
    msac = jnp.sum(jnp.minimum(err, t2) * w_valid[None, :], axis=1)
    best = jnp.argmin(msac)
    E_best = E_h[best]
    inl_best = (err[best] < t2) & mask
    msac_best = msac[best]

    # LO-RANSAC fixpoint: iterated weighted refit + reclassify, accepted
    # only when the MSAC score improves. Collapses cross-backend RANSAC
    # chaos (both devices fall into the same attractor) and beats a single
    # refit on accuracy.
    def lo_round(state, _):
        E_cur, inl_cur, msac_cur = state
        w = inl_cur.astype(jnp.float32) * w_valid
        E_new = _eight_point(x0, x1, w)
        err_new = sampson_error(E_new, x0, x1)
        msac_new = jnp.sum(jnp.minimum(err_new, t2) * w_valid)
        better = msac_new <= msac_cur
        return (
            jnp.where(better, E_new, E_cur),
            jnp.where(better, (err_new < t2) & mask, inl_cur),
            jnp.where(better, msac_new, msac_cur),
        ), None

    (E_best, inliers, _), _ = jax.lax.scan(
        lo_round, (E_best, inl_best, msac_best), None, length=4)

    # --- pose recovery -------------------------------------------------------
    R1, R2, t = decompose_E(E_best)
    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    votes = jnp.stack(
        [_cheirality_count(R, tt, x0, x1, inliers) for R, tt in cands]
    )
    k = jnp.argmax(votes)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    R_best, t_best = Rs[k], ts[k]
    return TwoViewResult(
        E=E_best,
        qvec=rotmat_to_quat(R_best),
        tvec=t_best / jnp.maximum(jnp.linalg.norm(t_best), 1e-12),
        inliers=inliers,
        n_inliers=jnp.sum(inliers.astype(jnp.int32)),
    )
