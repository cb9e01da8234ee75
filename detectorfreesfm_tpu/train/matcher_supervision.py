"""Coarse-matching ground truth: depth-warped cell assignment for a pair.

The LoFTR-family coarse supervision (the reference ships LoFTR pretrained
with exactly this objective; its own training code is upstream): each 8-px
cell center of image0 with valid depth warps into image1; the landing cell
is the positive column for that row of the dual-softmax matrix, rows that
fail depth/cycle/border checks get -1 (unmatched). One jitted program per
image-shape bucket; feeds train.losses.coarse_focal_loss.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.geometry import quat_to_rotmat
from .supervision import _bilinear_depth


@functools.partial(jax.jit, static_argnames=("grid",))
def pair_cell_assignment(
    depth0: jax.Array,  # (H, W)
    depth1: jax.Array,  # (H, W)
    K0: jax.Array, K1: jax.Array,          # (3, 3)
    q0: jax.Array, t0: jax.Array,          # world->cam0
    q1: jax.Array, t1: jax.Array,          # world->cam1
    grid: int = 8,
    depth_consistency: float = 0.05,
    cycle_thr_px: float = 4.0,
) -> jax.Array:
    """Returns (L,) int32: for each img0 cell (row-major on the 1/8 grid),
    the img1 cell index of its warp target, or -1."""
    h, w = depth0.shape
    h8, w8 = h // grid, w // grid
    # Source points are the GRID POINTS the matcher actually reports as
    # keypoints (cell * grid, models/loftr.py to_xy) — NOT cell centers.
    # Round-4 measured the fine head DEGRADING coordinates; one cause was
    # supervising the warp of centers (c+0.5)*8 while inference pairs the
    # fine delta with the corner keypoint 8c: a locally-smooth warp turns
    # that half-cell source offset into a systematic ~4 px target bias.
    ys = jnp.arange(h8, dtype=jnp.float32) * grid
    xs = jnp.arange(w8, dtype=jnp.float32) * grid
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    pts = jnp.stack([gx, gy], -1).reshape(-1, 2)            # (L, 2)

    d0 = _bilinear_depth(depth0, pts)
    ok = d0 > 1e-6
    R0 = quat_to_rotmat(q0)
    R1 = quat_to_rotmat(q1)
    xy_n = (pts - jnp.array([K0[0, 2], K0[1, 2]])) / jnp.array(
        [K0[0, 0], K0[1, 1]]
    )
    Xc0 = jnp.concatenate([xy_n * d0[:, None], d0[:, None]], -1)
    # HIGHEST precision: axon's default bf16 MXU pass shifts warped coords
    # by up to ~5 px at 512-px scale (see train/supervision.py)
    hp = jax.lax.Precision.HIGHEST
    Xw = jnp.einsum("lj,jk->lk", Xc0 - t0, R0, precision=hp)
    Xc1 = jnp.einsum("lj,kj->lk", Xw, R1, precision=hp) + t1
    z1 = Xc1[..., 2]
    ok &= z1 > 1e-6
    z_safe = jnp.where(jnp.abs(z1) < 1e-9, 1e-9, z1)
    uv1 = Xc1[..., :2] / z_safe[..., None] * jnp.array(
        [K1[0, 0], K1[1, 1]]
    ) + jnp.array([K1[0, 2], K1[1, 2]])

    ok &= (
        (uv1[..., 0] >= 0) & (uv1[..., 0] < w)
        & (uv1[..., 1] >= 0) & (uv1[..., 1] < h)
    )
    d1 = _bilinear_depth(depth1, uv1)
    ok &= (d1 > 1e-6) & (
        jnp.abs(d1 - z1) / jnp.maximum(z1, 1e-9) < depth_consistency
    )
    # Cycle check: unproject with sampled depth, reproject to img0
    xy1_n = (uv1 - jnp.array([K1[0, 2], K1[1, 2]])) / jnp.array(
        [K1[0, 0], K1[1, 1]]
    )
    Xc1b = jnp.concatenate([xy1_n * d1[:, None], d1[:, None]], -1)
    Xwb = jnp.einsum("lj,jk->lk", Xc1b - t1, R1, precision=hp)
    Xc0b = jnp.einsum("lj,kj->lk", Xwb, R0, precision=hp) + t0
    z0b = jnp.where(jnp.abs(Xc0b[..., 2]) < 1e-9, 1e-9, Xc0b[..., 2])
    uv0b = Xc0b[..., :2] / z0b[..., None] * jnp.array(
        [K0[0, 0], K0[1, 1]]
    ) + jnp.array([K0[0, 2], K0[1, 2]])
    ok &= jnp.linalg.norm(uv0b - pts, axis=-1) < cycle_thr_px

    # NEAREST grid point (reference spvs_coarse rounds w_pt / 8), not floor:
    # with floor the sub-cell residual lives in [0, grid) while the fine
    # window inference runs is CENTERED on the grid point with reach
    # +/- grid/2 — half the true offsets were unreachable and the training
    # mask |off| < 1 silently dropped most supervision.
    cell_x = jnp.clip(
        jnp.floor(uv1[..., 0] / grid + 0.5).astype(jnp.int32), 0, w8 - 1)
    cell_y = jnp.clip(
        jnp.floor(uv1[..., 1] / grid + 0.5).astype(jnp.int32), 0, h8 - 1)
    gt = cell_y * w8 + cell_x
    # Also return the CONTINUOUS warp target — the fine-stage GT (the
    # reference's spvs_fine supervises the sub-cell residual of this warp,
    # third_party/LoFTR/src/loftr/utils/supervision.py).
    return jnp.where(ok, gt, -1), jnp.where(ok[:, None], uv1, 0.0)
