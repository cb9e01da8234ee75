"""On-the-fly ground-truth track generation by depth warping.

Behavior contract from the reference's supervision generator
(src/refinement_models/utils/supervision.py:26-217 + utils/geometry.py:25-176
warp_source_views): 8-px grid points on the reference view are unprojected
with its depth map, warped into every other view, and kept when they pass
depth-consistency, cycle-reprojection and border checks; tracks visible in at
least n_views - tolerance views are sampled to a fixed count per instance,
and the *input* reference/query points are perturbed (grid rounding + pixel
jitter + scale jitter) so the refiner learns to undo coarse-matching noise.

TPU-first: everything is one jitted static-shape program over the (V, H, W)
tuple — candidate grid of G points, (G, V) visibility masks, top-K track
selection — no Python loops over tracks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.geometry import quat_to_rotmat


class SupervisionBatch(NamedTuple):
    """Refiner inputs + targets for one image tuple (track dim T)."""

    node_img: jax.Array    # (T, V) int32 — view index (0 = reference)
    node_xy: jax.Array     # (T, V, 2) perturbed input coordinates
    node_scale: jax.Array  # (T, V) relative scale (f/depth ratio)
    node_mask: jax.Array   # (T, V) bool
    gt_xy: jax.Array       # (T, V, 2) ground-truth warped coordinates
    track_valid: jax.Array # (T,) bool — live (non-padded) tracks


def _bilinear_depth(depth: jax.Array, xy: jax.Array) -> jax.Array:
    """Sample (H, W) depth at (..., 2) float coords; 0 = invalid."""
    h, w = depth.shape
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    wx = x - x0
    wy = y - y0
    d00 = depth[y0, x0]
    d01 = depth[y0, x1]
    d10 = depth[y1, x0]
    d11 = depth[y1, x1]
    # Invalid (zero) neighbors poison the sample -> nearest-valid behavior by
    # falling back to the nearest-neighbor depth when any neighbor is 0
    bil = (d00 * (1 - wx) + d01 * wx) * (1 - wy) + (d10 * (1 - wx) + d11 * wx) * wy
    nn = depth[jnp.clip(jnp.round(y).astype(jnp.int32), 0, h - 1),
               jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)]
    any_zero = (d00 <= 0) | (d01 <= 0) | (d10 <= 0) | (d11 <= 0)
    return jnp.where(any_zero, nn, bil)


@functools.partial(
    jax.jit, static_argnames=("grid_step", "n_tracks", "visibility_tolerance")
)
def generate_tracks(
    depths: jax.Array,      # (V, H, W) float; 0 = no depth
    K: jax.Array,           # (V, 3, 3)
    qvec: jax.Array,        # (V, 4) world->cam
    tvec: jax.Array,        # (V, 3)
    rng: jax.Array,
    grid_step: int = 8,
    n_tracks: int = 200,
    visibility_tolerance: int = 3,
    depth_consistency: float = 0.05,
    cycle_thr_px: float = 3.0,
    border: int = 8,
    jitter_px: float = 2.0,
    scale_jitter: float = 0.2,
) -> SupervisionBatch:
    """View 0 is the reference; returns n_tracks padded tracks."""
    v, h, w = depths.shape
    R = quat_to_rotmat(qvec)            # (V, 3, 3)
    Rt = jnp.swapaxes(R, -1, -2)

    # Reference grid points (cell centers every grid_step px)
    gy = jnp.arange(grid_step // 2, h - grid_step // 2 + 1, grid_step)
    gx = jnp.arange(grid_step // 2, w - grid_step // 2 + 1, grid_step)
    gxx, gyy = jnp.meshgrid(gx, gy, indexing="xy")
    pts0 = jnp.stack([gxx, gyy], -1).reshape(-1, 2).astype(jnp.float32)  # (G, 2)
    g = pts0.shape[0]

    d0 = _bilinear_depth(depths[0], pts0)                   # (G,)
    has_depth = d0 > 1e-6

    # Unproject into world via view 0
    K0 = K[0]
    xy_n = (pts0 - jnp.array([K0[0, 2], K0[1, 2]])) / jnp.array(
        [K0[0, 0], K0[1, 1]]
    )
    X_cam0 = jnp.concatenate([xy_n * d0[:, None], d0[:, None]], -1)
    # All warp matmuls pin HIGHEST precision: the axon TPU runs f32 MXU ops
    # in bf16 passes by default, which shifts warped coords by several px
    # and silently fails every 3-px cycle check (loss == 0 exactly).
    hp = jax.lax.Precision.HIGHEST
    X_w = jnp.einsum("gj,jk->gk", X_cam0 - tvec[0], R[0],
                     precision=hp)                      # R0^T (Xc - t0)

    # Warp into every view
    Xc = jnp.einsum("vij,gj->vgi", R, X_w,
                precision=hp) + tvec[:, None, :]        # (V, G, 3)
    z = Xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    uv = Xc[..., :2] / z_safe[..., None]
    fx = K[:, 0, 0][:, None]
    fy = K[:, 1, 1][:, None]
    cx = K[:, 0, 2][:, None]
    cy = K[:, 1, 2][:, None]
    px = jnp.stack([uv[..., 0] * fx + cx, uv[..., 1] * fy + cy], -1)  # (V, G, 2)

    # Checks per view
    in_border = (
        (px[..., 0] >= border) & (px[..., 0] < w - border)
        & (px[..., 1] >= border) & (px[..., 1] < h - border)
    )
    d_sampled = jax.vmap(_bilinear_depth)(depths, px)         # (V, G)
    depth_ok = (
        (d_sampled > 1e-6)
        & (jnp.abs(d_sampled - z) / jnp.maximum(z, 1e-9) < depth_consistency)
    )
    # Cycle: unproject with the sampled source depth, reproject into view 0
    xy_src = (px - jnp.stack([cx, cy], -1)) / jnp.stack([fx, fy], -1)
    Xc_src = jnp.concatenate(
        [xy_src * d_sampled[..., None], d_sampled[..., None]], -1
    )
    X_w2 = jnp.einsum("vij,vgj->vgi", Rt, Xc_src - tvec[:, None, :],
                  precision=hp)
    Xc0 = jnp.einsum("ij,vgj->vgi", R[0], X_w2, precision=hp) + tvec[0]
    z0b = jnp.where(jnp.abs(Xc0[..., 2]) < 1e-9, 1e-9, Xc0[..., 2])
    px0 = Xc0[..., :2] / z0b[..., None] * jnp.array(
        [K0[0, 0], K0[1, 1]]
    ) + jnp.array([K0[0, 2], K0[1, 2]])
    cycle_ok = jnp.linalg.norm(px0 - pts0[None], axis=-1) < cycle_thr_px

    visible = in_border & depth_ok & cycle_ok & (z > 1e-6) & has_depth[None]
    visible = visible.at[0].set(has_depth)                    # ref always "visible"

    # Track selection: need >= V - tolerance visible views (ref included)
    vis_count = jnp.sum(visible.astype(jnp.int32), axis=0)    # (G,)
    ok = vis_count >= jnp.maximum(v - visibility_tolerance, 2)
    # Randomized top-K over eligible candidates (grid may hold fewer than
    # n_tracks candidates on tiny images — clamp and pad)
    r_sel, r_j0, r_j1, r_sc, r_grid = jax.random.split(rng, 5)
    score = jnp.where(ok, jax.random.uniform(r_sel, (g,)), -1.0)
    k = min(n_tracks, g)
    _, sel = jax.lax.top_k(score, k)
    if k < n_tracks:
        sel = jnp.concatenate([sel, jnp.zeros(n_tracks - k, sel.dtype)])
    track_valid = (score[sel] > 0.0) & (
        jnp.arange(n_tracks) < k
    )

    vis_sel = visible[:, sel].T                                # (T, V)
    gt = jnp.swapaxes(px[:, sel], 0, 1)                        # (T, V, 2)

    # Input perturbation: round ref to grid + jitter; queries jittered
    ref_gt = gt[:, 0]
    ref_in = (
        jnp.round(ref_gt / grid_step) * grid_step
        + jax.random.uniform(r_grid, ref_gt.shape, minval=-1.0, maxval=1.0)
    )
    q_in = gt[:, 1:] + jax.random.uniform(
        r_j0, gt[:, 1:].shape, minval=-jitter_px, maxval=jitter_px
    )
    node_xy = jnp.concatenate([ref_in[:, None], q_in], axis=1)

    # Scales: f/depth ratios relative to the reference node
    f_mean = (K[:, 0, 0] + K[:, 1, 1]) * 0.5                   # (V,)
    depth_nodes = jnp.swapaxes(z[:, sel], 0, 1)                # (T, V)
    depth_nodes = jnp.maximum(depth_nodes, 1e-6)
    s = f_mean[None, :] / depth_nodes
    rel = s / jnp.maximum(s[:, 0:1], 1e-9)
    rel = rel * jnp.exp(jax.random.uniform(
        r_sc, rel.shape, minval=-scale_jitter, maxval=scale_jitter
    ))
    rel = rel.at[:, 0].set(1.0)

    node_img = jnp.broadcast_to(
        jnp.arange(v, dtype=jnp.int32)[None], (n_tracks, v)
    )
    node_mask = vis_sel & track_valid[:, None]
    return SupervisionBatch(
        node_img=node_img,
        node_xy=node_xy.astype(jnp.float32),
        node_scale=rel.astype(jnp.float32),
        node_mask=node_mask,
        gt_xy=gt.astype(jnp.float32),
        track_valid=track_valid,
    )
