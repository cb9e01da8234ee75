"""RoI-align / crop-and-resize on feature maps, as one batched XLA gather.

TPU-native replacement for the reference's C++/CUDA RoIAlign.pytorch extension
(SURVEY.md §2.3; call sites src/MultiviewMatcher/matcher_module/
fine_preprocess.py:4,17,113 and backbone/S2DNet/s2dnet.py:186-205): bilinear
sampling of fixed-size windows at fractional box coordinates, with
crop-and-resize (transform_fpcoor=False) corner semantics.

Design: sample coordinates for all boxes are materialized as (N, oh*ow)
index/weight tensors and the interpolation is 4 gathers + a weighted sum —
fully static shapes, differentiable, vmappable, and shard_map-friendly (each
device gathers only from its local feature shard).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_gather(feat: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample feat (H, W, C) at float coords ys/xs (...,) -> (..., C).

    Out-of-range coordinates clamp to the edge (same as the CUDA kernel's
    boundary handling for sampling points inside a clipped box).
    """
    h, w = feat.shape[0], feat.shape[1]
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    flat = feat.reshape(h * w, -1)

    def g(yi, xi):
        return jnp.take(flat, yi * w + xi, axis=0)

    top = g(y0i, x0i) * (1 - wx) + g(y0i, x1i) * wx
    bot = g(y1i, x0i) * (1 - wx) + g(y1i, x1i) * wx
    return top * (1 - wy) + bot * wy


def crop_and_resize(
    features: jax.Array,
    boxes: jax.Array,
    box_image_idx: jax.Array,
    out_size: tuple,
) -> jax.Array:
    """Crop boxes from a batch of feature maps and resize bilinearly.

    Args:
      features: (B, H, W, C).
      boxes: (N, 4) as (x0, y0, x1, y1) in feature-map pixel coordinates.
      box_image_idx: (N,) int — which batch element each box reads from.
      out_size: (oh, ow) static output resolution.

    Returns: (N, oh, ow, C), dtype of features.
    """
    oh, ow = out_size
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    # crop_and_resize corner semantics: edge samples land on box corners
    fy = jnp.linspace(0.0, 1.0, oh, dtype=jnp.float32)
    fx = jnp.linspace(0.0, 1.0, ow, dtype=jnp.float32)
    ys = y0[:, None] + fy[None, :] * (y1 - y0)[:, None]  # (N, oh)
    xs = x0[:, None] + fx[None, :] * (x1 - x0)[:, None]  # (N, ow)
    ys = jnp.broadcast_to(ys[:, :, None], (len(boxes), oh, ow))
    xs = jnp.broadcast_to(xs[:, None, :], (len(boxes), oh, ow))
    per_box_feat = jnp.take(features, box_image_idx, axis=0)  # (N, H, W, C)
    return jax.vmap(_bilinear_gather)(per_box_feat, ys, xs)


def extract_patches(
    features: jax.Array,
    centers: jax.Array,
    image_idx: jax.Array,
    patch_size: int,
    scales: jax.Array | None = None,
) -> jax.Array:
    """Fixed-size windows centered at fractional points.

    The multiview matcher's crop primitive: window of `patch_size` samples on
    a unit-spaced grid centered at each point, optionally dilated per-point by
    `scales` (the refiner's scale-aligned crops, s2dnet.py:177-205).

    Args:
      features: (B, H, W, C); centers: (N, 2) as (x, y); image_idx: (N,).
      scales: optional (N,) per-point sampling-step multiplier.
    Returns: (N, patch_size, patch_size, C).
    """
    n = centers.shape[0]
    b, h, w, c = features.shape
    half = (patch_size - 1) / 2.0
    offs = jnp.arange(patch_size, dtype=jnp.float32) - half
    step = jnp.ones((n,), jnp.float32) if scales is None else scales.astype(jnp.float32)
    ys = centers[:, 1:2] + offs[None, :] * step[:, None]  # (N, P)
    xs = centers[:, 0:1] + offs[None, :] * step[:, None]
    ys = jnp.broadcast_to(ys[:, :, None], (n, patch_size, patch_size))
    xs = jnp.broadcast_to(xs[:, None, :], (n, patch_size, patch_size))
    # Flat global gather (index = img*H*W + y*W + x): never materializes a
    # per-node copy of its image — (N, H, W, C) at refiner scale would be
    # tens of GB for a (2000 tracks x 16 views) bag of 832px images.
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    base = (image_idx.astype(jnp.int32) * (h * w))[:, None, None]
    flat = features.reshape(b * h * w, c)

    def g(yi, xi):
        return jnp.take(flat, base + yi * w + xi, axis=0)

    top = g(y0i, x0i) * (1 - wx) + g(y0i, x1i) * wx
    bot = g(y1i, x0i) * (1 - wx) + g(y1i, x1i) * wx
    return top * (1 - wy) + bot * wy
