"""Homography self-supervised coarse-matcher training.

MegaDepth-style depth supervision needs depth maps; this path needs only
images: warp each image with a random homography and supervise the
dual-softmax assignment with the exact cell correspondence the homography
induces (the SuperPoint/homographic-adaptation recipe applied to the
LoFTR-class matcher). It bootstraps working matcher weights from any image
folder — the framework ships no pretrained checkpoints (the reference relies
on an upstream LoFTR download).

All warping is jitted inverse bilinear sampling; one program per image size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def random_homography(
    rng: jax.Array, h: int, w: int,
    max_rotation: float = 0.35,
    max_scale: float = 0.25,
    max_translation: float = 0.15,
    max_perspective: float = 3e-4,
) -> jax.Array:
    """Random 3x3 homography mapping source pixels -> warped pixels, composed
    around the image center so content stays mostly in frame."""
    k = jax.random.split(rng, 5)
    ang = jax.random.uniform(k[0], (), minval=-max_rotation, maxval=max_rotation)
    sc = jnp.exp(jax.random.uniform(k[1], (2,), minval=-max_scale, maxval=max_scale))
    tx = jax.random.uniform(k[2], (), minval=-max_translation, maxval=max_translation) * w
    ty = jax.random.uniform(k[3], (), minval=-max_translation, maxval=max_translation) * h
    p = jax.random.uniform(k[4], (2,), minval=-max_perspective, maxval=max_perspective)
    ca, sa = jnp.cos(ang), jnp.sin(ang)
    A = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    A = A.at[0, 0].set(ca * sc[0]).at[0, 1].set(-sa * sc[0])
    A = A.at[1, 0].set(sa * sc[1]).at[1, 1].set(ca * sc[1])
    A = A.at[0, 2].set(tx).at[1, 2].set(ty)
    A = A.at[2, 0].set(p[0]).at[2, 1].set(p[1])
    # conjugate by center shift
    C = jnp.array([[1.0, 0, -w / 2], [0, 1.0, -h / 2], [0, 0, 1.0]])
    Ci = jnp.array([[1.0, 0, w / 2], [0, 1.0, h / 2], [0, 0, 1.0]])
    return Ci @ A @ C


@functools.partial(jax.jit, static_argnames=())
def warp_image(img: jax.Array, H: jax.Array) -> jax.Array:
    """Inverse-warp (H, W) or (H, W, 1) image by homography H (src->dst):
    out(dst) = img(H^-1 dst). Out-of-frame samples are 0."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w = img.shape[:2]
    Hi = jnp.linalg.inv(H)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    ones = jnp.ones_like(gx)
    src = jnp.einsum("ij,jhw->ihw", Hi, jnp.stack([gx, gy, ones]))
    sx = src[0] / jnp.where(jnp.abs(src[2]) < 1e-9, 1e-9, src[2])
    sy = src[1] / jnp.where(jnp.abs(src[2]) < 1e-9, 1e-9, src[2])
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]
    inside = ((sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1))[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    g = lambda yi, xi: img[yi, xi]
    out = ((g(y0i, x0i) * (1 - wx) + g(y0i, x1i) * wx) * (1 - wy)
           + (g(y1i, x0i) * (1 - wx) + g(y1i, x1i) * wx) * wy)
    out = jnp.where(inside, out, 0.0)
    return out[..., 0] if squeeze else out


@functools.partial(jax.jit, static_argnames=("h", "w", "grid"))
def homography_cell_assignment(
    H: jax.Array, h: int, w: int, grid: int = 8
) -> jax.Array:
    """(L,) int32 GT: source cell (row-major, 1/grid res) -> warped-image
    cell under H, or -1 if the warp leaves the frame."""
    h8, w8 = h // grid, w // grid
    ys = (jnp.arange(h8, dtype=jnp.float32) + 0.5) * grid
    xs = (jnp.arange(w8, dtype=jnp.float32) + 0.5) * grid
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    pts = jnp.stack([gx.reshape(-1), gy.reshape(-1),
                     jnp.ones(h8 * w8, jnp.float32)])
    dst = H @ pts
    z = jnp.where(jnp.abs(dst[2]) < 1e-9, 1e-9, dst[2])
    dx = dst[0] / z
    dy = dst[1] / z
    ok = (dx >= 0) & (dx < w) & (dy >= 0) & (dy < h)
    cell = (jnp.clip((dy // grid).astype(jnp.int32), 0, h8 - 1) * w8
            + jnp.clip((dx // grid).astype(jnp.int32), 0, w8 - 1))
    return jnp.where(ok, cell, -1)


def make_selfsup_batch(images: np.ndarray, rng: jax.Array):
    """images (B, H, W) -> dict(image0, image1, gt) with per-item random
    homographies. gt is (B, L) int32 for coarse_focal_loss."""
    b, h, w = images.shape
    keys = jax.random.split(rng, b)
    Hs = jax.vmap(lambda k: random_homography(k, h, w))(keys)
    warped = jax.vmap(warp_image)(jnp.asarray(images), Hs)
    gt = jax.vmap(lambda Hm: homography_cell_assignment(Hm, h, w))(Hs)
    return {
        "image0": jnp.asarray(images)[..., None],
        "image1": warped[..., None],
        "gt": gt,
    }
