"""Differentiable spatial-to-numerical transform (soft-argmax) with variance.

Covers the role of kornia's spatial_expectation2d + the std computation in the
reference's fine matching (src/MultiviewMatcher/utils/fine_matching.py:258-284
and third_party LoFTR fine_matching.py:43-57): a softmax heatmap over a local
window is reduced to its expected (x, y) coordinate and the total positional
standard deviation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def heatmap_softmax(scores: jax.Array, temperature: float = 1.0) -> jax.Array:
    """Softmax over the last two (spatial) dims, float32 internally."""
    shape = scores.shape
    flat = scores.reshape(shape[:-2] + (-1,)).astype(jnp.float32)
    p = jax.nn.softmax(flat / temperature, axis=-1)
    return p.reshape(shape)


def normalized_grid(h: int, w: int, dtype=jnp.float32):
    """Coordinate grids in [-1, 1] (x over width, y over height)."""
    xs = jnp.linspace(-1.0, 1.0, w, dtype=dtype)
    ys = jnp.linspace(-1.0, 1.0, h, dtype=dtype)
    return jnp.meshgrid(xs, ys, indexing="xy")  # each (h, w)


def spatial_expectation2d(heatmap: jax.Array, normalized: bool = True):
    """Expected coordinate of (..., H, W) probability maps.

    Returns (..., 2) as (x, y), in [-1, 1] if normalized else pixel units
    (0 .. W-1 / H-1).
    """
    h, w = heatmap.shape[-2:]
    gx, gy = normalized_grid(h, w, heatmap.dtype)
    if not normalized:
        gx = (gx + 1.0) * 0.5 * (w - 1)
        gy = (gy + 1.0) * 0.5 * (h - 1)
    ex = jnp.sum(heatmap * gx, axis=(-2, -1))
    ey = jnp.sum(heatmap * gy, axis=(-2, -1))
    return jnp.stack([ex, ey], axis=-1)


def spatial_expectation_with_std(heatmap: jax.Array, normalized: bool = True):
    """Expectation plus total std: sqrt(Var[x] + Var[y]).

    The std is what the multiview fine matcher uses both to weight its loss
    (1/std) and to pick the best reference-point candidate (smallest mean std).
    """
    h, w = heatmap.shape[-2:]
    gx, gy = normalized_grid(h, w, heatmap.dtype)
    if not normalized:
        gx = (gx + 1.0) * 0.5 * (w - 1)
        gy = (gy + 1.0) * 0.5 * (h - 1)
    ex = jnp.sum(heatmap * gx, axis=(-2, -1))
    ey = jnp.sum(heatmap * gy, axis=(-2, -1))
    ex2 = jnp.sum(heatmap * gx * gx, axis=(-2, -1))
    ey2 = jnp.sum(heatmap * gy * gy, axis=(-2, -1))
    var = jnp.clip(ex2 - ex * ex, 0.0) + jnp.clip(ey2 - ey * ey, 0.0)
    std = jnp.sqrt(var + 1e-12)
    return jnp.stack([ex, ey], axis=-1), std


def soft_argmax_refine(
    correlation: jax.Array, temperature: float = 1.0, normalized: bool = True
):
    """correlation (..., H, W) raw scores -> (coords (..., 2), std (...,))."""
    p = heatmap_softmax(correlation, temperature)
    return spatial_expectation_with_std(p, normalized=normalized)
