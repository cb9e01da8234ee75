"""2D sinusoidal position encoding for coarse feature maps.

Same functional form as the reference coarse matcher's PositionEncodingSine
(third_party/LoFTR/src/loftr/utils/position_encoding.py:6): channel groups of
(sin x, cos x, sin y, cos y) at geometrically spaced frequencies. Computed
once per static shape and fused into the feature add by XLA.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _pe_table(d_model: int, h: int, w: int, temp_bug_fix: bool = True):
    """(h, w, d_model) float32 numpy table (host-computed once, cached).

    Must stay a *numpy* array: a jnp constant created inside one jit trace
    and cached would leak that trace's tracer into every later trace
    (UnexpectedTracerError on the second jitted scene of an eval run)."""
    pe = np.zeros((d_model, h, w), dtype=np.float32)
    y = np.arange(h, dtype=np.float32)[:, None] * np.ones((1, w), np.float32)
    x = np.arange(w, dtype=np.float32)[None, :] * np.ones((h, 1), np.float32)
    d4 = d_model // 4
    if temp_bug_fix:
        div = np.exp(
            np.arange(0, d4, 1, dtype=np.float32)
            * (-np.log(10000.0) / (d4 - 1 if d4 > 1 else 1))
        )
    else:
        div = np.exp(
            np.arange(0, d4, 1, dtype=np.float32) * (-np.log(10000.0) / d4)
        )
    div = div[:, None, None]
    pe[0::4] = np.sin(x[None] * div)
    pe[1::4] = np.cos(x[None] * div)
    pe[2::4] = np.sin(y[None] * div)
    pe[3::4] = np.cos(y[None] * div)
    return np.ascontiguousarray(np.transpose(pe, (1, 2, 0)))  # (h, w, d)


def add_position_encoding(feat: jnp.ndarray) -> jnp.ndarray:
    """feat (B, H, W, C) -> feat + PE, same dtype."""
    b, h, w, c = feat.shape
    pe = jnp.asarray(_pe_table(c, h, w), dtype=feat.dtype)
    return feat + pe[None]
