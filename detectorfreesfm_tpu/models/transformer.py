"""Matching transformer blocks (Flax linen).

The encoder-layer contract matches the reference's LoFTREncoderLayer
(third_party/LoFTR/src/loftr/loftr_module/transformer.py and
src/MultiviewMatcher/matcher_module/transformer.py:8): bias-free QKV
projections, linear (elu+1) or masked full attention, a merge projection with
LayerNorm, and a concat-MLP feed-forward with a residual add. The attention
itself lives in ops/attention.py so the same kernels serve both the coarse
matcher and the multiview refiner.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import full_attention, linear_attention


class EncoderLayer(nn.Module):
    d_model: int
    nhead: int
    attention: str = "linear"  # "linear" | "full"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, source, x_mask=None, source_mask=None):
        """x: (B, L, C) queries; source: (B, S, C) keys/values."""
        d, h = self.d_model, self.nhead
        dim = d // h
        dense = lambda feats, name, bias=False: nn.Dense(
            feats, use_bias=bias, dtype=self.dtype, name=name
        )
        q = dense(d, "q_proj")(x).reshape(*x.shape[:2], h, dim)
        k = dense(d, "k_proj")(source).reshape(*source.shape[:2], h, dim)
        v = dense(d, "v_proj")(source).reshape(*source.shape[:2], h, dim)
        attn = linear_attention if self.attention == "linear" else full_attention
        msg = attn(q, k, v, q_mask=x_mask, kv_mask=source_mask)
        msg = msg.reshape(*x.shape[:2], d)
        msg = dense(d, "merge", bias=True)(msg)
        msg = nn.LayerNorm(dtype=self.dtype, name="norm1")(
            jnp.concatenate([x, msg], axis=-1)
        )
        msg = dense(2 * d, "mlp1", bias=True)(msg)
        msg = nn.relu(msg)
        msg = dense(d, "mlp2", bias=True)(msg)
        msg = nn.LayerNorm(dtype=self.dtype, name="norm2")(msg)
        return x + msg


class LocalFeatureTransformer(nn.Module):
    """Alternating self/cross attention over two feature sets."""

    d_model: int = 256
    nhead: int = 8
    layer_names: Sequence[str] = ("self", "cross") * 4
    attention: str = "linear"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat0, feat1, mask0=None, mask1=None):
        """feat0 (B, L, C), feat1 (B, S, C) -> transformed (feat0, feat1)."""
        for i, kind in enumerate(self.layer_names):
            layer = EncoderLayer(
                self.d_model, self.nhead, self.attention, self.dtype,
                name=f"layer_{i}_{kind}",
            )
            if kind == "self":
                feat0 = layer(feat0, feat0, mask0, mask0)
                feat1 = layer(feat1, feat1, mask1, mask1)
            else:
                new0 = layer(feat0, feat1, mask0, mask1)
                new1 = layer(feat1, feat0, mask1, mask0)
                feat0, feat1 = new0, new1
        return feat0, feat1
