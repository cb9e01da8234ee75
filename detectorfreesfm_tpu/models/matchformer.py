"""MatchFormer-class coarse matcher: attention-in-backbone extract-and-match.

Capability match for the reference's third alternative matcher
(third_party/MatchFormer/model/ — SEA/LA variants): instead of a CNN
backbone followed by a matching transformer, the hierarchical backbone
itself interleaves self- and cross-attention between the two images at every
stage ("extract-and-match"), then dual-softmax matching runs on the final
1/8 features. Like the reference's, it requires both images of a pair to
share one padded frame size (src/coarse_match/coarse_match.py:88-90).

TPU-first: stages are conv patch-embeds + PVT-style *spatially-reduced*
attention (keys/values average-pooled by a reduction ratio) so every
attention is a dense (N x N/r^2) MXU matmul with static shapes; cross and
self attention alternate inside each stage exactly where the reference's
interleaving puts them.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dual_softmax import (
    border_mask,
    dual_softmax_confidence,
    extract_topk_matches,
)
from .loftr import MatchOutput, MatcherConfig
from .position_encoding import add_position_encoding


@dataclasses.dataclass(frozen=True)
class MatchFormerConfig(MatcherConfig):
    stage_dims: tuple = (64, 128, 256)   # strides 2, 4, 8
    stage_blocks: tuple = (1, 2, 2)      # (self, cross) pairs per stage
    sr_ratios: tuple = (8, 4, 2)         # K/V spatial reduction per stage


class SRAttention(nn.Module):
    """PVT-style attention with spatially-reduced keys/values."""

    dim: int
    nhead: int
    sr_ratio: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, source_map):
        """x: (B, N, C) queries; source_map: (B, H, W, C) K/V feature map
        (pass x's own map for self-attention, the sibling's for cross)."""
        b, n, c = x.shape
        hn, dim = self.nhead, self.dim // self.nhead
        dense = lambda f, name: nn.Dense(f, use_bias=False, dtype=self.dtype,
                                         name=name)
        if self.sr_ratio > 1:
            kv = nn.avg_pool(
                source_map, (self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio),
            )
        else:
            kv = source_map
        kv = kv.reshape(b, -1, c)
        q = dense(self.dim, "q")(x).reshape(b, n, hn, dim)
        k = dense(self.dim, "k")(kv).reshape(b, -1, hn, dim)
        v = dense(self.dim, "v")(kv).reshape(b, -1, hn, dim)
        scale = 1.0 / jnp.sqrt(jnp.asarray(dim, jnp.float32))

        def _attend(qc):
            # (B, NC, HN, D) query chunk -> (B, NC, HN, D)
            logits = jnp.einsum(
                "bnhd,bmhd->bhnm", qc, k,
                preferred_element_type=jnp.float32,
            ) * scale
            attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            return jnp.einsum("bhnm,bmhd->bnhd", attn, v)

        # Chunk queries so the (B, HN, N, M) logits never materialize at
        # stage-0 resolution: at 512 px the full tensor is 8x8x65536x1024
        # f32 = 16 GB and OOMs HBM during training (measured round 4,
        # train_alt_matchers matchformer). lax.map over static query
        # chunks keeps memory at O(chunk x M) with identical math — the
        # per-row softmax touches only its own row. jax.checkpoint makes
        # the BACKWARD recompute each chunk's logits instead of saving
        # them (without it autodiff stores every chunk's (B, HN, NC, M)
        # residuals — the same 16 GB, just sliced).
        _attend = jax.checkpoint(_attend)
        chunk = 4096
        if n > chunk:
            n_pad = ((n + chunk - 1) // chunk) * chunk
            qp = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, 0), (0, 0)))
            qc = jnp.moveaxis(
                qp.reshape(b, n_pad // chunk, chunk, hn, dim), 1, 0)
            oc = jax.lax.map(_attend, qc)
            out = jnp.moveaxis(oc, 0, 1).reshape(b, n_pad, hn, dim)[:, :n]
        else:
            out = _attend(q)
        out = out.reshape(b, n, self.dim)
        out = nn.Dense(self.dim, use_bias=True, dtype=self.dtype,
                       name="proj")(out)
        y = nn.LayerNorm(dtype=self.dtype, name="ln")(x + out)
        h = nn.Dense(self.dim * 2, dtype=self.dtype, name="mlp1")(y)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp2")(h)
        return nn.LayerNorm(dtype=self.dtype, name="ln2")(y + h)


class MatchFormerMatcher(nn.Module):
    """Extract-and-match hierarchical matcher; DetectorFreeMatcher interface."""

    cfg: MatchFormerConfig = MatchFormerConfig()

    @nn.compact
    def __call__(self, image0, image1, valid_hw0=None, valid_hw1=None,
                 train: bool = False,
                 return_conf: bool = False) -> MatchOutput:
        cfg = self.cfg
        b, h, wd = image0.shape[:3]
        x0 = image0.astype(cfg.dtype)
        x1 = image1.astype(cfg.dtype)
        stride = 1
        for si, (dims, blocks, sr) in enumerate(
            zip(cfg.stage_dims, cfg.stage_blocks, cfg.sr_ratios)
        ):
            embed = nn.Conv(dims, (3, 3), strides=(2, 2), padding=1,
                            dtype=cfg.dtype, name=f"embed{si}")
            x0 = embed(x0)
            x1 = embed(x1)
            stride *= 2
            hs, ws = x0.shape[1:3]
            # Position encoding feeds the ATTENTION at each stage (the
            # reference interleaves positional information through the
            # backbone) — it must NOT touch the matching features directly:
            # round-5 found PE added right before the dual-softmax, which
            # injects a content-independent position-similarity term into
            # the logits (same-position bias for arbitrary camera motion)
            # and left the model unable to learn (loss flat at chance for
            # 4 epochs, gradient collapse on an overfit probe).
            x0 = add_position_encoding(x0)
            x1 = add_position_encoding(x1)
            f0 = x0.reshape(b, hs * ws, dims)
            f1 = x1.reshape(b, hs * ws, dims)
            for bi in range(blocks):
                sa = SRAttention(dims, cfg.nhead, sr, cfg.dtype,
                                 name=f"s{si}_b{bi}_self")
                f0 = sa(f0, f0.reshape(b, hs, ws, dims))
                f1 = sa(f1, f1.reshape(b, hs, ws, dims))
                ca = SRAttention(dims, cfg.nhead, sr, cfg.dtype,
                                 name=f"s{si}_b{bi}_cross")
                n0 = ca(f0, f1.reshape(b, hs, ws, dims))
                n1 = ca(f1, f0.reshape(b, hs, ws, dims))
                f0, f1 = n0, n1
            x0 = f0.reshape(b, hs, ws, dims)
            x1 = f1.reshape(b, hs, ws, dims)

        h8, w8 = x0.shape[1:3]
        c0 = x0.reshape(b, h8 * w8, cfg.stage_dims[-1])
        c1 = x1.reshape(b, h8 * w8, cfg.stage_dims[-1])

        def grid_valid(valid_hw):
            if valid_hw is None:
                m = border_mask(h8, w8, cfg.border)
                return jnp.broadcast_to(m[None], (b, h8 * w8))
            vs = valid_hw // 8
            return jax.vmap(
                lambda v: border_mask(h8, w8, cfg.border, v[0], v[1])
            )(vs)

        mask0 = grid_valid(valid_hw0)
        mask1 = grid_valid(valid_hw1)
        conf = dual_softmax_confidence(
            c0.astype(jnp.float32), c1.astype(jnp.float32),
            mask0, mask1, cfg.dsoftmax_temperature,
        )
        matches = extract_topk_matches(conf, cfg.match_threshold, cfg.max_matches)

        def to_xy(idx):
            return jnp.stack(
                [(idx % w8).astype(jnp.float32) * 8.0,
                 (idx // w8).astype(jnp.float32) * 8.0], axis=-1,
            )

        out = MatchOutput(
            to_xy(matches.idx0), to_xy(matches.idx1), matches.conf, matches.valid
        )
        if return_conf:  # dense conf for supervised training (focal loss)
            return out, conf
        return out
