"""ASpanFormer-class coarse matcher: flow-guided adaptive-span attention.

Capability match for the reference's alternative matcher
(third_party/aspantransformer/src/ASpanFormer/aspanformer.py:23 —
LocalFeatureTransformer_Flow): instead of global cross-attention, each
cross layer first regresses a coarse *flow* (where each cell lands in the
other image) + uncertainty, then attends only within a local window around
the flow target. Same I/O contract as the LoFTR-class matcher (mkpts0/1 +
conf via dual-softmax mutual-NN top-K).

TPU-first: the adaptive span becomes a *static* (2r+1)^2 window gather
(ops/roi_align-style bilinear index gathers on the 1/8 grid) — variable
spans are replaced by a fixed span with flow-predicted centers, keeping one
compiled program per shape bucket while preserving the flow-guided locality
that makes ASpan robust on wide-baseline pairs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dual_softmax import dual_softmax_confidence, extract_topk_matches
from .backbone import ResNetFPN_8_2
from .loftr import MatchOutput, MatcherConfig
from .position_encoding import add_position_encoding
from .transformer import EncoderLayer


@dataclasses.dataclass(frozen=True)
class ASpanConfig(MatcherConfig):
    span_radius: int = 2          # (2r+1)^2 attended cells around flow target
    n_flow_layers: int = 4        # flow-guided (self, cross) pairs


class FlowCrossAttention(nn.Module):
    """Cross-attention restricted to a flow-centered (2r+1)^2 window."""

    d_model: int
    nhead: int
    radius: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, source, hw, flow):
        """x: (B, L, C) queries on an (h, w) grid; source: (B, L, C) on the
        same grid; flow: (B, L, 2) predicted (dx_col, dy_row) cell offsets."""
        b, l, c = x.shape
        h, w = hw
        r = self.radius
        k = 2 * r + 1

        cols = jnp.arange(l, dtype=jnp.float32) % w
        rows = jnp.arange(l, dtype=jnp.float32) // w
        cx = jnp.clip(cols[None] + flow[..., 0], 0, w - 1)   # (B, L)
        cy = jnp.clip(rows[None] + flow[..., 1], 0, h - 1)
        offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
        # Nearest-cell window indices (k*k) per query
        gx = jnp.clip(jnp.round(cx[..., None, None] + offs[None, None, None, :]), 0, w - 1)
        gy = jnp.clip(jnp.round(cy[..., None, None] + offs[None, None, :, None]), 0, h - 1)
        lin = (gy * w + gx).astype(jnp.int32).reshape(b, l, k * k)

        def gather(src_b, lin_b):
            return jnp.take(src_b, lin_b.reshape(-1), axis=0).reshape(l, k * k, c)

        win = jax.vmap(gather)(source, lin)                  # (B, L, K2, C)

        d = self.d_model
        hn = self.nhead
        dim = d // hn
        dense = lambda feats, name, bias=False: nn.Dense(
            feats, use_bias=bias, dtype=self.dtype, name=name
        )
        q = dense(d, "q_proj")(x).reshape(b, l, 1, hn, dim)
        kk = dense(d, "k_proj")(win).reshape(b, l, k * k, hn, dim)
        v = dense(d, "v_proj")(win).reshape(b, l, k * k, hn, dim)
        logits = jnp.einsum(
            "blohd,blkhd->blhk", q, kk, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.asarray(dim, jnp.float32))
        attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        msg = jnp.einsum("blhk,blkhd->blhd", attn, v).reshape(b, l, d)
        msg = dense(d, "merge", bias=True)(msg)
        msg = nn.LayerNorm(dtype=self.dtype, name="norm1")(
            jnp.concatenate([x, msg], axis=-1)
        )
        msg = dense(2 * d, "mlp1", bias=True)(msg)
        msg = nn.relu(msg)
        msg = dense(d, "mlp2", bias=True)(msg)
        msg = nn.LayerNorm(dtype=self.dtype, name="norm2")(msg)
        return x + msg


class FlowHead(nn.Module):
    """Regress per-cell flow into the other image from current features."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, source, hw):
        b, l, c = x.shape
        h, w = hw
        # Cheap global correspondence prior: argmax of a low-rank similarity
        xs = nn.Dense(64, use_bias=False, dtype=self.dtype, name="proj_q")(x)
        ss = nn.Dense(64, use_bias=False, dtype=self.dtype, name="proj_k")(source)
        sim = jnp.einsum(
            "blc,bsc->bls", xs, ss, preferred_element_type=jnp.float32
        )
        p = jax.nn.softmax(sim / 8.0, axis=-1)
        cols = (jnp.arange(l, dtype=jnp.float32) % w)[None, None, :]
        rows = (jnp.arange(l, dtype=jnp.float32) // w)[None, None, :]
        ex = jnp.sum(p * cols, axis=-1)
        ey = jnp.sum(p * rows, axis=-1)
        here_x = jnp.arange(l, dtype=jnp.float32)[None] % w
        here_y = jnp.arange(l, dtype=jnp.float32)[None] // w
        flow = jnp.stack([ex - here_x, ey - here_y], axis=-1)   # (B, L, 2)
        # Residual learned correction
        delta = nn.Dense(2, dtype=self.dtype, name="delta")(x)
        return flow + delta.astype(flow.dtype)


class ASpanMatcher(nn.Module):
    """Flow-guided coarse matcher; same interface as DetectorFreeMatcher."""

    cfg: ASpanConfig = ASpanConfig()

    @nn.compact
    def __call__(self, image0, image1, valid_hw0=None, valid_hw1=None,
                 train: bool = False,
                 return_conf: bool = False) -> MatchOutput:
        from ..ops.dual_softmax import border_mask

        cfg = self.cfg
        b, h, wd = image0.shape[:3]
        h8, w8 = h // 8, wd // 8
        backbone = ResNetFPN_8_2(dtype=cfg.dtype, name="backbone")
        both = jnp.concatenate([image0, image1], axis=0).astype(cfg.dtype)
        coarse, _fine = backbone(both, train=train)
        c0 = add_position_encoding(coarse[:b]).reshape(b, h8 * w8, cfg.d_coarse)
        c1 = add_position_encoding(coarse[b:]).reshape(b, h8 * w8, cfg.d_coarse)

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

        hw = (h8, w8)
        for i in range(cfg.n_flow_layers):
            s0 = EncoderLayer(cfg.d_coarse, cfg.nhead, "linear", cfg.dtype,
                              name=f"self0_{i}")
            s1 = EncoderLayer(cfg.d_coarse, cfg.nhead, "linear", cfg.dtype,
                              name=f"self1_{i}")
            c0 = s0(c0, c0, mask0, mask0)
            c1 = s1(c1, c1, mask1, mask1)
            fh0 = FlowHead(cfg.dtype, name=f"flow0_{i}")
            fh1 = FlowHead(cfg.dtype, name=f"flow1_{i}")
            flow0 = fh0(c0, c1, hw)
            flow1 = fh1(c1, c0, hw)
            x0 = FlowCrossAttention(
                cfg.d_coarse, cfg.nhead, cfg.span_radius, cfg.dtype,
                name=f"cross0_{i}",
            )(c0, c1, hw, flow0)
            x1 = FlowCrossAttention(
                cfg.d_coarse, cfg.nhead, cfg.span_radius, cfg.dtype,
                name=f"cross1_{i}",
            )(c1, c0, hw, flow1)
            c0, c1 = x0, x1

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
