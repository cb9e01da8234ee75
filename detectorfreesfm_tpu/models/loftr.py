"""Detector-free coarse(+fine) matcher — the LoFTR-class model, TPU-first.

Capability match for the reference's default coarse matcher
(third_party/LoFTR/src/loftr/loftr.py:12-71): ResNet-FPN features, sine
position encoding, linear-attention coarse transformer, dual-softmax +
mutual-NN matching, optional fine sub-pixel stage (5x5 window correlation +
soft-argmax). TPU-first differences:

  * One jitted program per (H, W) shape bucket; a *batch* of pairs runs in a
    single forward instead of the reference's bs=1 loop
    (src/coarse_match/coarse_match_worker.py:86).
  * Matches come out as a fixed-capacity top-K set (ops/dual_softmax.py), so
    downstream stages stay static-shape.
  * bf16 compute path optional end-to-end; softmax/expectation in fp32.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dsnt import soft_argmax_refine
from ..ops.dual_softmax import (
    CoarseMatches,
    border_mask,
    dual_softmax_confidence,
    extract_topk_matches,
)
from .backbone import ResNetFPN_8_2
from .position_encoding import add_position_encoding
from .transformer import EncoderLayer, LocalFeatureTransformer


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    d_coarse: int = 256
    d_fine: int = 128
    nhead: int = 8
    n_coarse_layers: int = 4  # (self, cross) pairs
    match_threshold: float = 0.2
    dsoftmax_temperature: float = 0.1
    border: int = 2  # border cells removed from matching
    max_matches: int = 2048  # static top-K capacity per pair
    fine_window: int = 5  # fine correlation window (fine-res px)
    fine_enabled: bool = False  # coarse_only by default, as the pipeline uses
    compute_dtype: str = "float32"  # "bfloat16" on real TPU runs
    # Fused Pallas dual-softmax + mutual-NN extraction (ops/pallas_dsm.py):
    # never materializes the (L, S) conf matrix in HBM. TPU-only (tests use
    # the dense path or interpret mode); training needs the dense conf anyway.
    fused_matching: bool = False
    # Pallas kernel tiles (VMEM budget knobs — defaults tuned on v5e via
    # tools/sweep_dsm_tiles.py; override for chips with less VMEM.
    # ADVICE r2 #2.) 512-row L tiles: the round-4 correctness fix switched
    # the kernel to f32 feature tiles + HIGHEST-precision matmuls, and
    # 1024-row tiles now exceed the 16 MB scoped-VMEM budget at 1600 px
    # (19.5 MB on-stack for the pass-2 z2 tile) — the old 1024 default's
    # ~8% win was measured on the cheaper (and WRONG, see ba11e2a) bf16
    # kernel.
    dsm_tile_l: int = 512
    dsm_tile_s: int = 2048
    # Schraudolph bit-trick exp in the fused DSM lse pass (~3 VPU ops vs
    # ~20): the kernel is exp-bound at 1600 px (PERFORMANCE.md). ±3% on the
    # normalizer shifts confidences a few percent — match sets at the 0.2
    # threshold are unchanged in the diag (see PERFORMANCE.md r4).
    dsm_fast_exp: bool = False

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


class MatchOutput(NamedTuple):
    """Batch of fixed-capacity matches in *network input* pixel coordinates."""

    coords0: jax.Array  # (B, K, 2) float32 (x, y) in image0
    coords1: jax.Array  # (B, K, 2)
    conf: jax.Array     # (B, K)
    valid: jax.Array    # (B, K) bool


class FinePreprocessAndMatch(nn.Module):
    """5x5-window fine refinement of image1 coordinates at coarse matches."""

    cfg: MatcherConfig

    @nn.compact
    def __call__(self, fine0, fine1, matches: CoarseMatches, hw8):
        """fine0/1: (B, H/2, W/2, C_f); matches index the 1/8 grids."""
        cfg = self.cfg
        w = cfg.fine_window
        h8, w8 = hw8
        b, k = matches.idx0.shape
        c = fine0.shape[-1]
        # Gather w*w windows centered at 4*(coarse cell) on the 1/2-res maps
        half = w // 2

        def windows(fine, idx, w2):
            hf, wf = fine.shape[1:3]
            cy = (idx // w2) * 4
            cx = (idx % w2) * 4
            oy = jnp.arange(-half, half + 1)
            ox = jnp.arange(-half, half + 1)
            yy = jnp.clip(cy[..., None, None] + oy[None, None, :, None], 0, hf - 1)
            xx = jnp.clip(cx[..., None, None] + ox[None, None, None, :], 0, wf - 1)
            flat = fine.reshape(b, hf * wf, c)
            lin = (yy * wf + xx).reshape(b, k * w * w)
            out = jnp.take_along_axis(flat, lin[..., None], axis=1)
            return out.reshape(b, k, w * w, c)

        w0 = windows(fine0, matches.idx0, w8)
        w1 = windows(fine1, matches.idx1, w8)
        # One self/cross layer over the two windows (per match)
        f0 = w0.reshape(b * k, w * w, c)
        f1 = w1.reshape(b * k, w * w, c)
        lt = LocalFeatureTransformer(
            d_model=c, nhead=cfg.nhead, layer_names=("self", "cross"),
            attention="linear", dtype=cfg.dtype, name="fine_transformer",
        )
        f0, f1 = lt(f0, f1)
        # Correlate center of window0 against all of window1
        center = f0[:, (w * w) // 2]  # (bk, c)
        sim = jnp.einsum(
            "nc,nwc->nw", center, f1, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.asarray(c, jnp.float32))
        heat = sim.reshape(b, k, w, w)
        coords, std = soft_argmax_refine(
            heat, temperature=1.0, normalized=True
        )  # in [-1, 1] over the window
        delta_fine = coords * half  # fine-res px offset
        return delta_fine.reshape(b, k, 2) * 2.0, std.reshape(b, k)  # full-res px


class DetectorFreeMatcher(nn.Module):
    """Full matcher: images in, fixed-capacity subpixel matches out."""

    cfg: MatcherConfig = MatcherConfig()

    @nn.compact
    def __call__(
        self,
        image0: jax.Array,  # (B, H, W, 1) in [0, 1]
        image1: jax.Array,
        valid_hw0=None,  # (B, 2) int (h, w) live region at full res, optional
        valid_hw1=None,
        train: bool = False,
        return_conf: bool = False,  # also return the dense (B, L, S) conf
        fine_at=None,  # teacher-forced (idx0, idx1) int (B, Kf) coarse cells:
                       # run the fine stage at THESE matches and also return
                       # (delta, std) — the fine-training path (the reference
                       # trains LoFTR fine on GT coarse assignments)
    ) -> MatchOutput:
        cfg = self.cfg
        b, h, wd = image0.shape[:3]
        h8, w8 = h // 8, wd // 8
        backbone = ResNetFPN_8_2(dtype=cfg.dtype, name="backbone")
        # Shared backbone over both images in one batch (2B) — fills the MXU
        both = jnp.concatenate([image0, image1], axis=0).astype(cfg.dtype)
        coarse, fine = backbone(both, train=train)
        c0, c1 = coarse[:b], coarse[b:]
        f0, f1 = fine[:b], fine[b:]

        c0 = add_position_encoding(c0).reshape(b, h8 * w8, cfg.d_coarse)
        c1 = add_position_encoding(c1).reshape(b, h8 * w8, cfg.d_coarse)

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

        lt = LocalFeatureTransformer(
            d_model=cfg.d_coarse,
            nhead=cfg.nhead,
            layer_names=("self", "cross") * cfg.n_coarse_layers,
            attention="linear",
            dtype=cfg.dtype,
            name="coarse_transformer",
        )
        c0, c1 = lt(c0, c1, mask0, mask1)

        if cfg.fused_matching and not return_conf:
            from ..ops.pallas_dsm import fused_extract_matches

            conf = None
            # 1024-row tiles win ~8% at 1600 px (40k tokens) but OOM VMEM
            # at 832 px under batch vmap (observed: compile-helper OOM
            # "on stack" for the vmapped lse output); use them only on the
            # long-sequence maps they were swept on.
            tl = cfg.dsm_tile_l if h8 * w8 >= 32768 else min(
                cfg.dsm_tile_l, 512)
            matches = fused_extract_matches(
                c0, c1, mask0, mask1, cfg.match_threshold, cfg.max_matches,
                temperature=cfg.dsoftmax_temperature,
                tile_l=tl, tile_s=cfg.dsm_tile_s,
                fast_exp=cfg.dsm_fast_exp,
            )
        else:
            conf = dual_softmax_confidence(
                c0.astype(jnp.float32), c1.astype(jnp.float32),
                mask0, mask1, cfg.dsoftmax_temperature,
            )
            matches = extract_topk_matches(
                conf, cfg.match_threshold, cfg.max_matches
            )

        # Grid cells -> full-res pixel coordinates (cell top-left * 8, as the
        # reference's on-grid keypoints)
        def to_xy(idx):
            return jnp.stack(
                [(idx % w8).astype(jnp.float32) * 8.0,
                 (idx // w8).astype(jnp.float32) * 8.0],
                axis=-1,
            )

        xy0 = to_xy(matches.idx0)
        xy1 = to_xy(matches.idx1)
        fine_mod = None
        if cfg.fine_enabled or fine_at is not None:
            fine_mod = FinePreprocessAndMatch(cfg, name="fine_match")
        if cfg.fine_enabled:
            delta, _std = fine_mod(f0, f1, matches, (h8, w8))
            xy1 = xy1 + delta
        out = MatchOutput(xy0, xy1, matches.conf, matches.valid)
        if fine_at is not None:
            # Teacher-forced fine pass at GT coarse cells (training): the
            # fine params are the SAME module instance as the inference
            # branch above, so a jointly-trained checkpoint serves both.
            t_idx0, t_idx1 = fine_at
            teacher = CoarseMatches(
                idx0=t_idx0, idx1=t_idx1,
                conf=jnp.ones(t_idx0.shape, jnp.float32),
                valid=jnp.ones(t_idx0.shape, bool),
            )
            t_delta, t_std = fine_mod(f0, f1, teacher, (h8, w8))
            if return_conf:
                return out, conf, (t_delta, t_std)
            return out, (t_delta, t_std)
        if return_conf:
            return out, conf
        return out
