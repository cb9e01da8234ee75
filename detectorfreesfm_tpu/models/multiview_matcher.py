"""Multiview track-refinement matcher — the framework's trainable model.

Capability match for the reference's MultiviewMatcher
(src/MultiviewMatcher/MultiviewMatcher.py:17-404): for every feature track,
crop patches around each node, extract S2DNet hypercolumn features, run an
intra-track transformer (reference patch attends against all query patches),
correlate the reference center feature with each query window, and refine
every query point sub-pixel via soft-argmax expectation (+std).

TPU-first design vs. the reference:
  * One static-shape forward per (T tracks x V views x W window) bucket — the
    reference's view-count-bucketed chunk scheduler, per-image backbone loop
    and sparse/dense density switch (MultiviewMatcher.py:117-268) all become
    host-side bag packing into these buckets (refine/bags.py).
  * Patch crops are batched `ops.roi_align.extract_patches` gathers with
    per-node scale dilation (the reference's scale-aligned zoom-in,
    s2dnet.py:177-205) — no CUDA RoIAlign.
  * All T*V patches run through the backbone as one NHWC batch (MXU-dense).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dsnt import soft_argmax_refine
from ..ops.roi_align import extract_patches
from .s2dnet import S2DNet
from .transformer import LocalFeatureTransformer


@dataclasses.dataclass(frozen=True)
class RefinerConfig:
    crop_size: int = 19    # image-pixel context window fed to the backbone
    window: int = 15       # feature window kept for attention/correlation
    d_model: int = 128
    nhead: int = 8
    n_layers: int = 2      # (self, cross) pairs
    softmax_temperature: float = 0.1
    # Reference-point movement (reference fine_matching.py:100-127, test
    # only): also search a (2r+1)^2 grid of candidate reference positions and
    # keep the one whose query heatmaps have the smallest mean std. 0 = off.
    ref_move_radius: int = 0
    # Rematerialize backbone activations in the backward pass (training
    # memory <- the T*V patch batch dominates; trades ~1/3 extra FLOPs)
    remat_backbone: bool = True
    compute_dtype: str = "float32"

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


class RefinerOutput(NamedTuple):
    coords: jax.Array  # (T, V, 2) refined coordinates, image pixels. View 0
                       # (reference) only moves when ref_move_radius > 0.
    std: jax.Array     # (T, V) expectation std in window units (ref: 0)


class MultiviewRefiner(nn.Module):
    """Track refinement over a bag of images.

    Inputs:
      images:   (I, H, W, 1) float in [0, 1] — the bag's images.
      node_img: (T, V) int32 image index per track node.
      node_xy:  (T, V, 2) float32 (x, y) per node, image pixels; view 0 is
                the track's reference node.
      node_scale: (T, V) float32 relative patch scale per node (f/depth of
                node divided by reference's — reference construct_matching_
                data.py:294-311); 1.0 = same scale.
      node_mask: (T, V) bool — valid views (view 0 always true for live
                tracks; fully-masked tracks allowed for padding).
    """

    cfg: RefinerConfig = RefinerConfig()

    @nn.compact
    def __call__(
        self,
        images: jax.Array,
        node_img: jax.Array,
        node_xy: jax.Array,
        node_scale: jax.Array,
        node_mask: jax.Array,
        train: bool = False,
    ) -> RefinerOutput:
        cfg = self.cfg
        t, v = node_img.shape
        w = cfg.window
        c = cfg.d_model

        # --- patch extraction + backbone (one dense batch) ------------------
        centers = node_xy.reshape(t * v, 2)
        scales = node_scale.reshape(t * v)
        img_idx = node_img.reshape(t * v)
        patches = extract_patches(
            images, centers, img_idx, cfg.crop_size, scales
        )  # (T*V, P, P, 1)
        backbone_cls = (
            nn.remat(S2DNet, static_argnums=(2,))
            if (train and cfg.remat_backbone) else S2DNet
        )
        feats = backbone_cls(out_dim=c, dtype=cfg.dtype, name="backbone")(
            patches.astype(cfg.dtype), train
        )  # (T*V, P, P, C)
        # Center-crop the feature window (crop_size context -> window kept)
        off = (cfg.crop_size - w) // 2
        feats = feats[:, off : off + w, off : off + w, :]
        feats = feats.reshape(t, v, w * w, c)

        # --- intra-track transformer ----------------------------------------
        ref = feats[:, 0]                                # (T, W2, C)
        qry = feats[:, 1:].reshape(t, (v - 1) * w * w, c)
        ref_mask = jnp.broadcast_to(node_mask[:, 0:1], (t, w * w))
        qry_mask = jnp.repeat(node_mask[:, 1:], w * w, axis=1)
        lt = LocalFeatureTransformer(
            d_model=c, nhead=cfg.nhead,
            layer_names=("self", "cross") * cfg.n_layers,
            attention="linear", dtype=cfg.dtype, name="transformer",
        )
        ref, qry = lt(ref, qry, ref_mask, qry_mask)

        # --- correlation + expectation ---------------------------------------
        # L2-normalized correlation: bounded logits keep the softmax out of
        # the uniform-collapse basin (unnormalized features can minimize the
        # loss by shrinking toward a constant — observed as exact-zero
        # gradients when training from scratch)
        def l2n(x):
            # rsqrt(sum + eps): finite gradient at exactly-zero vectors
            # (linalg.norm's backward NaNs there, and the TPU's bf16 matmul
            # pass rounds small feature vectors to exact zero)
            return x * jax.lax.rsqrt(
                jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12
            )

        qry = l2n(qry.reshape(t, v - 1, w * w, c).astype(jnp.float32))
        half = (w - 1) / 2.0
        r = cfg.ref_move_radius
        if r == 0:
            center = l2n(ref[:, (w * w) // 2].astype(jnp.float32))  # (T, C)
            sim = jnp.einsum(
                "tc,tqwc->tqw", center, qry,
                preferred_element_type=jnp.float32,
            )
            heat = sim.reshape(t, v - 1, w, w) / cfg.softmax_temperature
            coords_n, std = soft_argmax_refine(heat, normalized=True)
            delta = coords_n * half * node_scale[:, 1:, None]
            ref_xy = node_xy[:, 0:1]
        else:
            # Candidate reference positions: (2r+1)^2 grid around center
            offs = jnp.arange(-r, r + 1)
            oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
            mid = w // 2
            cand_lin = ((mid + oy) * w + (mid + ox)).reshape(-1)  # (L2,)
            cand = l2n(ref[:, cand_lin].astype(jnp.float32))      # (T, L2, C)
            sim = jnp.einsum(
                "tlc,tqwc->tlqw", cand, qry,
                preferred_element_type=jnp.float32,
            )
            heat = sim.reshape(t, -1, v - 1, w, w) / cfg.softmax_temperature
            coords_n, std_c = soft_argmax_refine(heat, normalized=True)
            # Best candidate = smallest mean std over valid query views
            # (reference smallest_mean_std selection, fine_matching.py:129-193)
            qmask = node_mask[:, None, 1:].astype(jnp.float32)
            denom = jnp.maximum(jnp.sum(qmask, -1), 1.0)
            mean_std = jnp.sum(std_c * qmask, -1) / denom         # (T, L2)
            best = jnp.argmin(mean_std, axis=1)                   # (T,)
            coords_n = jnp.take_along_axis(
                coords_n, best[:, None, None, None], axis=1
            )[:, 0]
            std = jnp.take_along_axis(std_c, best[:, None, None], axis=1)[:, 0]
            delta = coords_n * half * node_scale[:, 1:, None]
            d_ref = jnp.stack(
                [(best % (2 * r + 1)) - r, (best // (2 * r + 1)) - r], -1
            ).astype(jnp.float32)
            ref_xy = (node_xy[:, 0] + d_ref)[:, None]

        q_xy = node_xy[:, 1:] + delta
        coords = jnp.concatenate([ref_xy, q_xy], axis=1)
        std_full = jnp.concatenate(
            [jnp.zeros((t, 1), std.dtype), std], axis=1
        )
        # Masked nodes keep their input coordinates
        coords = jnp.where(node_mask[..., None], coords, node_xy)
        return RefinerOutput(coords, std_full)
