"""Training losses.

Two loss families matching the reference's training surface:

  * coarse_focal_loss — focal binary cross-entropy on the dual-softmax
    confidence matrix vs. a ground-truth assignment (the LoFTR-family coarse
    supervision; the reference trains only the refinement matcher but ships
    LoFTR pretrained with exactly this objective).
  * fine_l2_std_loss — the refinement matcher's L2-with-std objective
    (reference src/losses/loss.py:38: masked ‖pred − gt‖² weighted by the
    detached, batch-normalized inverse predicted std).

All reductions in float32; safe under bf16 forward passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def coarse_focal_loss(
    conf: jax.Array,          # (B, L, S) dual-softmax confidences in [0, 1]
    gt_idx1: jax.Array,       # (B, L) int32 — column index of the GT match
                              #   for each row cell, or -1 if row unmatched
    valid_rows: jax.Array | None = None,  # (B, L) bool — rows inside image
    alpha: float = 0.25,
    gamma: float = 2.0,
    eps: float = 1e-20,
) -> jax.Array:
    """Focal BCE over the assignment matrix, positives vs. sampled negatives.

    Positive cells are (l, gt_idx1[l]); every other cell in a matched row and
    all cells of unmatched valid rows are negatives. Returns a scalar.

    eps only guards log(0) — it must sit far below the smallest meaningful
    confidence: at a 52x52 grid the random-init dual-softmax product is
    ~(1/2704)^2 = 1.4e-7, and an earlier 1e-6 clip floor zeroed every
    positive's gradient (training silently flatlined at 0.25*(-log 1e-6)).
    """
    b, l, s = conf.shape
    conf = jnp.clip(conf.astype(jnp.float32), 0.0, 1.0 - 1e-6)
    matched = gt_idx1 >= 0
    if valid_rows is not None:
        matched = matched & valid_rows
    gt_safe = jnp.clip(gt_idx1, 0, s - 1)
    one_hot = jax.nn.one_hot(gt_safe, s, dtype=jnp.float32) * matched[
        ..., None
    ].astype(jnp.float32)

    pos_w = alpha * (1.0 - conf) ** gamma * (-jnp.log(conf + eps))
    neg_w = (1.0 - alpha) * conf**gamma * (-jnp.log(1.0 - conf + eps))
    row_live = (
        valid_rows.astype(jnp.float32)
        if valid_rows is not None
        else jnp.ones((b, l), jnp.float32)
    )
    loss_pos = jnp.sum(one_hot * pos_w) / jnp.maximum(jnp.sum(one_hot), 1.0)
    neg_mask = row_live[..., None] * (1.0 - one_hot)
    loss_neg = jnp.sum(neg_mask * neg_w) / jnp.maximum(jnp.sum(neg_mask), 1.0)
    return loss_pos + loss_neg


def fine_l2_std_loss(
    pred: jax.Array,   # (..., 2) predicted refined coordinates (grid units)
    gt: jax.Array,     # (..., 2) ground-truth coordinates
    std: jax.Array,    # (...,)   predicted std from the expectation head
    mask: jax.Array,   # (...,)   bool validity
    eps: float = 1e-9,
) -> jax.Array:
    """Reference loss.py:38 semantics: weight = 1/std, normalized to mean 1
    over the valid set, detached; loss = mean weight·‖pred−gt‖² over valid."""
    mask_f = mask.astype(jnp.float32)
    inv_std = 1.0 / jnp.clip(std.astype(jnp.float32), 1e-3, None)
    denom = jnp.maximum(jnp.sum(mask_f), 1.0)
    weight = inv_std / (jnp.sum(inv_std * mask_f) / denom + eps)
    weight = jax.lax.stop_gradient(weight)
    # Mask BEFORE squaring: out-of-frame targets can be inf (division by a
    # near-zero warp depth) and inf * 0 poisons the sum with NaN — and a
    # single jnp.where after the square still NaNs the gradient
    diff = jnp.where(
        mask[..., None],
        pred.astype(jnp.float32) - gt.astype(jnp.float32),
        0.0,
    )
    err2 = jnp.sum(diff * diff, -1)
    return jnp.sum(weight * err2 * mask_f) / denom
