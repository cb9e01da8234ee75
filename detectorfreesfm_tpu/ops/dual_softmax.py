"""Dual-softmax match-confidence + mutual-nearest-neighbor selection.

Behavioral contract from the reference's coarse matching
(third_party/LoFTR/src/loftr/utils/coarse_matching.py:109-116,170-187):
  conf = softmax(S/T, rows) * softmax(S/T, cols),  S = <f0, f1> / C
  keep cells with conf > thr that are the argmax of both their row and column
  (mutual nearest neighbors), excluding padded/border cells.

TPU-first: rather than returning a dynamic number of matches, everything is
computed as dense masks over the (L, S) confidence matrix plus a fixed-size
top-K extraction, so a whole batch of pairs stays one static-shape XLA
program. The similarity matmul runs in bf16 on the MXU with float32 softmax.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CoarseMatches(NamedTuple):
    """Fixed-capacity match set for one pair (or batch of pairs).

    idx0/idx1: (..., K) int32 flat indices into the two coarse grids.
    conf:      (..., K) float32 dual-softmax confidence.
    valid:     (..., K) bool — slots beyond the true match count are False.
    """

    idx0: jax.Array
    idx1: jax.Array
    conf: jax.Array
    valid: jax.Array


def dual_softmax_confidence(
    feat0: jax.Array,
    feat1: jax.Array,
    mask0: jax.Array | None = None,
    mask1: jax.Array | None = None,
    temperature: float = 0.1,
) -> jax.Array:
    """(B, L, C), (B, S, C) -> (B, L, S) dual-softmax confidence matrix."""
    c = feat0.shape[-1]
    f0 = feat0 / jnp.asarray(c, feat0.dtype) ** 0.5
    f1 = feat1 / jnp.asarray(c, feat1.dtype) ** 0.5
    sim = jnp.einsum("blc,bsc->bls", f0, f1, preferred_element_type=jnp.float32)
    sim = sim / temperature
    neg = jnp.asarray(-1e9, sim.dtype)
    if mask0 is not None:
        sim = jnp.where(mask0[:, :, None], sim, neg)
    if mask1 is not None:
        sim = jnp.where(mask1[:, None, :], sim, neg)
    conf = jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)
    if mask0 is not None:
        conf = conf * mask0[:, :, None].astype(conf.dtype)
    if mask1 is not None:
        conf = conf * mask1[:, None, :].astype(conf.dtype)
    return conf


def mutual_nearest_mask(conf: jax.Array) -> jax.Array:
    """(B, L, S) -> bool mask of cells that are row- and column-argmax."""
    row_max = jnp.max(conf, axis=2, keepdims=True)
    col_max = jnp.max(conf, axis=1, keepdims=True)
    return (conf >= row_max) & (conf >= col_max) & (conf > 0.0)


def extract_topk_matches(
    conf: jax.Array,
    threshold: float,
    k: int,
) -> CoarseMatches:
    """Dense conf matrix -> fixed-capacity top-K match list.

    The reference emits a variable-length match list per pair; we instead take
    the K highest-confidence mutual-NN cells (K = static capacity) and mark
    sub-threshold slots invalid, keeping shapes static across the batch.

    Matches are always mutual nearest neighbors (the reference contract). A
    mutual-NN cell is by definition its row's argmax, so at most one match
    exists per row: the selection runs as row-argmax + mutual check + top-K
    over the L rows — O(L·S) reductions and an O(L) sort instead of a top-K
    over all L·S cells (which dominated the whole matcher forward, ~1.4 s of
    a 1.65 s batch at 832 px on one TPU chip).
    """
    b, l, s = conf.shape
    row_max = jnp.max(conf, axis=2)                       # (B, L)
    row_arg = jnp.argmax(conf, axis=2).astype(jnp.int32)  # (B, L)
    keep = row_max > threshold
    col_arg = jnp.argmax(conf, axis=1).astype(jnp.int32)  # (B, S)
    back = jnp.take_along_axis(col_arg, row_arg, axis=1)  # (B, L)
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, l), 1)
    keep = keep & (back == rows)
    scores = jnp.where(keep, row_max, 0.0)
    kk = min(k, l)  # tiny grids can hold fewer rows than the K capacity
    top_conf, idx0 = jax.lax.top_k(scores, kk)            # over L rows
    if kk < k:
        top_conf = jnp.pad(top_conf, ((0, 0), (0, k - kk)))
        idx0 = jnp.pad(idx0, ((0, 0), (0, k - kk)))
    idx0 = idx0.astype(jnp.int32)
    idx1 = jnp.take_along_axis(row_arg, idx0, axis=1)
    valid = top_conf > threshold
    return CoarseMatches(idx0, idx1, top_conf, valid)


def border_mask(h: int, w: int, border: int, valid_h=None, valid_w=None) -> jax.Array:
    """(h*w,) bool mask removing `border` cells at each image edge; when the
    live region is smaller than the padded frame (valid_h/w traced scalars),
    the border hugs the live region instead."""
    vh = h if valid_h is None else valid_h
    vw = w if valid_w is None else valid_w
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    m = (
        (ys >= border)
        & (xs >= border)
        & (ys < vh - border)
        & (xs < vw - border)
    )
    return m.reshape(h * w)
