"""Attention primitives for the matching transformers.

Two families, mirroring the behavioral contract of the reference's
third_party/LoFTR/src/loftr/loftr_module/linear_attention.py (elu+1 linear
attention and masked full attention) but written as batched einsum programs
that XLA maps straight onto the MXU:

  * linear_attention: O(N·d²) associativity trick — the (K^T V) contraction is
    a single (d_head × d_head) matmul per head, ideal for the 1/8-resolution
    coarse feature maps (up to 40k tokens at 1600 px).
  * full_attention: O(N²) masked softmax attention, used for the short
    (≤ 16 view × window²) sequences of the multiview refiner.

All functions take (B, N, H, D) tensors ("BNHD") and optional boolean masks.
Computation is upcast to float32 for the normalizing reductions regardless of
input dtype (bf16-safe).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _elu_feature(x: jax.Array) -> jax.Array:
    return jax.nn.elu(x) + 1.0


def linear_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_mask: jax.Array | None = None,
    kv_mask: jax.Array | None = None,
    eps: float = 1e-6,
) -> jax.Array:
    """Linear (kernelized) attention with elu+1 feature map.

    Args:
      q: (B, L, H, D); k, v: (B, S, H, D).
      q_mask: (B, L) bool; kv_mask: (B, S) bool.
    Returns: (B, L, H, D), same dtype as v.
    """
    dtype = v.dtype
    # Feature maps stay in the compute dtype (bf16 on TPU): the (B, N, H, D)
    # tensors are the bandwidth cost at 40k tokens, and every contraction
    # below accumulates in fp32 on the MXU (preferred_element_type), which is
    # where long-sequence precision actually lives. fp32 inputs are computed
    # fully in fp32, exactly as before.
    Q = _elu_feature(q)
    K = _elu_feature(k)
    if q_mask is not None:
        Q = Q * q_mask[:, :, None, None].astype(Q.dtype)
    if kv_mask is not None:
        K = K * kv_mask[:, :, None, None].astype(K.dtype)
    # Stabilize the K^T V contraction for long sequences. v_scale is applied
    # to KV in fp32 AFTER the accumulating einsum so numerator and
    # denominator use the exact same constant (a bf16-rounded v_scale on the
    # numerator only was a ~0.4% systematic scale mismatch — ADVICE r2 #1).
    v_scale = 1.0 / float(max(1, k.shape[1]))
    KV = jnp.einsum(
        "bshd,bshe->bhde", K, v,
        preferred_element_type=jnp.float32,
    ) * v_scale
    k_sum = jnp.sum(K, axis=1, dtype=jnp.float32)  # (B, H, D)
    denom = jnp.einsum(
        "blhd,bhd->blh", Q, k_sum.astype(Q.dtype),
        preferred_element_type=jnp.float32,
    )
    Z = 1.0 / (denom * v_scale + eps)              # (B, L, H) fp32
    out = jnp.einsum(
        "blhd,bhde->blhe", Q, KV.astype(Q.dtype),
        preferred_element_type=jnp.float32,
    )
    return (out * Z[..., None]).astype(dtype)


def full_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_mask: jax.Array | None = None,
    kv_mask: jax.Array | None = None,
) -> jax.Array:
    """Masked softmax attention. Shapes as in linear_attention."""
    dtype = v.dtype
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    logits = jnp.einsum("blhd,bshd->bhls", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    if kv_mask is not None:
        neg = jnp.asarray(-1e9, logits.dtype)
        logits = jnp.where(kv_mask[:, None, None, :], logits, neg)
    attn = jax.nn.softmax(logits, axis=-1)
    if q_mask is not None:
        attn = attn * q_mask[:, None, :, None].astype(attn.dtype)
    out = jnp.einsum("bhls,bshd->blhd", attn, v.astype(jnp.float32))
    return out.astype(dtype)
