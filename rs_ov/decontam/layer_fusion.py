"""Attention layer fusion: EMA over per-layer attention maps + outlier-masked
re-weighting (reference open_clip/transformer.py:597-690).

The reference accumulates head-averaged attention maps across layers with
A <- lambda*A + (1-lambda)*A_new, then (when outlier suppression is active)
zeroes the columns of detected outlier tokens, L1-renormalises rows and uses
the result to re-aggregate the accumulated custom-attention output.

NOTE a reference quirk: its post-processing tries to reshape the accumulated
[B, L, L] map as [B*heads, L, L] (transformer.py:650-655), which cannot work
for batch=1 — torch's MultiheadAttention has already head-averaged. We keep
the well-defined semantics: the accumulated map IS head-averaged [B, L, L].
"""

from __future__ import annotations

import jax.numpy as jnp

from rs_ov.decontam.outlier import detect_outliers_by_attention

__all__ = ["fuse_attention_ema", "layer_fusion_reweight"]


def fuse_attention_ema(accumulated: jnp.ndarray | None, current: jnp.ndarray,
                       lam: float) -> jnp.ndarray:
    """A <- lam*A + (1-lam)*A_new; first layer initialises the accumulator."""
    if accumulated is None:
        return current
    return lam * accumulated + (1.0 - lam) * current


def layer_fusion_reweight(output: jnp.ndarray, fused_attn: jnp.ndarray,
                          top_k: int) -> jnp.ndarray:
    """Mask outlier columns of the fused map, L1-normalise, re-aggregate.

    output: [B, L, D] accumulated features (CLS at 0).
    fused_attn: [B, L, L] head-averaged fused attention.
    """
    b, l, _ = fused_attn.shape
    num_patches = l - 1
    outlier_idx = detect_outliers_by_attention(fused_attn, num_patches, top_k)  # [B, K]
    mask = jnp.ones((b, l), fused_attn.dtype)
    batch_idx = jnp.arange(b)[:, None]
    mask = mask.at[batch_idx, outlier_idx + 1].set(0.0)  # +1 for CLS
    masked = fused_attn * mask[:, None, :]
    normalized = masked / (jnp.sum(masked, axis=-1, keepdims=True) + 1e-8)
    out = jnp.einsum("bij,bjd->bid", normalized.astype(jnp.float32),
                     output.astype(jnp.float32), preferred_element_type=jnp.float32)
    return out.astype(output.dtype)
