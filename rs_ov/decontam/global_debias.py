"""Similarity-weighted global CLS debiasing (reference segmentor.py:320-336).

Patches more similar to the CLS token are assumed more contaminated by the
global representation and get a stronger CLS subtraction:
    x_i <- x_i - cos(x_i, cls) * factor * cls
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["global_debias"]


def global_debias(patch_features: jnp.ndarray, cls_token: jnp.ndarray,
                  factor: float) -> jnp.ndarray:
    """patch_features: [B, N, C]; cls_token: [B, C] (already L2-normalised by
    the caller, matching reference segmentor.py:310 which normalises CLS before
    this point; the reference then re-normalises both for the similarity)."""
    if factor == 0.0:
        return patch_features
    f32 = patch_features.astype(jnp.float32)
    c32 = cls_token.astype(jnp.float32)
    f_n = f32 / jnp.maximum(jnp.linalg.norm(f32, axis=-1, keepdims=True), 1e-12)
    c_n = c32 / jnp.maximum(jnp.linalg.norm(c32, axis=-1, keepdims=True), 1e-12)
    similarity = jnp.sum(f_n * c_n[:, None, :], axis=-1)  # [B, N]
    weighted = similarity[..., None] * factor
    out = f32 - c32[:, None, :] * weighted
    return out.astype(patch_features.dtype)
