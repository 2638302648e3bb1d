"""Self-attention enhancement for weak-self-attention tokens.

Re-design of reference ``self_attention_enhancement.py``:
  * 'feature' mode (reference :71-150): the top-k tokens with the LOWEST
    attention-diagonal are replaced by the inverse-similarity-weighted mean of
    their 8 spatial neighbours (reference :247-324).
  * 'attention' mode (reference :152-245): boost the attention diagonal by
    clamp(threshold - self_attn, 0) * strength, L1-renormalise rows, and
    re-aggregate features with the modified map. (The reference does this with
    a per-token Python loop :206-210; here it is a single vectorised update.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rs_ov.decontam.outlier import _gather_tokens, _inverse_sim_weights, _neighbor_geometry

__all__ = ["self_attention_enhance"]


def _patch_diag(attn: jnp.ndarray, num_patches: int) -> jnp.ndarray:
    if attn.ndim == 4:
        attn = jnp.mean(attn, axis=1)
    return jnp.diagonal(attn, axis1=-2, axis2=-1)[:, 1:1 + num_patches].astype(jnp.float32)


def _replace_weak_with_neighbors(feats: jnp.ndarray, weak_idx: jnp.ndarray,
                                 grid_h: int, grid_w: int) -> jnp.ndarray:
    """feats [B, P, C]; weak_idx [B, K] -> feats with weak tokens replaced."""
    _, _, n_flat, _ = _neighbor_geometry(weak_idx, grid_h, grid_w)
    weak_feats = _gather_tokens(feats, weak_idx)
    neighbor_feats = _gather_tokens(feats, n_flat)
    _, weights = _inverse_sim_weights(weak_feats, neighbor_feats)
    weighted_avg = jnp.sum(neighbor_feats.astype(jnp.float32) * weights[..., None], axis=2)

    def scatter(one_feats, one_idx, one_avg):
        return one_feats.at[one_idx].set(one_avg.astype(one_feats.dtype))

    return jax.vmap(scatter)(feats, weak_idx, weighted_avg)


def self_attention_enhance(patch_features: jnp.ndarray, attn: jnp.ndarray,
                           grid_h: int, grid_w: int, *, mode: str = "feature",
                           enhancement_strength: float = 0.1,
                           min_self_attn_threshold: float = 0.15,
                           top_k: int = 10) -> jnp.ndarray:
    """patch_features: [B, C, H, W] (CLS excluded; the caller re-attaches it).

    attn: [B, L, L] or [B, H, L, L] with CLS at index 0.
    """
    b, c, h, w = patch_features.shape
    p = h * w
    feats = patch_features.reshape(b, c, p).transpose(0, 2, 1)  # [B, P, C]

    if mode == "feature":
        diag = _patch_diag(attn, p)
        k = min(top_k, p)
        _, weak_idx = jax.lax.top_k(-diag, k)  # lowest self-attention
        out = _replace_weak_with_neighbors(feats, weak_idx, grid_h, grid_w)
    elif mode == "attention":
        if attn.ndim == 4:
            attn = jnp.mean(attn, axis=1)
        attn = attn.astype(jnp.float32)
        n = attn.shape[1]
        diag = jnp.diagonal(attn, axis1=-2, axis2=-1)  # [B, N] incl CLS
        boost = jnp.clip(min_self_attn_threshold - diag, 0.0, None) * enhancement_strength
        boost = boost.at[:, 0].set(0.0)  # CLS diagonal untouched (reference loops patches only)
        attn_mod = attn + boost[:, :, None] * jnp.eye(n, dtype=attn.dtype)[None]
        attn_mod = attn_mod / (jnp.sum(attn_mod, axis=-1, keepdims=True) + 1e-8)
        # features enter with a zero dummy CLS (reference :220-223)
        feats_cls = jnp.concatenate(
            [jnp.zeros((b, 1, c), feats.dtype), feats], axis=1)
        out_full = jnp.einsum("bij,bjc->bic", attn_mod, feats_cls.astype(jnp.float32),
                              preferred_element_type=jnp.float32)
        out = out_full[:, 1:, :].astype(feats.dtype)
    else:
        raise ValueError(f"mode must be 'feature' or 'attention', got {mode!r}")

    return out.transpose(0, 2, 1).reshape(b, c, h, w)
