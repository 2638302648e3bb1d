"""Outlier-token suppression (training-free feature decontamination).

TPU-native re-design of the reference ``outlier_suppression.py``:
  * detection: top-k tokens by Attn[cls,i] / Attn[i,i] ratio
    (reference outlier_suppression.py:15-61)
  * replacement: inverse-cosine-similarity softmax-weighted mean of the 8
    spatial neighbours (reference :115-188)
  * bidirectional decontamination: each neighbour loses sigma * x_outlier,
    sigma = cos_sim * temperature (reference :190-209)

The reference runs a Python loop over outliers x 8 neighbours with
last-write-wins overwrite semantics (outlier_suppression.py:204-209). Here
that becomes a fully-vectorised scatter: we compute every candidate write,
then resolve collisions with a scatter-max over the (static) write order —
bit-identical result, zero host loops, jit/vmap friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["detect_outliers_by_attention", "outlier_suppress"]

# 8-neighbour offsets in the reference's iteration order.
# numpy, NOT jnp: a module-level jnp.array initialises the jax backend at
# import time, which hangs every CPU-only entry point when the TPU tunnel
# is wedged (round-3 finding; jnp ops consume numpy operands directly).
_OFFSETS = np.array(
    [[-1, -1], [-1, 0], [-1, 1],
     [0, -1],           [0, 1],
     [1, -1], [1, 0], [1, 1]], dtype=np.int32)


def _head_average(attn: jnp.ndarray) -> jnp.ndarray:
    if attn.ndim == 4:
        return jnp.mean(attn, axis=1)
    return attn


def detect_outliers_by_attention(attn: jnp.ndarray, num_patches: int,
                                 top_k: int = 10) -> jnp.ndarray:
    """Top-k outliers by Attn[cls,i] / Attn[i,i] ratio.

    attn: [B, L, L] or [B, H, L, L] post-softmax weights (CLS at 0).
    Returns [B, K] flat patch indices (0-based, CLS excluded).
    """
    attn = _head_average(attn).astype(jnp.float32)
    diag = jnp.diagonal(attn, axis1=-2, axis2=-1)[:, 1:1 + num_patches]  # [B, P]
    cls_to_tok = attn[:, 0, 1:1 + num_patches]
    ratio = cls_to_tok / (diag + 1e-8)
    k = min(top_k, num_patches)
    _, idx = jax.lax.top_k(ratio, k)
    return idx


def _neighbor_geometry(flat_idx: jnp.ndarray, grid_h: int, grid_w: int):
    """flat [B, K] -> (rows, cols, n_rows, n_cols, n_flat, is_self)."""
    rows = flat_idx // grid_w
    cols = flat_idx % grid_w
    n_rows = jnp.clip(rows[..., None] + _OFFSETS[None, None, :, 0], 0, grid_h - 1)
    n_cols = jnp.clip(cols[..., None] + _OFFSETS[None, None, :, 1], 0, grid_w - 1)
    n_flat = n_rows * grid_w + n_cols  # [B, K, 8]
    is_self = (n_rows == rows[..., None]) & (n_cols == cols[..., None])
    return rows, cols, n_flat, is_self


def _gather_tokens(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats [B, P, C], idx [B, ...] -> [B, ..., C]."""
    return jax.vmap(lambda f, i: f[i])(feats, idx)


def _inverse_sim_weights(center: jnp.ndarray, neighbors: jnp.ndarray):
    """Cosine sim + inverse-similarity softmax weights.

    center: [B, K, C]; neighbors: [B, K, 8, C].
    Returns (similarity [B,K,8] fp32, weights [B,K,8] fp32).
    """
    c = center.astype(jnp.float32)
    n = neighbors.astype(jnp.float32)
    c_n = c / jnp.maximum(jnp.linalg.norm(c, axis=-1, keepdims=True), 1e-12)
    n_n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    sim = jnp.sum(n_n * c_n[:, :, None, :], axis=-1)  # [B, K, 8]
    w = jax.nn.softmax(jnp.clip(1.0 - sim, 0.0, None), axis=-1)
    return sim, w


def outlier_suppress(feature_map: jnp.ndarray, attn: jnp.ndarray,
                     grid_h: int, grid_w: int, *, top_k: int = 10,
                     contamination_temp: float = 0.1) -> jnp.ndarray:
    """Apply outlier suppression. feature_map: [B, C, H, W] patch features."""
    b, c, h, w = feature_map.shape
    p = h * w
    idx = detect_outliers_by_attention(attn, p, top_k)  # [B, K]
    k = idx.shape[1]

    feats = feature_map.reshape(b, c, p).transpose(0, 2, 1)  # [B, P, C]
    _, _, n_flat, is_self = _neighbor_geometry(idx, grid_h, grid_w)

    outlier_feats = _gather_tokens(feats, idx)            # [B, K, C]
    neighbor_feats = _gather_tokens(feats, n_flat)        # [B, K, 8, C]

    sim, weights = _inverse_sim_weights(outlier_feats, neighbor_feats)
    weighted_avg = jnp.sum(neighbor_feats.astype(jnp.float32)
                           * weights[..., None], axis=2)  # [B, K, C]

    # bidirectional decontamination candidates
    strength = jnp.clip(sim * contamination_temp, 0.0, 1.0)  # [B, K, 8]
    clean = (neighbor_feats.astype(jnp.float32)
             - outlier_feats.astype(jnp.float32)[:, :, None, :] * strength[..., None])

    # last-write-wins collision resolution, matching the reference's
    # (outlier-major, neighbour-minor) loop order
    n_writes = k * 8
    order = jnp.arange(n_writes, dtype=jnp.int32).reshape(k, 8)
    order_b = jnp.broadcast_to(order[None], (b, k, 8))
    order_b = jnp.where(is_self, -1, order_b)  # clamped-onto-self: no write

    def resolve(one_nflat, one_order, one_clean, one_feats, one_idx, one_avg):
        winner = jnp.full((p,), -1, dtype=jnp.int32)
        winner = winner.at[one_nflat.reshape(-1)].max(one_order.reshape(-1))
        flat_clean = one_clean.reshape(n_writes, -1)
        updated = flat_clean[jnp.clip(winner, 0, n_writes - 1)]
        out = jnp.where((winner >= 0)[:, None], updated, one_feats.astype(jnp.float32))
        out = out.at[one_idx].set(one_avg)  # replacement overwrites everything
        return out

    result = jax.vmap(resolve)(n_flat, order_b, clean, feats, idx, weighted_avg)
    result = result.astype(feature_map.dtype)
    return result.transpose(0, 2, 1).reshape(b, c, h, w)
