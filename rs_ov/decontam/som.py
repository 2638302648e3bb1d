"""SOM — Suppress Outlier Module, implemented from the reference's spec.

The reference repo documents SOM fully (SOM_IMPLEMENTATION.md,
SOM_DETECTION_MODES.md) and ships acceptance tests (test_som.py) but the
implementation file itself is missing (test_som.py:11 imports a non-existent
``COS`` module). This is the spec-complete implementation:

  * multi-head consensus: each head votes per detection mode; a token is an
    outlier when the voting fraction exceeds ``consensus_threshold``.
  * detection modes:
      - 'cls_comparison':    Attn[i,i] <  Attn[cls,i]        (local -> global)
      - 'self_sufficiency':  Attn[i,i] <  max_{j!=i} Attn[i,j] * ratio
      - 'both':              union        (maximum purification, the default)
      - 'either':            intersection (minimal intervention)
  * replacement: plain mean of the VALID 8 spatial neighbours (boundary
    tokens use only their existing 3/5 neighbours — test_som.py:185-225),
    computed only where the mask is set.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["suppress_outlier_module"]

_OFFSETS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def _detect_votes(attn: jnp.ndarray, num_patches: int, mode: str,
                  self_sufficiency_ratio: float) -> jnp.ndarray:
    """attn: [B, H, N, N] post-softmax. Returns bool votes [B, H, P]."""
    attn = attn.astype(jnp.float32)
    n = attn.shape[-1]
    diag = jnp.diagonal(attn, axis1=-2, axis2=-1)[..., 1:1 + num_patches]  # [B,H,P]
    cls_to_tok = attn[..., 0, 1:1 + num_patches]

    def cls_comparison():
        return diag < cls_to_tok

    def self_sufficiency():
        rows = attn[..., 1:1 + num_patches, :]  # [B,H,P,N]
        eye_cols = jnp.arange(n)[None, None, None, :]
        self_col = (jnp.arange(num_patches) + 1)[None, None, :, None]
        others = jnp.where(eye_cols == self_col, -jnp.inf, rows)
        return diag < jnp.max(others, axis=-1) * self_sufficiency_ratio

    if mode == "cls_comparison":
        return cls_comparison()
    if mode == "self_sufficiency":
        return self_sufficiency()
    if mode == "both":  # union — maximum purification
        return cls_comparison() | self_sufficiency()
    if mode == "either":  # intersection — minimal intervention
        return cls_comparison() & self_sufficiency()
    raise ValueError(f"Unknown detection_mode '{mode}'")


def _valid_neighbor_mean(tokens: jnp.ndarray, grid_h: int, grid_w: int) -> jnp.ndarray:
    """Mean of existing 8-neighbours for EVERY position. tokens: [B, P, C]."""
    b, p, c = tokens.shape
    grid = tokens.reshape(b, grid_h, grid_w, c).astype(jnp.float32)
    total = jnp.zeros_like(grid)
    count = jnp.zeros((grid_h, grid_w), jnp.float32)
    for dy, dx in _OFFSETS:
        ys, ye = max(dy, 0), grid_h + min(dy, 0)
        xs, xe = max(dx, 0), grid_w + min(dx, 0)
        total = total.at[:, ys:ye, xs:xe].add(grid[:, ys - dy:ye - dy, xs - dx:xe - dx])
        count = count.at[ys:ye, xs:xe].add(1.0)
    mean = total / count[None, :, :, None]
    return mean.reshape(b, p, c)


def suppress_outlier_module(tokens: jnp.ndarray, attn: jnp.ndarray,
                            grid_h: int, grid_w: int, *,
                            consensus_threshold: float = 0.5,
                            detection_mode: str = "both",
                            self_sufficiency_ratio: float = 1.0):
    """Purify patch tokens.

    tokens: [B, P, C] patch tokens (no CLS); attn: [B, H, N, N] or [B, N, N].
    Returns (purified_tokens, outlier_mask [B, grid_h, grid_w] bool,
             confidence [B, P] fp32 per-head voting fraction).
    """
    if attn.ndim == 3:
        attn = attn[:, None]
    b, p, _ = tokens.shape
    votes = _detect_votes(attn, p, detection_mode, self_sufficiency_ratio)  # [B,H,P]
    confidence = jnp.mean(votes.astype(jnp.float32), axis=1)  # [B, P]
    mask = confidence > consensus_threshold

    neighbor_mean = _valid_neighbor_mean(tokens, grid_h, grid_w)
    purified = jnp.where(mask[..., None], neighbor_mean.astype(tokens.dtype), tokens)
    return purified, mask.reshape(b, grid_h, grid_w), confidence
