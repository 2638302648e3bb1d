"""Logit post-processing: scale, softmax, synonym merge, argmax, threshold.

Mirrors reference segmentor.py:475-532 ``postprocess_result``:
  seg_logits * logit_scale -> softmax over queries -> synonym-merge (max over
  queries mapping to the same class via a one-hot index matrix) -> argmax ->
  probabilities below prob_thd become bg_idx.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["postprocess_logits", "query_onehot"]


def query_onehot(query_idx: list[int]) -> np.ndarray:
    """[num_cls, num_queries] one-hot map of query -> class."""
    num_queries = len(query_idx)
    num_cls = max(query_idx) + 1
    onehot = np.zeros((num_cls, num_queries), np.float32)
    for q, c in enumerate(query_idx):
        onehot[c, q] = 1.0
    return onehot


def postprocess_logits(seg_logits: jnp.ndarray, onehot: jnp.ndarray, *,
                       logit_scale: float, prob_thd: float, bg_idx: int,
                       pred_dtype=jnp.int32):
    """seg_logits: [Q, H, W] raw cosine logits. Returns (probs [C,H,W],
    seg_pred [1,H,W] in pred_dtype — int32 default; uint8 shrinks the
    per-image device->host download 4x when num classes and bg_idx fit)."""
    x = seg_logits.astype(jnp.float32) * logit_scale
    x = jax.nn.softmax(x, axis=0)  # over queries
    num_cls, num_queries = onehot.shape
    if num_cls != num_queries:
        # merge synonyms: per class, max over its queries (probs are >= 0 so
        # the one-hot-multiply + max trick of the reference is exact)
        x = jnp.max(x[None, :, :, :] * onehot[:, :, None, None], axis=1)
    seg_pred = jnp.argmax(x, axis=0, keepdims=True).astype(pred_dtype)
    seg_pred = jnp.where(jnp.max(x, axis=0, keepdims=True) < prob_thd,
                         jnp.asarray(bg_idx, pred_dtype), seg_pred)
    return x, seg_pred
