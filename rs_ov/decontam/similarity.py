"""Similarity-based attention enhancement.

Mid-layer patch features give a pairwise cosine-similarity map which is added
RAW (deliberately un-softmaxed — reference similarity_enhancement.py:116-122)
to the pre-softmax attention logits of the self-self attention modes. In this
framework the "cache" of the reference module becomes an explicit value
threaded through the ViT forward (no mutable module state).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["compute_similarity_map"]


def compute_similarity_map(features: jnp.ndarray, *, temperature: float = 1.0,
                           add_self_similarity: bool = True) -> jnp.ndarray:
    """Pairwise cosine similarity of patch features.

    features: [B, P, D] (CLS excluded). Returns fp32 [B, P, P], scaled by
    1/temperature, diagonal optionally zeroed
    (reference similarity_enhancement.py:37-66).
    """
    f = features.astype(jnp.float32)
    f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
    sim = jnp.einsum("bpd,bqd->bpq", f, f, preferred_element_type=jnp.float32)
    sim = sim / temperature
    if not add_self_similarity:
        p = sim.shape[1]
        sim = sim * (1.0 - jnp.eye(p, dtype=sim.dtype)[None])
    return sim
