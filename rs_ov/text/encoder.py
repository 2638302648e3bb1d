"""CLIP text transformer forward (reference open_clip/model.py:288-306 +
transformer.py:957-1100): token embed + pos embed -> causal 12-layer
transformer -> ln_final -> argmax-EOT pooling -> text projection."""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from rs_ov.core.config import TextConfig
from rs_ov.nn.layers import gelu, layer_norm, quick_gelu
from rs_ov.nn.attention import standard_attention
from rs_ov.nn.layers import mlp

__all__ = ["text_forward", "causal_mask"]


@functools.lru_cache(maxsize=None)
def _causal_mask_np(n: int) -> np.ndarray:
    mask = np.full((n, n), -np.inf, dtype=np.float32)
    return np.triu(mask, 1)


def causal_mask(n: int) -> jnp.ndarray:
    return jnp.asarray(_causal_mask_np(n))


def text_forward(p: dict, text_ids: jnp.ndarray, cfg: TextConfig,
                 quick_gelu_act: bool = False, normalize: bool = False) -> jnp.ndarray:
    """text_ids: int [B, ctx] (0-padded). Returns [B, output_dim] embeddings."""
    act = quick_gelu if quick_gelu_act else gelu
    eps = cfg.norm_eps if cfg.norm_eps is not None else 1e-5  # SigLIP 1e-6
    x = p["token_embedding"][text_ids]  # [B, ctx, width]
    x = x + p["positional_embedding"].astype(x.dtype)[None]
    mask = None if cfg.no_causal_mask else causal_mask(cfg.context_length)

    for blk in p["blocks"]:
        attn_out, _ = standard_attention(
            blk["attn"], layer_norm(x, blk["ln_1"], eps), cfg.heads, mask=mask)
        x = x + attn_out
        x = x + mlp(layer_norm(x, blk["ln_2"], eps), blk["mlp"], act=act)

    x = layer_norm(x, p["ln_final"], eps)

    if cfg.pool_type == "argmax":
        # EOT token has the highest id in each row (reference transformer.py:947-950)
        eot_idx = jnp.argmax(text_ids, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot_idx]
    elif cfg.pool_type == "first":
        pooled = x[:, 0]
    elif cfg.pool_type == "last":
        pooled = x[:, -1]
    else:
        pooled = x

    out = jnp.einsum("bd,de->be", pooled.astype(jnp.float32),
                     p["text_projection"].astype(jnp.float32),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if "text_projection_b" in p:  # SigLIP-family proj_bias
        out = out + p["text_projection_b"].astype(out.dtype)
    if normalize:
        out32 = out.astype(jnp.float32)
        out = (out32 / jnp.maximum(jnp.linalg.norm(out32, axis=-1, keepdims=True), 1e-12)
               ).astype(out.dtype)
    return out
