"""BLIP vision transformer (timm-style) with the q·q last-block path.

Re-implements the reference's modified BLIP ViT (reference BLIP/models/vit.py):
standard pre-LN ViT (LayerNorm eps 1e-6, biased patch embed, zero-init CLS,
learned pos-embed, no ln_pre) whose LAST block can run attention-only,
residual-free q·q attention (``Attention.forward_qq`` :87-103,
``Block.forward_attn`` :129-131, forward dispatch :203-223). The BLIP
segmentor path resizes the IMAGE to the trained resolution instead of
interpolating the pos-embed (reference segmentor.py:290).

Param pytree:
  {'patch_embed': {'w': (D,3,p,p), 'b': (D,)}, 'cls_token': (D,),
   'pos_embed': (1+P, D),
   'blocks': [{'norm1': ln, 'attn': {'in_proj_w','in_proj_b','out_proj_w',
   'out_proj_b'}, 'norm2': ln, 'mlp': {'c_fc_w','c_fc_b','c_proj_w',
   'c_proj_b'}}], 'norm': ln}
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from rs_ov.nn.attention import _bmm, _merge_heads, _softmax32, qkv_projection
from rs_ov.nn.layers import gelu, layer_norm, linear, mlp
from rs_ov.nn.vit import _patchify

__all__ = ["BlipVisionConfig", "blip_vit_forward"]

_LN_EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class BlipVisionConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0


def _qq_attention(p: dict, x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """softmax(q q^T / sqrt(d)) v (reference BLIP/models/vit.py:87-103)."""
    q, _, v = qkv_projection(p, x, heads)
    scale = (x.shape[-1] // heads) ** -0.5
    attn = _softmax32(_bmm(q.astype(jnp.float32),
                           q.astype(jnp.float32).transpose(0, 1, 3, 2)) * scale)
    out = _merge_heads(_bmm(attn, v.astype(jnp.float32)).astype(x.dtype))
    return linear(out, p["out_proj_w"], p["out_proj_b"])


def blip_vit_forward(p: dict, images: jnp.ndarray, cfg: BlipVisionConfig,
                     ignore_residual: bool = False) -> jnp.ndarray:
    """[B, 3, H, W] -> [B, 1+P, width] token features (post final norm)."""
    from rs_ov.nn.attention import standard_attention

    b = images.shape[0]
    x = _patchify(images, p["patch_embed"]["w"])
    x = x + p["patch_embed"]["b"].astype(x.dtype)
    cls_tok = jnp.broadcast_to(p["cls_token"][None, None, :],
                               (b, 1, cfg.width)).astype(x.dtype)
    x = jnp.concatenate([cls_tok, x], axis=1)
    x = x + p["pos_embed"][: x.shape[1]].astype(x.dtype)[None]

    n = len(p["blocks"])
    for i, blk in enumerate(p["blocks"]):
        if i == n - 1 and ignore_residual:
            # attention-only, residual-free q.q (reference vit.py:217-218)
            x = _qq_attention(blk["attn"], layer_norm(x, blk["norm1"], eps=_LN_EPS),
                              cfg.heads)
        else:
            attn_out, _ = standard_attention(
                blk["attn"], layer_norm(x, blk["norm1"], eps=_LN_EPS), cfg.heads)
            x = x + attn_out
            x = x + mlp(layer_norm(x, blk["norm2"], eps=_LN_EPS), blk["mlp"], act=gelu)

    return layer_norm(x, p["norm"], eps=_LN_EPS)
