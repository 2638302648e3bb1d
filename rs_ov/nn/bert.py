"""BERT text encoder (the BLIP 'med' text tower in mode='text').

Functional re-implementation of the encoder path of the reference's
BERT-based Mixture-of-Encoder-Decoder (reference BLIP/models/med.py) as used
by the segmentation pipeline: BLIP_Retrieval calls
``text_encoder(ids, attention_mask, mode='text')`` (reference
blip_retrieval.py / segmentor.py:160-166) which is a plain BERT encoder —
embeddings (word + position, LayerNorm eps 1e-12) and L post-LN transformer
layers with separate q/k/v projections. Cross-attention / LM-head branches of
med.py are decoder-time features out of this pipeline's scope.

Param pytree:
  {'embeddings': {'word': (V, H), 'position': (P, H), 'token_type': (2, H),
                  'ln': ln},
   'layers': [{'q_w','q_b','k_w','k_b','v_w','v_b',
               'attn_out_w','attn_out_b','attn_ln': ln,
               'inter_w','inter_b','out_w','out_b','out_ln': ln}],
  }
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from rs_ov.nn.layers import gelu, layer_norm, linear

__all__ = ["BertConfig", "bert_encode"]

_LN_EPS = 1e-12


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30524
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    layer_norm_eps: float = _LN_EPS  # RoBERTa-family towers use 1e-5


def _split_heads(x, heads):
    b, l, d = x.shape
    return x.reshape(b, l, heads, d // heads).transpose(0, 2, 1, 3)


def bert_encode(p: dict, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                cfg: BertConfig,
                position_ids: jnp.ndarray | None = None) -> jnp.ndarray:
    """input_ids/attention_mask: [B, L] -> last_hidden_state [B, L, H].

    position_ids overrides the default 0..L-1 positions (RoBERTa-family
    towers use pad-offset positions, see nn/hf_text.py)."""
    eps = cfg.layer_norm_eps
    emb = p["embeddings"]
    x = emb["word"][input_ids]
    if position_ids is None:
        x = x + emb["position"][: input_ids.shape[1]].astype(x.dtype)[None]
    else:
        x = x + emb["position"][position_ids].astype(x.dtype)
    if "token_type" in emb:
        x = x + emb["token_type"][0].astype(x.dtype)[None, None, :]
    x = layer_norm(x, emb["ln"], eps=eps)

    # additive mask: 0 for attend, -inf-ish for padding (HF convention)
    mask = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -10000.0
    heads = cfg.num_heads
    scale = (cfg.hidden_size // heads) ** -0.5

    for layer in p["layers"]:
        q = _split_heads(linear(x, layer["q_w"], layer["q_b"]), heads)
        k = _split_heads(linear(x, layer["k_w"], layer["k_b"]), heads)
        v = _split_heads(linear(x, layer["v_w"], layer["v_b"]), heads)
        attn = jnp.einsum("bhid,bhjd->bhij", q.astype(jnp.float32),
                          k.astype(jnp.float32)) * scale + mask
        attn = jnp.exp(attn - jnp.max(attn, axis=-1, keepdims=True))
        attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
        ctx = jnp.einsum("bhij,bhjd->bhid", attn, v.astype(jnp.float32))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(x.shape).astype(x.dtype)
        attn_out = linear(ctx, layer["attn_out_w"], layer["attn_out_b"])
        x = layer_norm(x + attn_out, layer["attn_ln"], eps=eps)
        inter = gelu(linear(x, layer["inter_w"], layer["inter_b"]))
        out = linear(inter, layer["out_w"], layer["out_b"])
        x = layer_norm(x + out, layer["out_ln"], eps=eps)
    return x
