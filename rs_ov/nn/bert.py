"""BERT text encoder (the BLIP 'med' text tower in mode='text').

Functional re-implementation of the encoder path of the reference's
BERT-based Mixture-of-Encoder-Decoder (reference BLIP/models/med.py) as used
by the segmentation pipeline: BLIP_Retrieval calls
``text_encoder(ids, attention_mask, mode='text')`` (reference
blip_retrieval.py / segmentor.py:160-166) which is a plain BERT encoder —
embeddings (word + position, LayerNorm eps 1e-12) and L post-LN transformer
layers with separate q/k/v projections. Passing encoder_hidden_states runs
the MED 'multimodal' mode (per-layer cross-attention over image tokens,
reference med.py:358-370 — the BLIP ITM path; see train/blip_retrieval.py).
The LM-head decoder branch (``causal=True`` + nn/blip_lm.py head/loss/
generate) covers reference med.py:811-930 BertLMHeadModel.

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

import jax
import jax.numpy as jnp

from rs_ov.nn.layers import gelu, layer_norm, linear

__all__ = ["BertConfig", "bert_encode", "bert_decode_init_cache",
           "bert_decode_step"]

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


def _attend(q_in, kv_in, names, layer, heads, scale, mask):
    """Projected multi-head attention context [B, Lq, H] (before the output
    dense — reference med.py BertSelfAttention). Split out so the NLVR
    twin-stream cross-attention (nn/blip_lm.py, reference
    nlvr_encoder.py:250-345) can merge two contexts through its dense0/
    dense1/merge head before the residual LayerNorm."""
    qn, kn, vn = names
    b, lq, h = q_in.shape
    q = _split_heads(linear(q_in, layer[qn + "_w"], layer[qn + "_b"]), heads)
    k = _split_heads(linear(kv_in, layer[kn + "_w"], layer[kn + "_b"]), heads)
    v = _split_heads(linear(kv_in, layer[vn + "_w"], layer[vn + "_b"]), heads)
    attn = jnp.einsum("bhid,bhjd->bhij", q.astype(jnp.float32),
                      k.astype(jnp.float32)) * scale + mask
    attn = jnp.exp(attn - jnp.max(attn, axis=-1, keepdims=True))
    attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
    ctx = jnp.einsum("bhij,bhjd->bhid", attn, v.astype(jnp.float32))
    return ctx.transpose(0, 2, 1, 3).reshape(b, lq, h).astype(q_in.dtype)


def _mha(q_in, kv_in, names, layer, heads, scale, mask, eps):
    """One post-LN attention sub-block: project, attend, dense, LN(residual).

    names = (q, k, v, out, ln) key prefixes into `layer`; kv_in is q_in for
    self-attention, the encoder hidden states for cross-attention
    (reference med.py BertAttention, is_cross_attention — :358-370)."""
    qn, kn, vn, on, lnn = names
    ctx = _attend(q_in, kv_in, (qn, kn, vn), layer, heads, scale, mask)
    out = linear(ctx, layer[on + "_w"], layer[on + "_b"])
    return layer_norm(q_in + out, layer[lnn], eps=eps)


def bert_encode(p: dict, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                cfg: BertConfig,
                position_ids: jnp.ndarray | None = None,
                encoder_hidden_states: jnp.ndarray | None = None,
                encoder_attention_mask: jnp.ndarray | None = None,
                causal: bool = False) -> jnp.ndarray:
    """input_ids/attention_mask: [B, L] -> last_hidden_state [B, L, H].

    position_ids overrides the default 0..L-1 positions (RoBERTa-family
    towers use pad-offset positions, see nn/hf_text.py).

    encoder_hidden_states [B, Lv, Dv] switches each layer into the MED
    'multimodal' mode (reference med.py:358-370): self-attention, then
    cross-attention over the image tokens (q from the text stream, k/v
    from the encoder states through the layer's 'x*' params), then FFN —
    the BLIP ITM path. Layers must carry cross params (init_blip_retrieval
    or a BLIP checkpoint with crossattention weights).

    causal=True runs the MED decoder mode (``is_decoder=True``, reference
    med.py:660-690 get_extended_attention_mask): self-attention additionally
    lower-triangular-masked for next-token prediction (the BLIP LM path —
    see nn/blip_lm.py for the head/loss/generate surface)."""
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
    if causal:
        l = input_ids.shape[1]
        tri = jnp.tril(jnp.ones((l, l), jnp.float32))
        mask = mask + (1.0 - tri)[None, None, :, :] * -10000.0
    if encoder_hidden_states is not None:
        if encoder_attention_mask is None:
            xmask = jnp.zeros((x.shape[0], 1, 1, encoder_hidden_states.shape[1]),
                              jnp.float32)
        else:
            xmask = (1.0 - encoder_attention_mask.astype(jnp.float32)
                     )[:, None, None, :] * -10000.0
    heads = cfg.num_heads
    scale = (cfg.hidden_size // heads) ** -0.5

    for layer in p["layers"]:
        x = _mha(x, x, ("q", "k", "v", "attn_out", "attn_ln"),
                 layer, heads, scale, mask, eps)
        if encoder_hidden_states is not None:
            x = _mha(x, encoder_hidden_states.astype(x.dtype),
                     ("xq", "xk", "xv", "x_out", "x_ln"),
                     layer, heads, scale, xmask, eps)
        inter = gelu(linear(x, layer["inter_w"], layer["inter_b"]))
        out = linear(inter, layer["out_w"], layer["out_b"])
        x = layer_norm(x + out, layer["out_ln"], eps=eps)
    return x


# ---------------------------------------------------------------------------
# incremental (KV-cached) decoding — reference med.py:150-167 past_key_value
# concat, :72-82 position offset. Fixed-shape TPU formulation: per-layer
# [B, heads, max_len, dh] self K/V buffers updated with dynamic_update_slice,
# cross K/V over the encoder states projected ONCE. One compiled step program
# serves the whole generation loop; output tokens are bit-identical to the
# full-prefix bert_encode path (the masked tail positions contribute exact
# fp32 zeros either way).
# ---------------------------------------------------------------------------

def bert_decode_init_cache(p: dict, cfg: BertConfig, batch: int, max_len: int,
                           encoder_hidden_states: jnp.ndarray | None = None,
                           dtype=jnp.float32) -> dict:
    """Allocate the decode cache: zeroed self K/V [B, heads, max_len, dh]
    per layer, plus the per-layer cross K/V of ``encoder_hidden_states``
    (projected once here instead of once per generated token — the second
    half of the reference's past_key_value reuse, med.py:158-161)."""
    heads = cfg.num_heads
    dh = cfg.hidden_size // heads
    layers = []
    for layer in p["layers"]:
        entry = {
            "k": jnp.zeros((batch, heads, max_len, dh), dtype),
            "v": jnp.zeros((batch, heads, max_len, dh), dtype),
        }
        if encoder_hidden_states is not None:
            enc = encoder_hidden_states.astype(dtype)
            entry["xk"] = _split_heads(
                linear(enc, layer["xk_w"], layer["xk_b"]), heads)
            entry["xv"] = _split_heads(
                linear(enc, layer["xv_w"], layer["xv_b"]), heads)
        layers.append(entry)
    return {"layers": layers}


def _attend_cached(q, k, v, mask, scale, out_dtype):
    """Single-query attention over cached K/V (the _attend math at Lq=1)."""
    attn = jnp.einsum("bhid,bhjd->bhij", q.astype(jnp.float32),
                      k.astype(jnp.float32)) * scale + mask
    attn = jnp.exp(attn - jnp.max(attn, axis=-1, keepdims=True))
    attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
    ctx = jnp.einsum("bhij,bhjd->bhid", attn, v.astype(jnp.float32))
    b, h, lq, dh = ctx.shape
    return ctx.transpose(0, 2, 1, 3).reshape(b, lq, h * dh).astype(out_dtype)


def bert_decode_step(p: dict, token_ids: jnp.ndarray, pos: jnp.ndarray,
                     cache: dict, cfg: BertConfig,
                     encoder_attention_mask: jnp.ndarray | None = None,
                     ) -> tuple[jnp.ndarray, dict]:
    """One incremental decoder step.

    token_ids [B] (the tokens at position `pos`), pos scalar int32, cache
    from bert_decode_init_cache -> (hidden [B, H] at `pos`, updated cache).
    Causal masking is implicit: the new token attends cache slots 0..pos.
    encoder_attention_mask [B, Lenc] gates cross-attention (None = attend
    all encoder positions, the HF ones-mask default)."""
    eps = cfg.layer_norm_eps
    emb = p["embeddings"]
    x = emb["word"][token_ids][:, None, :]                       # [B, 1, H]
    pos_emb = jax.lax.dynamic_slice_in_dim(emb["position"], pos, 1, 0)
    x = x + pos_emb.astype(x.dtype)[None]
    if "token_type" in emb:
        x = x + emb["token_type"][0].astype(x.dtype)[None, None, :]
    x = layer_norm(x, emb["ln"], eps=eps)

    max_len = cache["layers"][0]["k"].shape[2]
    mask = jnp.where(jnp.arange(max_len) <= pos, 0.0, -10000.0
                     )[None, None, None, :]                      # [1,1,1,L]
    xmask = None
    if encoder_attention_mask is not None:
        xmask = (1.0 - encoder_attention_mask.astype(jnp.float32)
                 )[:, None, None, :] * -10000.0
    heads = cfg.num_heads
    scale = (cfg.hidden_size // heads) ** -0.5

    new_layers = []
    for layer, lc in zip(p["layers"], cache["layers"]):
        q = _split_heads(linear(x, layer["q_w"], layer["q_b"]), heads)
        k_new = _split_heads(linear(x, layer["k_w"], layer["k_b"]), heads)
        v_new = _split_heads(linear(x, layer["v_w"], layer["v_b"]), heads)
        k = jax.lax.dynamic_update_slice(
            lc["k"], k_new.astype(lc["k"].dtype), (0, 0, pos, 0))
        v = jax.lax.dynamic_update_slice(
            lc["v"], v_new.astype(lc["v"].dtype), (0, 0, pos, 0))
        ctx = _attend_cached(q, k, v, mask, scale, x.dtype)
        out = linear(ctx, layer["attn_out_w"], layer["attn_out_b"])
        x = layer_norm(x + out, layer["attn_ln"], eps=eps)

        nl = dict(lc)
        nl["k"], nl["v"] = k, v
        new_layers.append(nl)
        if "xk" in lc:
            xq = _split_heads(linear(x, layer["xq_w"], layer["xq_b"]), heads)
            xm = xmask if xmask is not None else jnp.zeros(
                (1, 1, 1, lc["xk"].shape[2]), jnp.float32)
            xctx = _attend_cached(xq, lc["xk"], lc["xv"], xm, scale, x.dtype)
            xout = linear(xctx, layer["x_out_w"], layer["x_out_b"])
            x = layer_norm(x + xout, layer["x_ln"], eps=eps)

        inter = gelu(linear(x, layer["inter_w"], layer["inter_b"]))
        out = linear(inter, layer["out_w"], layer["out_b"])
        x = layer_norm(x + out, layer["out_ln"], eps=eps)

    return x[:, 0, :], {"layers": new_layers}
