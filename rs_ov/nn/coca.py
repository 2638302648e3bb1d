"""CoCa (Contrastive Captioner), TPU-native.

Re-implements the reference's CoCa stack (reference open_clip/coca_model.py
:80-268 and the pieces of open_clip/transformer.py it assembles):

  * ``AttentionalPooler`` (transformer.py:167-187): learned queries
    cross-attend over encoder tokens (torch MultiheadAttention with
    kdim = context_dim, i.e. separate q/k/v projection shapes).
  * CoCa vision tower: plain ViT trunk, then the "original OpenCLIP CoCa
    setup" pooling (transformer.py:757-760): attn_pool -> ln_post ->
    first-token/rest split -> shared [embed, embed] proj.
  * CoCa text tower: TextTransformer with ``embed_cls`` — a learned CLS
    appended at the END of the sequence, a pad-aware cls mask added to the
    causal mask (transformer.py:1055-1062), pooled = last token with
    ln_final applied AFTER pooling, tokens returned un-normed
    (transformer.py:1083-1099).
  * ``MultimodalTransformer`` decoder (transformer.py:1103-1194):
    per layer a causal self-attention block then a cross-attention block
    (queries = text, keys/values = ln_1_kv(image tokens),
    transformer.py:242-245), then ln_final and a [width, vocab] projection
    to caption logits.
  * ``CoCa.forward`` output contract (coca_model.py:157-186): image/text
    latents, caption logits, labels = text[:, -tokens:], logit_scale.
  * ``generate`` (coca_model.py:188-268): autoregressive top-k / top-p
    sampling ported; the reference's HuggingFace grouped beam search is
    replaced by a plain beam search (generation_type='beam_search').
    Decoding runs KV-cached by default (make_coca_cached_decoder — one
    compiled fixed-shape step instead of the reference's per-length
    full-prefix re-runs); the full-prefix path is the parity oracle.

The CoCa contrastive+caption LOSS lives in rs_ov/train/losses.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rs_ov.core.config import CLIPConfig, TextConfig, VisionConfig
from rs_ov.nn.attention import _bmm, _merge_heads, _softmax32, _split_heads, standard_attention
from rs_ov.nn.layers import gelu, layer_norm, linear, mlp, quick_gelu
from rs_ov.nn.vit import _patchify
from rs_ov.text.encoder import causal_mask

__all__ = [
    "MultimodalConfig", "CoCaConfig", "attentional_pool",
    "coca_encode_image", "coca_encode_text", "multimodal_decoder",
    "coca_forward", "coca_generate", "init_coca_params",
    "coca_decode_init_cache", "coca_decode_step", "make_coca_cached_decoder",
]


@dataclasses.dataclass(frozen=True)
class MultimodalConfig:
    context_length: int = 76
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0


@dataclasses.dataclass(frozen=True)
class CoCaConfig:
    embed_dim: int
    vision: VisionConfig
    text: TextConfig
    multimodal: MultimodalConfig
    quick_gelu: bool = False
    attn_pooler_heads: int = 8
    attn_pooler_queries: int = 256
    pad_id: int = 0


def coca_base_config() -> CoCaConfig:
    """reference model_configs/coca_ViT-B-32.json."""
    return CoCaConfig(
        embed_dim=512,
        vision=VisionConfig(image_size=224, patch_size=32, width=768,
                            layers=12, output_dim=512, head_width=64),
        text=TextConfig(context_length=76, vocab_size=49408, width=512,
                        heads=8, layers=12, output_dim=512, pool_type="last"),
        multimodal=MultimodalConfig(context_length=76, vocab_size=49408,
                                    width=512, heads=8, layers=12),
    )


# ---------------------------------------------------------------------------
# attentional pooler
# ---------------------------------------------------------------------------

def attentional_pool(p: dict, x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Learned queries attend over tokens (reference transformer.py:182-187).

    x: [B, L, ctx_dim] -> [B, n_queries, d_model]. torch MultiheadAttention
    with kdim=vdim=ctx_dim uses separate q/k/v projection weights and a
    fused 3*d bias."""
    d_model = p["query"].shape[-1]
    k_in = layer_norm(x, p["ln_k"])
    q_in = layer_norm(p["query"], p["ln_q"])  # [nq, d]
    bq, bk, bv = jnp.split(p["in_proj_b"], 3)
    q = linear(q_in, p["q_proj_w"], bq)[None]                  # [1, nq, d]
    k = linear(k_in, p["k_proj_w"], bk)
    v = linear(k_in, p["v_proj_w"], bv)
    q = _split_heads(jnp.broadcast_to(q, (x.shape[0],) + q.shape[1:]), heads)
    k, v = _split_heads(k, heads), _split_heads(v, heads)
    scale = (d_model // heads) ** -0.5
    attn = _softmax32(_bmm(q * scale, k.transpose(0, 1, 3, 2)))
    out = _merge_heads(_bmm(attn, v.astype(jnp.float32)).astype(x.dtype))
    return linear(out, p["out_proj_w"], p["out_proj_b"])


# ---------------------------------------------------------------------------
# towers
# ---------------------------------------------------------------------------

def coca_encode_image(p: dict, images: jnp.ndarray, cfg: CoCaConfig,
                      normalize: bool = True):
    """[B, 3, H, W] -> (image_latent [B, D], image_embs [B, nq-1, D])."""
    v = p["visual"]
    vcfg = cfg.vision
    act = quick_gelu if cfg.quick_gelu else gelu
    b = images.shape[0]
    x = _patchify(images, v["conv1_w"])
    cls_tok = jnp.broadcast_to(v["class_embedding"][None, None, :],
                               (b, 1, vcfg.width)).astype(x.dtype)
    x = jnp.concatenate([cls_tok, x], axis=1)
    x = x + v["positional_embedding"].astype(x.dtype)[None]
    x = layer_norm(x, v["ln_pre"])
    for blk in v["blocks"]:
        attn_out, _ = standard_attention(blk["attn"], layer_norm(x, blk["ln_1"]),
                                         vcfg.heads)
        x = x + attn_out
        x = x + mlp(layer_norm(x, blk["ln_2"]), blk["mlp"], act=act)
    # original OpenCLIP CoCa pooling (reference transformer.py:757-760)
    x = attentional_pool(v["attn_pool"], x, cfg.attn_pooler_heads)
    x = layer_norm(x, v["ln_post"])
    pooled, tokens = x[:, 0], x[:, 1:]
    pooled = pooled @ v["proj"].astype(x.dtype)
    tokens = tokens @ v["proj"].astype(x.dtype)
    if normalize:
        p32 = pooled.astype(jnp.float32)
        pooled = (p32 / jnp.maximum(jnp.linalg.norm(p32, axis=-1, keepdims=True),
                                    1e-12)).astype(pooled.dtype)
    return pooled, tokens


def coca_encode_text(p: dict, text_ids: jnp.ndarray, cfg: CoCaConfig,
                     normalize: bool = True):
    """embed_cls text tower: learned CLS appended at the END (reference
    transformer.py:1064-1099). Returns (text_latent [B, D],
    token_embs [B, L, width] — un-normed, pre-ln_final).

    Configs with an HF text tower (coca_roberta-ViT-B-32) dispatch to
    rs_ov.nn.hf_text instead (reference model.py:182-190 builds an
    HFTextEncoder with output_tokens=True there)."""
    t = p["text"]
    tcfg = cfg.text
    if tcfg.hf_model_name:
        from rs_ov.nn.hf_text import hf_text_config, hf_text_encode

        hcfg = hf_text_config(tcfg.hf_model_name, output_dim=cfg.embed_dim,
                              proj_type=tcfg.hf_proj_type)
        pooled, tokens = hf_text_encode(t, text_ids, hcfg, output_tokens=True)
        if normalize:
            p32 = pooled.astype(jnp.float32)
            pooled = (p32 / jnp.maximum(
                jnp.linalg.norm(p32, axis=-1, keepdims=True), 1e-12)
            ).astype(pooled.dtype)
        return pooled, tokens
    act = quick_gelu if cfg.quick_gelu else gelu
    b, seq = text_ids.shape
    x = t["token_embedding"][text_ids]
    cls = jnp.broadcast_to(t["cls_emb"][None, None, :], (b, 1, tcfg.width))
    x = jnp.concatenate([x, cls.astype(x.dtype)], axis=1)
    # causal mask + pad-aware cls mask (reference build_cls_mask :1055-1062,
    # replicated exactly: text-query rows get NO extra restriction — the
    # F.pad row-fill is True — only the appended-CLS row is pad-gated, with
    # an always-True column prepended)
    mask = causal_mask(seq + 1)
    keep = text_ids != cfg.pad_id                       # [B, seq]
    keep = jnp.pad(keep, ((0, 0), (1, 0)), constant_values=True)  # [B, seq+1]
    cls_row = jnp.where(keep, 0.0, -jnp.inf)            # additive, CLS row only
    cls_mask = jnp.zeros((b, seq + 1, seq + 1))
    cls_mask = cls_mask.at[:, -1, :].set(cls_row)
    mask = mask[None] + cls_mask
    x = x + t["positional_embedding"][:seq + 1].astype(x.dtype)[None]
    for blk in t["blocks"]:
        attn_out, _ = standard_attention(blk["attn"], layer_norm(x, blk["ln_1"]),
                                         tcfg.heads, mask=mask[:, None])
        x = x + attn_out
        x = x + mlp(layer_norm(x, blk["ln_2"]), blk["mlp"], act=act)
    pooled, tokens = x[:, -1], x[:, :-1]
    pooled = layer_norm(pooled, t["ln_final"])  # final LN after pooling
    pooled = pooled @ t["text_projection"].astype(x.dtype)
    if normalize:
        p32 = pooled.astype(jnp.float32)
        pooled = (p32 / jnp.maximum(jnp.linalg.norm(p32, axis=-1, keepdims=True),
                                    1e-12)).astype(pooled.dtype)
    return pooled, tokens


def _cross_attention(p: dict, q_x: jnp.ndarray, kv: jnp.ndarray, heads: int):
    """torch MultiheadAttention(q, k, v) with a fused in_proj split across
    q/k/v (reference transformer.py:218-233)."""
    d = q_x.shape[-1]
    wq, wk, wv = jnp.split(p["in_proj_w"], 3, axis=0)
    bq, bk, bv = jnp.split(p["in_proj_b"], 3)
    q = _split_heads(linear(q_x, wq, bq), heads)
    k = _split_heads(linear(kv, wk, bk), heads)
    v = _split_heads(linear(kv, wv, bv), heads)
    scale = (d // heads) ** -0.5
    attn = _softmax32(_bmm(q * scale, k.transpose(0, 1, 3, 2)))
    out = _merge_heads(_bmm(attn, v.astype(jnp.float32)).astype(q_x.dtype))
    return linear(out, p["out_proj_w"], p["out_proj_b"])


def multimodal_decoder(p: dict, image_embs: jnp.ndarray, text_embs: jnp.ndarray,
                       cfg: CoCaConfig) -> jnp.ndarray:
    """Caption logits [B, L, vocab] (reference transformer.py:1171-1194)."""
    m = p["multimodal"]
    mcfg = cfg.multimodal
    act = quick_gelu if cfg.quick_gelu else gelu
    seq = text_embs.shape[1]
    mask = causal_mask(mcfg.context_length)[:seq, :seq]
    x = text_embs
    for blk, xblk in zip(m["blocks"], m["cross_blocks"]):
        attn_out, _ = standard_attention(blk["attn"], layer_norm(x, blk["ln_1"]),
                                         mcfg.heads, mask=mask)
        x = x + attn_out
        x = x + mlp(layer_norm(x, blk["ln_2"]), blk["mlp"], act=act)
        kv = layer_norm(image_embs, xblk["ln_1_kv"])
        x = x + _cross_attention(xblk["attn"], layer_norm(x, xblk["ln_1"]),
                                 kv, mcfg.heads)
        x = x + mlp(layer_norm(x, xblk["ln_2"]), xblk["mlp"], act=act)
    x = layer_norm(x, m["ln_final"])
    return x @ m["text_projection"].astype(x.dtype)


def coca_forward(p: dict, images, texts, cfg: CoCaConfig,
                 image_latent=None, image_embs=None) -> dict:
    """The reference CoCa.forward output contract (coca_model.py:157-186)."""
    if image_latent is None or image_embs is None:
        image_latent, image_embs = coca_encode_image(p, images, cfg)
    if texts is None:
        return {"image_features": image_latent, "image_embs": image_embs}
    text_latent, token_embs = coca_encode_text(p, texts, cfg)
    labels = texts[:, -token_embs.shape[1]:]
    logits = multimodal_decoder(p, image_embs, token_embs, cfg)
    return {"image_features": image_latent, "text_features": text_latent,
            "logits": logits, "labels": labels,
            "logit_scale": jnp.exp(p["logit_scale"])}


# ---------------------------------------------------------------------------
# KV-cached incremental decoding
# ---------------------------------------------------------------------------
#
# The reference CoCa re-runs the FULL text prefix through the text tower and
# multimodal decoder for every generated token (coca_model.py:243-268, one
# `_encode_text` + decoder pass per step) — O(L^2) per caption AND, traced
# naively, one XLA compile per sequence length. Both towers are strictly
# causal for the token positions (the appended CLS sits at the END of the
# sequence, so tokens can never attend it — transformer.py:1055-1062 — and
# generation never reads the CLS-pooled latent), so the idiomatic TPU form
# is the same fixed-shape KV-cached step the MED decoder uses
# (rs_ov/nn/bert.py bert_decode_step): per-layer [B, H, max_len, dh] self
# K/V buffers updated with dynamic_update_slice, cross K/V of the image
# tokens projected ONCE at init, one compiled program for every step.


def _cached_self_attn(attn_p: dict, x_ln: jnp.ndarray, k_cache, v_cache,
                      pos, heads: int, out_dtype):
    """standard_attention at Lq=1 over cached K/V (identical precision
    pattern: fp32 logits + softmax, product operands follow the cache
    dtype). Returns (attn_out [B, 1, D], k', v')."""
    qkv = linear(x_ln, attn_p["in_proj_w"], attn_p["in_proj_b"])
    q, k_new, v_new = jnp.split(qkv, 3, axis=-1)
    q = _split_heads(q, heads)
    k = jax.lax.dynamic_update_slice(
        k_cache, _split_heads(k_new, heads).astype(k_cache.dtype), (0, 0, pos, 0))
    v = jax.lax.dynamic_update_slice(
        v_cache, _split_heads(v_new, heads).astype(v_cache.dtype), (0, 0, pos, 0))
    scale = (x_ln.shape[-1] // heads) ** -0.5
    mask = jnp.where(jnp.arange(k.shape[2])[None, None, None, :] <= pos,
                     0.0, -jnp.inf)
    attn = _bmm(q * scale, k.transpose(0, 1, 3, 2)) + mask
    attn = _softmax32(attn)
    out = _merge_heads(_bmm(attn.astype(v.dtype), v).astype(out_dtype))
    return linear(out, attn_p["out_proj_w"], attn_p["out_proj_b"]), k, v


def coca_decode_init_cache(p: dict, image_embs: jnp.ndarray, cfg: CoCaConfig,
                           max_len: int) -> dict:
    """Zeroed self K/V for every text-tower and multimodal layer, plus the
    per-layer cross K/V of ln_1_kv(image_embs) projected once (instead of
    once per generated token)."""
    tcfg, mcfg = cfg.text, cfg.multimodal
    b = image_embs.shape[0]
    dtype = p["text"]["token_embedding"].dtype

    def zeros(heads, width):
        return jnp.zeros((b, heads, max_len, width // heads), dtype)

    text_layers = [{"k": zeros(tcfg.heads, tcfg.width),
                    "v": zeros(tcfg.heads, tcfg.width)}
                   for _ in p["text"]["blocks"]]
    mm_layers = []
    for xblk in p["multimodal"]["cross_blocks"]:
        kvin = layer_norm(image_embs, xblk["ln_1_kv"])
        _, wk, wv = jnp.split(xblk["attn"]["in_proj_w"], 3, axis=0)
        _, bk, bv = jnp.split(xblk["attn"]["in_proj_b"], 3)
        mm_layers.append({
            "k": zeros(mcfg.heads, mcfg.width),
            "v": zeros(mcfg.heads, mcfg.width),
            "xk": _split_heads(linear(kvin, wk, bk), mcfg.heads),
            "xv": _split_heads(linear(kvin, wv, bv), mcfg.heads),
        })
    return {"text": text_layers, "mm": mm_layers}


def coca_decode_step(p: dict, tokens: jnp.ndarray, pos, cache: dict,
                     cfg: CoCaConfig):
    """One incremental token: text-tower embedding of `tokens` [B] at
    position `pos` (the appended CLS never enters — causal token rows
    cannot attend it and generation never uses the pooled latent), then the
    multimodal decoder -> (next-token logits [B, vocab] fp32, cache')."""
    t, m = p["text"], p["multimodal"]
    tcfg, mcfg = cfg.text, cfg.multimodal
    act = quick_gelu if cfg.quick_gelu else gelu

    x = t["token_embedding"][tokens][:, None, :]
    pos_emb = jax.lax.dynamic_slice_in_dim(t["positional_embedding"], pos, 1, 0)
    x = x + pos_emb.astype(x.dtype)[None]
    new_text = []
    for blk, lc in zip(t["blocks"], cache["text"]):
        a, k, v = _cached_self_attn(blk["attn"], layer_norm(x, blk["ln_1"]),
                                    lc["k"], lc["v"], pos, tcfg.heads, x.dtype)
        x = x + a
        x = x + mlp(layer_norm(x, blk["ln_2"]), blk["mlp"], act=act)
        new_text.append({"k": k, "v": v})

    new_mm = []
    scale = (mcfg.width // mcfg.heads) ** -0.5
    for blk, xblk, lc in zip(m["blocks"], m["cross_blocks"], cache["mm"]):
        a, k, v = _cached_self_attn(blk["attn"], layer_norm(x, blk["ln_1"]),
                                    lc["k"], lc["v"], pos, mcfg.heads, x.dtype)
        x = x + a
        x = x + mlp(layer_norm(x, blk["ln_2"]), blk["mlp"], act=act)
        # _cross_attention at Lq=1 over the precomputed image K/V
        wq = jnp.split(xblk["attn"]["in_proj_w"], 3, axis=0)[0]
        bq = jnp.split(xblk["attn"]["in_proj_b"], 3)[0]
        q = _split_heads(linear(layer_norm(x, xblk["ln_1"]), wq, bq),
                         mcfg.heads)
        attn = _softmax32(_bmm(q * scale, lc["xk"].transpose(0, 1, 3, 2)))
        out = _merge_heads(_bmm(attn, lc["xv"].astype(jnp.float32))
                           .astype(x.dtype))
        x = x + linear(out, xblk["attn"]["out_proj_w"],
                       xblk["attn"]["out_proj_b"])
        x = x + mlp(layer_norm(x, xblk["ln_2"]), xblk["mlp"], act=act)
        new_mm.append({"k": k, "v": v, "xk": lc["xk"], "xv": lc["xv"]})

    x = layer_norm(x, m["ln_final"])
    logits = x @ m["text_projection"].astype(x.dtype)
    return logits[:, 0].astype(jnp.float32), {"text": new_text, "mm": new_mm}


def make_coca_cached_decoder(p: dict, cfg: CoCaConfig, max_length: int):
    """(init, step) pair à la blip_lm.make_cached_decoder:
      init(image_embs [B, nq-1, D]) -> cache;
      step(tokens [B], pos, cache, parent [B]) -> (logits [B, V], cache')
    — `parent` gathers cache rows first (beam reordering; arange = none).
    One compiled program per geometry; `pos` is a traced scalar.

    Params ride as jit ARGUMENTS (functools.partial), not closure
    constants: closed-over weight pytrees are inlined into the serialized
    HLO, and at production size that blows the remote-compile payload
    limit of the tunnelled backend (observed HTTP 413 at CoCa-Base)."""
    from rs_ov.core.cache import enable_compilation_cache

    enable_compilation_cache()  # decode-step compiles replay <1s from disk

    @functools.partial(jax.jit, static_argnums=2)
    def init(pp, image_embs, _max_len):
        return coca_decode_init_cache(pp, image_embs, cfg, _max_len)

    @jax.jit
    def step(pp, tokens, pos, cache, parent):
        cache = jax.tree_util.tree_map(lambda a: a[parent], cache)
        return coca_decode_step(pp, tokens, pos, cache, cfg)

    return (lambda image_embs: init(p, image_embs, max_length),
            lambda tokens, pos, cache, parent: step(p, tokens, pos, cache,
                                                    parent))


# ---------------------------------------------------------------------------
# generation (coca_model.py:188-268)
# ---------------------------------------------------------------------------

def _warp_top_k(logits: np.ndarray, k: int) -> np.ndarray:
    kth = np.sort(logits, axis=-1)[:, -k][:, None]
    return np.where(logits < kth, -np.inf, logits)


def _warp_top_p(logits: np.ndarray, top_p: float) -> np.ndarray:
    order = np.argsort(-logits, axis=-1)
    sorted_logits = np.take_along_axis(logits, order, axis=-1)
    probs = np.exp(sorted_logits - sorted_logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    cum = np.cumsum(probs, axis=-1)
    # HF TopPLogitsWarper: keep the minimal top set with mass >= top_p
    # (the top-1 token always survives: its exclusive cumsum is 0)
    drop_sorted = cum - probs >= top_p
    drop = np.zeros_like(drop_sorted)
    np.put_along_axis(drop, order, drop_sorted, axis=-1)
    return np.where(drop, -np.inf, logits)


@functools.lru_cache(maxsize=None)
def _jitted_encode_image(cfg: CoCaConfig):
    """One compiled image encode per config for the generate path (params
    ride as jit arguments — closed-over weights would inline into the
    serialized HLO and blow the tunnelled backend's compile payload
    limit). Eager encode costs ~100+ per-op dispatches per call on a
    remote backend."""
    return jax.jit(lambda pp, im: coca_encode_image(pp, im, cfg))


def _rep_penalise(logits: np.ndarray, seqs, penalty: float) -> np.ndarray:
    """The reference's repetition penalty (coca_model.py via HF
    RepetitionPenaltyLogitsProcessor): seen tokens' logits divided (if
    positive) or multiplied (if negative) by the penalty."""
    if penalty == 1.0:
        return logits
    for i, s in enumerate(seqs):
        seen = np.unique(np.asarray(s))
        pos = logits[i, seen] > 0
        logits[i, seen] = np.where(pos, logits[i, seen] / penalty,
                                   logits[i, seen] * penalty)
    return logits


def coca_generate(p: dict, images, cfg: CoCaConfig, *, seq_len: int = 30,
                  temperature: float = 1.0, generation_type: str = "beam_search",
                  top_p: float = 0.1, top_k: int = 1, num_beams: int = 6,
                  min_seq_len: int = 5, repetition_penalty: float = 1.0,
                  sot_token_id: int = 49406, eos_token_id: int = 49407,
                  pad_token_id: Optional[int] = None, seed: int = 0,
                  fixed_output_length: bool = False,
                  use_cache: bool = True) -> np.ndarray:
    """Autoregressive caption generation. top_k / top_p sample per step; the
    reference's HF grouped beam search (coca_model.py:270+) is covered by a
    plain length-normalised beam search.

    use_cache=True (default) decodes with the fixed-shape KV-cached step
    (make_coca_cached_decoder) — one compiled program for the whole loop
    instead of the reference's per-length full-prefix re-runs
    (coca_model.py:243-268). Tokens match the full-prefix path
    (tests/test_coca_cached.py); the full-prefix path remains as the
    parity oracle and the fallback for HF text towers and
    seq_len > context_length (where the uncached path's sliding window
    applies)."""
    pad_token_id = cfg.pad_id if pad_token_id is None else pad_token_id
    image_latent, image_embs = _jitted_encode_image(cfg)(p, images)
    b = image_embs.shape[0]
    rng = np.random.RandomState(seed)

    cacheable = (use_cache and not cfg.text.hf_model_name
                 and seq_len <= min(cfg.text.context_length,
                                    cfg.multimodal.context_length))
    if cacheable:
        initf, stepf = make_coca_cached_decoder(p, cfg, seq_len)

        def make_stepper(embs_rows):
            state = {"cache": initf(embs_rows)}

            def stepc(toks, pos, parent) -> np.ndarray:
                logits, state["cache"] = stepf(
                    jnp.asarray(toks, jnp.int32), jnp.asarray(pos, jnp.int32),
                    state["cache"], jnp.asarray(parent, jnp.int32))
                return np.asarray(logits).astype(np.float64)

            return stepc

    # sliding window for prefixes beyond the context: the reference slices
    # out[:, -max_seq_len:] (coca_model.py:277) with max_seq_len = ctx + 1,
    # which overflows its own positional table (num_pos = ctx + 1 but the
    # appended CLS needs one more row) the moment the window fills; clamp
    # to what the text tower (ctx tokens + CLS) and the multimodal mask
    # (ctx rows) can actually represent
    window = min(cfg.text.context_length, cfg.multimodal.context_length)

    def step_logits(out: np.ndarray, embs) -> np.ndarray:
        texts = jnp.asarray(out[:, -window:])
        d = coca_forward(p, None, texts, cfg,
                         image_latent=jnp.zeros((out.shape[0], cfg.embed_dim)),
                         image_embs=embs)
        logits = np.asarray(d["logits"][:, -1]).astype(np.float64)
        return _rep_penalise(logits, list(out), repetition_penalty)

    if generation_type == "beam_search":
        finished = []
        for i in range(b):
            embs_i = image_embs[i:i + 1]
            stepc = (make_stepper(jnp.repeat(embs_i, num_beams, axis=0))
                     if cacheable else None)
            beams = [(0.0, [sot_token_id], 0)]  # (score, seq, cache row)
            done = []
            for it in range(seq_len - 1):
                cand = []
                if cacheable:
                    toks = np.zeros(num_beams, np.int32)
                    par = np.zeros(num_beams, np.int32)
                    for bi, (_, s, row_i) in enumerate(beams):
                        toks[bi] = s[-1]
                        par[bi] = row_i
                    logits = stepc(toks, it, par)[:len(beams)]
                    logits = _rep_penalise(logits, [s for _, s, _ in beams],
                                           repetition_penalty)
                else:
                    out = np.asarray([bm[1] for bm in beams], np.int32)
                    logits = step_logits(
                        out, jnp.repeat(embs_i, len(beams), axis=0))
                m = logits.max(-1, keepdims=True)
                logp = logits - m - np.log(np.exp(logits - m).sum(-1, keepdims=True))
                for bi, ((score, toks_b, _), row) in enumerate(zip(beams, logp)):
                    if len(toks_b) <= min_seq_len:
                        row = row.copy()
                        row[eos_token_id] = -np.inf
                    for tok in np.argsort(-row)[:num_beams]:
                        cand.append((score + float(row[tok]),
                                     toks_b + [int(tok)], bi))
                cand.sort(key=lambda sc: sc[0] / len(sc[1]), reverse=True)
                beams = []
                for sc in cand:
                    if sc[1][-1] == eos_token_id:
                        done.append(sc)
                    else:
                        beams.append(sc)
                    if len(beams) == num_beams:
                        break
                if not beams:
                    break
            done.extend(beams)
            best = max(done, key=lambda sc: sc[0] / len(sc[1]))[1]
            finished.append(best)
        width = seq_len if fixed_output_length else max(len(f) for f in finished)
        out = np.full((b, width), pad_token_id, np.int32)
        for i, f in enumerate(finished):
            out[i, :min(len(f), width)] = f[:width]
        return out

    if generation_type not in ("top_k", "top_p"):
        raise ValueError("generation_type has to be one of "
                         "| beam_search | top_p | top_k |.")
    out = np.full((b, 1), sot_token_id, np.int32)
    stepc = make_stepper(image_embs) if cacheable else None
    arange = np.arange(b, dtype=np.int32)
    while out.shape[1] < seq_len:
        if cacheable:
            logits = stepc(out[:, -1], out.shape[1] - 1, arange)
            logits = _rep_penalise(logits, list(out), repetition_penalty)
        else:
            logits = step_logits(out, image_embs)
        logits = logits / max(temperature, 1e-8)
        if out.shape[1] < min_seq_len:
            logits[:, eos_token_id] = -np.inf
        logits = (_warp_top_k(logits, top_k) if generation_type == "top_k"
                  else _warp_top_p(logits, top_p))
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        nxt = np.array([rng.choice(len(pr), p=pr) for pr in probs], np.int32)
        stopped = (out[:, -1] == eos_token_id) | (out[:, -1] == pad_token_id)
        nxt = np.where(stopped, pad_token_id, nxt)
        out = np.concatenate([out, nxt[:, None]], axis=1)
        if bool(np.all((out[:, -1] == eos_token_id) | (out[:, -1] == pad_token_id))):
            break
    return out


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def _init_ln(width, dtype):
    return {"scale": jnp.ones((width,), dtype), "bias": jnp.zeros((width,), dtype)}


def _init_block(key, width, mlp_ratio, dtype):
    ks = jax.random.split(key, 4)
    mw = int(width * mlp_ratio)
    s = width ** -0.5
    return {
        "ln_1": _init_ln(width, dtype), "ln_2": _init_ln(width, dtype),
        "attn": {
            "in_proj_w": (jax.random.normal(ks[0], (3 * width, width)) * s).astype(dtype),
            "in_proj_b": jnp.zeros((3 * width,), dtype),
            "out_proj_w": (jax.random.normal(ks[1], (width, width)) * s).astype(dtype),
            "out_proj_b": jnp.zeros((width,), dtype),
        },
        "mlp": {
            "c_fc_w": (jax.random.normal(ks[2], (mw, width)) * s).astype(dtype),
            "c_fc_b": jnp.zeros((mw,), dtype),
            "c_proj_w": (jax.random.normal(ks[3], (width, mw)) * (2 * width) ** -0.5).astype(dtype),
            "c_proj_b": jnp.zeros((width,), dtype),
        },
    }


def _init_attn_pool(key, d_model, ctx_dim, n_queries, dtype):
    ks = jax.random.split(key, 5)
    s = d_model ** -0.5
    return {
        "query": jax.random.normal(ks[0], (n_queries, d_model)).astype(dtype),
        "ln_q": _init_ln(d_model, dtype), "ln_k": _init_ln(ctx_dim, dtype),
        "q_proj_w": (jax.random.normal(ks[1], (d_model, d_model)) * s).astype(dtype),
        "k_proj_w": (jax.random.normal(ks[2], (d_model, ctx_dim)) * s).astype(dtype),
        "v_proj_w": (jax.random.normal(ks[3], (d_model, ctx_dim)) * s).astype(dtype),
        "in_proj_b": jnp.zeros((3 * d_model,), dtype),
        "out_proj_w": (jax.random.normal(ks[4], (d_model, d_model)) * s).astype(dtype),
        "out_proj_b": jnp.zeros((d_model,), dtype),
    }


def init_coca_params(key, cfg: CoCaConfig, dtype=jnp.float32) -> dict:
    kv, kt, km, kp = jax.random.split(key, 4)
    vcfg, tcfg, mcfg = cfg.vision, cfg.text, cfg.multimodal
    grid = vcfg.image_size // vcfg.patch_size
    vks = jax.random.split(kv, vcfg.layers + 4)
    tks = jax.random.split(kt, tcfg.layers + 3)
    mks = jax.random.split(km, 2 * mcfg.layers + 1)
    d = cfg.embed_dim
    visual = {
        "conv1_w": (jax.random.normal(vks[0], (vcfg.width, 3, vcfg.patch_size,
                                               vcfg.patch_size))
                    * (3 * vcfg.patch_size ** 2) ** -0.5).astype(dtype),
        "class_embedding": (jax.random.normal(vks[1], (vcfg.width,))
                            * vcfg.width ** -0.5).astype(dtype),
        "positional_embedding": (jax.random.normal(
            vks[2], (grid * grid + 1, vcfg.width)) * vcfg.width ** -0.5).astype(dtype),
        "ln_pre": _init_ln(vcfg.width, dtype),
        "blocks": [_init_block(vks[3 + i], vcfg.width, vcfg.mlp_ratio, dtype)
                   for i in range(vcfg.layers)],
        "attn_pool": _init_attn_pool(vks[-1], d, vcfg.width,
                                     cfg.attn_pooler_queries, dtype),
        "ln_post": _init_ln(d, dtype),  # pool_dim = output_dim for attn_pool
        "proj": (jax.random.normal(kp, (d, d)) * d ** -0.5).astype(dtype),
    }
    if tcfg.hf_model_name:
        from rs_ov.nn.hf_text import hf_text_config, init_hf_text_params

        text = init_hf_text_params(
            kt, hf_text_config(tcfg.hf_model_name, output_dim=cfg.embed_dim,
                               proj_type=tcfg.hf_proj_type), dtype)
    else:
        text = {
            "token_embedding": (jax.random.normal(
                tks[0], (tcfg.vocab_size, tcfg.width)) * 0.02).astype(dtype),
            "positional_embedding": (jax.random.normal(
                tks[1], (tcfg.context_length + 1, tcfg.width)) * 0.01).astype(dtype),
            "cls_emb": (jax.random.normal(tks[2], (tcfg.width,)) * 0.01).astype(dtype),
            "blocks": [_init_block(tks[3 + i], tcfg.width, tcfg.mlp_ratio, dtype)
                       for i in range(tcfg.layers)],
            "ln_final": _init_ln(tcfg.width, dtype),
            "text_projection": (jax.random.normal(km, (tcfg.width, tcfg.output_dim))
                                * tcfg.width ** -0.5).astype(dtype),
        }
    cross = []
    for i in range(mcfg.layers):
        blk = _init_block(mks[mcfg.layers + i], mcfg.width, mcfg.mlp_ratio, dtype)
        blk["ln_1_kv"] = _init_ln(mcfg.width, dtype)
        cross.append(blk)
    multimodal = {
        "blocks": [_init_block(mks[i], mcfg.width, mcfg.mlp_ratio, dtype)
                   for i in range(mcfg.layers)],
        "cross_blocks": cross,
        "ln_final": _init_ln(mcfg.width, dtype),
        "text_projection": (jax.random.normal(mks[-1], (mcfg.width, mcfg.vocab_size))
                            * mcfg.width ** -0.5).astype(dtype),
    }
    return {"visual": visual, "text": text, "multimodal": multimodal,
            "logit_scale": jnp.asarray(np.log(1 / 0.07), dtype)}
