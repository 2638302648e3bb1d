"""BLIP MED-decoder model family: captioning, VQA, NLVR.

Functional JAX re-design of the reference's generative/dual-image BLIP heads:

- LM head + shifted label-smoothed loss: reference BLIP/models/med.py:501-545
  (BertPredictionHeadTransform/BertLMPredictionHead) and :811-930
  (BertLMHeadModel.forward — shift-by-one, CrossEntropyLoss(label_smoothing=
  0.1), reduction='none' summing per sequence).
- Captioning (BLIP_Decoder): reference BLIP/models/blip.py:78-177 — causal
  MED decoder cross-attending over full ViT image tokens, prompt-masked
  targets, beam/nucleus generate.
- VQA (BLIP_VQA): reference BLIP/models/blip_vqa.py:10-184 — image-grounded
  question encoder (multimodal MED) feeding an answer decoder; train loss
  with per-question answer weights, 'rank' inference (first-token top-k then
  full LM scoring) and 'generate' inference.
- NLVR (BLIP_NLVR): reference BLIP/models/blip_nlvr.py:14-73 +
  nlvr_encoder.py:219-345 — each layer cross-attends over TWO image streams
  through twin parameter sets (self0/self1 + dense0/dense1), merged by
  averaging (layers < merge_from) or a [2H -> H] merge_layer (layers >=
  merge_from, reference layer_num>=6), then a 2-way cls head.

TPU shape discipline: every jitted program below is fixed-shape. Generation
decodes incrementally with per-layer KV caches ([B, heads, max_length, dh]
buffers updated via dynamic_update_slice — the reference's past_key_value
concat, med.py:150-167, in fixed-shape form; make_cached_decoder) with the
cross K/V of the encoder states projected once; tokens are bit-identical to
the full-prefix re-run path (kept as the parity oracle, use_cache=False;
7.4x fewer step-seconds at max_length 40, base size). VQA's per-question
answer fan-out is a static gather index built on the host, not a dynamic
repeat.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from rs_ov.nn.bert import (BertConfig, _attend, _mha, bert_decode_init_cache,
                           bert_decode_step, bert_encode)
from rs_ov.nn.blip import (BlipConfig, bert_params_from_state_dict,
                           blip_visual_params_from_state_dict,
                           init_blip_params)
from rs_ov.nn.blip_vit import blip_vit_forward
from rs_ov.nn.layers import gelu, layer_norm, linear

__all__ = [
    "init_lm_head", "lm_head_from_state_dict", "lm_logits", "lm_loss",
    "add_cross_attention_params", "caption_targets", "blip_caption_loss",
    "make_caption_step", "make_cached_decoder", "generate_captions",
    "init_blip_decoder_params",
    "blip_decoder_params_from_state_dict",
    "init_blip_vqa_params", "blip_vqa_params_from_state_dict",
    "blip_vqa_loss", "vqa_rank_answers", "vqa_generate_answers",
    "nlvr_encode", "blip_nlvr_forward", "init_blip_nlvr_params",
    "blip_nlvr_params_from_state_dict",
]

IGNORE_INDEX = -100  # reference med.py:915 / blip.py:114 masked_fill value


# ---------------------------------------------------------------------------
# LM head + loss (reference med.py:501-545, :903-917)
# ---------------------------------------------------------------------------

def init_lm_head(key, cfg: BertConfig, dtype=jnp.float32) -> dict:
    h, v = cfg.hidden_size, cfg.vocab_size
    k1, k2 = jax.random.split(key)
    s = 0.02
    return {
        "t_w": (jax.random.normal(k1, (h, h)) * s).astype(dtype),
        "t_b": jnp.zeros((h,), dtype),
        "t_ln": {"scale": jnp.ones((h,), dtype), "bias": jnp.zeros((h,), dtype)},
        "dec_w": (jax.random.normal(k2, (v, h)) * s).astype(dtype),
        "dec_b": jnp.zeros((v,), jnp.float32),
    }


def lm_head_from_state_dict(sd, prefix: str = "text_decoder.cls.predictions",
                            dtype=jnp.float32) -> dict:
    """Map reference med.py BertLMPredictionHead weights (``{prefix}.
    transform.dense/LayerNorm, {prefix}.decoder, {prefix}.bias``)."""
    def a(name):
        return jnp.asarray(sd[name], dtype)

    return {
        "t_w": a(f"{prefix}.transform.dense.weight"),
        "t_b": a(f"{prefix}.transform.dense.bias"),
        "t_ln": {"scale": a(f"{prefix}.transform.LayerNorm.weight"),
                 "bias": a(f"{prefix}.transform.LayerNorm.bias")},
        "dec_w": a(f"{prefix}.decoder.weight"),
        "dec_b": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32),
    }


def lm_logits(head: dict, hidden: jnp.ndarray,
              eps: float = 1e-12) -> jnp.ndarray:
    """[B, L, H] -> vocabulary logits [B, L, V] (dense -> gelu -> LN ->
    decoder; reference med.py:511-535)."""
    x = layer_norm(gelu(linear(hidden, head["t_w"], head["t_b"])),
                   head["t_ln"], eps=eps)
    return linear(x, head["dec_w"], head["dec_b"].astype(x.dtype))


def lm_loss(logits: jnp.ndarray, labels: jnp.ndarray,
            reduction: str = "mean",
            label_smoothing: float = 0.1) -> jnp.ndarray:
    """Shift-by-one next-token CE over labels in [0, V) with -100 ignored
    (reference med.py:909-917): torch CrossEntropyLoss(label_smoothing=0.1)
    semantics — loss = (1-eps)*nll + eps*mean_c(-log p_c); reduction='mean'
    averages over non-ignored tokens, 'none' sums per sequence (:916)."""
    logits = logits[:, :-1].astype(jnp.float32)
    labels = labels[:, 1:]
    valid = labels != IGNORE_INDEX
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    per_tok = (1.0 - label_smoothing) * nll + label_smoothing * (-logp).mean(-1)
    per_tok = per_tok * valid
    if reduction == "none":
        return per_tok.sum(-1)
    return per_tok.sum() / jnp.maximum(valid.sum(), 1)


def add_cross_attention_params(key, text_params: dict, cfg: BlipConfig,
                               dtype=jnp.float32, twin: bool = False,
                               merge_from: int | None = None) -> dict:
    """Add per-layer MED cross-attention params over image tokens of width
    ``cfg.vision.width`` (reference med.py BertLayer crossattention). twin=
    True builds the NLVR dual-stream variant (x0*/x1* + merge_layer from
    layer merge_from, default num_layers//2 — reference nlvr_encoder.py:259
    ``merge=(is_cross_attention and layer_num>=6)`` at 12 layers)."""
    h, vw = cfg.text.hidden_size, cfg.vision.width
    if merge_from is None:
        merge_from = cfg.text.num_layers // 2
    s = 0.02
    streams = ("x0", "x1") if twin else ("x",)
    ks = jax.random.split(key, (4 * len(streams) + 1) * cfg.text.num_layers)
    ki = iter(range(len(ks)))

    def lin(o, i):
        return (jax.random.normal(ks[next(ki)], (o, i)) * s).astype(dtype)

    for li, layer in enumerate(text_params["layers"]):
        for st in streams:
            layer.update({
                f"{st}q_w": lin(h, h), f"{st}q_b": jnp.zeros((h,), dtype),
                f"{st}k_w": lin(h, vw), f"{st}k_b": jnp.zeros((h,), dtype),
                f"{st}v_w": lin(h, vw), f"{st}v_b": jnp.zeros((h,), dtype),
                f"{st}_out_w": lin(h, h),
                f"{st}_out_b": jnp.zeros((h,), dtype),
            })
        layer["x_ln"] = {"scale": jnp.ones((h,), dtype),
                         "bias": jnp.zeros((h,), dtype)}
        if twin and li >= merge_from:
            layer["merge_w"] = lin(h, 2 * h)
            layer["merge_b"] = jnp.zeros((h,), dtype)
    return text_params


# ---------------------------------------------------------------------------
# Captioning (reference blip.py:78-177 BLIP_Decoder)
# ---------------------------------------------------------------------------

def init_blip_decoder_params(key, cfg: BlipConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    base = init_blip_params(k1, cfg, dtype=dtype)
    text = add_cross_attention_params(k2, base["text"], cfg, dtype=dtype)
    return {"visual": base["visual"], "text_decoder": text,
            "lm_head": init_lm_head(k3, cfg.text, dtype=dtype)}


def blip_decoder_params_from_state_dict(sd, dtype=jnp.float32) -> dict:
    """Map a BLIP caption checkpoint (``visual_encoder.* /
    text_decoder.bert.* / text_decoder.cls.predictions.*``)."""
    return {"visual": blip_visual_params_from_state_dict(sd, dtype),
            "text_decoder": bert_params_from_state_dict(sd, "text_decoder",
                                                        dtype),
            "lm_head": lm_head_from_state_dict(sd, dtype=dtype)}


def caption_targets(input_ids: jnp.ndarray, pad_token_id: int,
                    prompt_length: int) -> jnp.ndarray:
    """Decoder targets: pad tokens and the prompt prefix -> -100
    (reference blip.py:114-115)."""
    t = jnp.where(input_ids == pad_token_id, IGNORE_INDEX, input_ids)
    pos = jnp.arange(input_ids.shape[1])[None, :]
    return jnp.where(pos < prompt_length, IGNORE_INDEX, t)


def blip_caption_loss(params: dict, images: jnp.ndarray,
                      input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                      cfg: BlipConfig, pad_token_id: int = 0,
                      prompt_length: int = 4,
                      reduction: str = "mean") -> jnp.ndarray:
    """Image-conditioned LM loss (reference blip.py:105-126 forward):
    input_ids[:, 0] must already be the [DEC] bos token."""
    image_embeds = blip_vit_forward(params["visual"], images, cfg.vision)
    hidden = bert_encode(params["text_decoder"], input_ids, attention_mask,
                         cfg.text, encoder_hidden_states=image_embeds,
                         causal=True)
    logits = lm_logits(params["lm_head"], hidden)
    targets = caption_targets(input_ids, pad_token_id, prompt_length)
    return lm_loss(logits, targets, reduction=reduction)


def _penalised(logits, ids_so_far, penalty):
    """HF RepetitionPenaltyLogitsProcessor math (reference blip.py:152)."""
    if penalty != 1.0 and len(ids_so_far):
        prev = np.unique(np.asarray(ids_so_far, np.int64))
        sel = logits[prev]
        logits = logits.copy()
        logits[prev] = np.where(sel > 0, sel / penalty, sel * penalty)
    return logits


def _beam_search(step1, prefix, eos, num_beams, max_length, min_length,
                 repetition_penalty):
    """Plain length-unnormalised beam with early-eos (the HF beam role in
    reference blip.py:160-166). step1(ids [B, max_length], pos) -> [B, V]
    host logits; returns the best finished token sequence.

    min_length follows HF MinLengthLogitsProcessor semantics: EOS is banned
    while the TOTAL sequence length (prompt included) is < min_length —
    i.e. the prompt counts, and min_length=1 never bans (HF allows EOS at
    the first step)."""
    beams = [(0.0, list(prefix))]
    finished = []
    for pos in range(len(prefix) - 1, max_length - 1):
        ids = np.zeros((len(beams), max_length), np.int32)
        for b, (_, s) in enumerate(beams):
            ids[b, :len(s)] = s
        logits = step1(ids, pos)
        nxt_beams = []
        for b, (score, s) in enumerate(beams):
            lg = _penalised(logits[b], s, repetition_penalty)
            if pos + 1 < min_length:
                lg[eos] = -1e9
            logp = lg - np.log(np.exp(lg - lg.max()).sum()) - lg.max()
            for t in np.argsort(-logp)[:num_beams]:
                cand = (score + float(logp[t]), s + [int(t)])
                if t == eos:
                    finished.append(cand)
                else:
                    nxt_beams.append(cand)
        beams = sorted(nxt_beams, key=lambda c: -c[0])[:num_beams]
        if not beams or (len(finished) >= num_beams and
                         finished[0][0] >= beams[0][0]):
            break
    finished.extend(beams)
    return max(finished, key=lambda c: c[0])[1]


@functools.lru_cache(maxsize=None)
def _jitted_visual_encode(vcfg):
    """One compiled image encode per vision config for the generate paths
    (params as jit arguments — closure weights would inline into the HLO;
    eager encode costs hundreds of per-op remote-compile round trips on
    the tunnelled backend)."""
    return jax.jit(lambda vp, im: blip_vit_forward(vp, im, vcfg))


@functools.lru_cache(maxsize=None)
def _jitted_question_encode(cfg: BlipConfig):
    """Image encode + image-conditioned question encoder as ONE compiled
    program (the VQA generate/rank front half)."""

    def f(pp, images, q_ids, q_mask):
        image_embeds = blip_vit_forward(pp["visual"], images, cfg.vision)
        return bert_encode(pp["text_encoder"], q_ids, q_mask, cfg.text,
                           encoder_hidden_states=image_embeds)

    return jax.jit(f)


def make_cached_decoder(params: dict, cfg: BlipConfig, max_length: int):
    """KV-cached fixed-shape decode step (round-4 VERDICT #5; reference
    med.py:150-167 past_key_value concat, :72-82 position offset).

    Returns (init, step):
      init(encoder_states [B, Lenc, D]) -> cache — zeroed per-layer self
        K/V [B, heads, max_length, dh] buffers plus the cross K/V of the
        encoder states projected ONCE;
      step(tokens [B], pos, cache, parent [B]) -> (logits [B, V] fp32,
        cache') — one compiled program per geometry; `parent` gathers the
        cache rows first (beam reordering; pass arange for none).

    Cross-attention attends ALL encoder positions (the generate-path
    convention: captions pass no encoder mask, VQA generate builds
    all-ones question_atts — reference blip.py:141, blip_vqa.py:94).
    Tokens are bit-identical to the full-prefix path: masked tail slots
    contribute exact fp32 zeros either way (tests/test_blip_lm.py)."""
    from rs_ov.core.cache import enable_compilation_cache

    enable_compilation_cache()  # decode-step compiles replay <1s from disk
    text_p = params["text_decoder"]
    dtype = text_p["embeddings"]["word"].dtype

    # params ride as jit ARGUMENTS, not closure constants: closed-over
    # weight pytrees are inlined into the serialized HLO, and at
    # production size that blows the tunnelled backend's remote-compile
    # payload limit (observed HTTP 413 at base size on the CoCa twin of
    # this helper)
    @jax.jit
    def init(tp, encoder_states):
        return bert_decode_init_cache(tp, cfg.text,
                                      encoder_states.shape[0], max_length,
                                      encoder_states, dtype=dtype)

    @jax.jit
    def step(pp, tokens, pos, cache, parent):
        cache = jax.tree_util.tree_map(lambda a: a[parent], cache)
        hidden, cache = bert_decode_step(pp["text_decoder"], tokens, pos,
                                         cache, cfg.text)
        logits = lm_logits(pp["lm_head"], hidden[:, None, :])[:, 0, :]
        return logits.astype(jnp.float32), cache

    return (lambda encoder_states: init(text_p, encoder_states),
            lambda tokens, pos, cache, parent: step(params, tokens, pos,
                                                    cache, parent))


def _beam_search_cached(init, step, encoder_states, prefix, eos, num_beams,
                        max_length, min_length, repetition_penalty):
    """_beam_search over the KV-cached step: cache row b tracks beam b via
    the `parent` gather each step. encoder_states [1, Lenc, D] is tiled to
    the beam batch once at init."""
    nb = num_beams
    cache = init(jnp.repeat(encoder_states, nb, 0))
    arange = jnp.arange(nb, dtype=jnp.int32)

    def stepc(tokens, pos, parent):
        nonlocal cache
        logits, cache = step(jnp.asarray(tokens, jnp.int32), pos, cache,
                             jnp.asarray(parent, jnp.int32))
        return np.array(logits)

    # warm the prompt prefix (all rows identical)
    for t in range(len(prefix) - 1):
        stepc(np.full(nb, prefix[t], np.int32), t, arange)

    beams = [(0.0, list(prefix), 0)]  # (score, seq, cache row after step)
    finished = []
    for pos in range(len(prefix) - 1, max_length - 1):
        toks = np.zeros(nb, np.int32)
        par = np.zeros(nb, np.int32)
        for b, (_, s, p_row) in enumerate(beams):
            toks[b] = s[pos]
            par[b] = p_row
        logits = stepc(toks, pos, par)
        nxt_beams = []
        for b, (score, s, _) in enumerate(beams):
            lg = _penalised(logits[b], s, repetition_penalty)
            if pos + 1 < min_length:
                lg[eos] = -1e9
            logp = lg - np.log(np.exp(lg - lg.max()).sum()) - lg.max()
            for t in np.argsort(-logp)[:num_beams]:
                cand = (score + float(logp[t]), s + [int(t)], b)
                if t == eos:
                    finished.append(cand)
                else:
                    nxt_beams.append(cand)
        beams = sorted(nxt_beams, key=lambda c: -c[0])[:num_beams]
        if not beams or (len(finished) >= num_beams and
                         finished[0][0] >= beams[0][0]):
            break
    finished.extend(beams)
    return max(finished, key=lambda c: c[0])[1]


def make_caption_step(params: dict, cfg: BlipConfig, max_length: int):
    """Jitted fixed-shape decode step: (ids [B, max_length] padded,
    position `pos`, image_embeds) -> next-token logits [B, V] at `pos`.
    One compiled program serves the whole generation loop. Params ride as
    jit arguments (see make_cached_decoder) to keep the serialized HLO
    weight-free."""

    @jax.jit
    def step(pp, ids, pos, image_embeds):
        mask = (jnp.arange(max_length)[None, :] <= pos).astype(jnp.int32)
        hidden = bert_encode(pp["text_decoder"], ids, mask, cfg.text,
                             encoder_hidden_states=image_embeds, causal=True)
        logits = lm_logits(pp["lm_head"], hidden)
        return logits[:, pos, :].astype(jnp.float32)

    return lambda ids, pos, image_embeds: step(params, ids, pos, image_embeds)


def generate_captions(params: dict, images: jnp.ndarray, cfg: BlipConfig,
                      tokenizer, prompt: str = "a picture of ",
                      sample: bool = False, num_beams: int = 3,
                      max_length: int = 30, min_length: int = 10,
                      top_p: float = 0.9, repetition_penalty: float = 1.0,
                      rng: np.random.RandomState | None = None,
                      use_cache: bool = True) -> list[str]:
    """Beam-search / nucleus-sampling captioning (reference blip.py:128-169
    generate). Beam search is per-image plain length-unnormalised beam (the
    reference's HF beam with early eos), nucleus sampling uses
    repetition_penalty 1.1 (:152). use_cache=True (default) decodes with
    the KV-cached incremental step — identical tokens, O(L) less work per
    step; False re-runs the full padded prefix (the parity oracle)."""
    image_embeds = _jitted_visual_encode(cfg.vision)(params["visual"], images)
    n_img = image_embeds.shape[0]
    enc = tokenizer([prompt] * n_img, max_length=max_length)
    prompt_ids = enc["input_ids"][0]
    # reference :139-140 — bos replaces [CLS], trailing [SEP] dropped
    plen = int(enc["attention_mask"][0].sum()) - 1
    prefix = np.concatenate([[tokenizer.bos_token_id], prompt_ids[1:plen]])
    eos = tokenizer.sep_token_id
    if use_cache:
        cinit, cstep = make_cached_decoder(params, cfg, max_length)
    else:
        step = make_caption_step(params, cfg, max_length)
    if sample and rng is None:
        rng = np.random.RandomState(0)

    captions = []
    for i in range(n_img):
        embs_i = image_embeds[i:i + 1]
        if sample:
            seq = list(prefix)
            if use_cache:
                cache = cinit(embs_i)
                zero = jnp.zeros((1,), jnp.int32)

                def logits_at(pos):
                    nonlocal cache
                    lg, cache = cstep(jnp.asarray([seq[pos]], jnp.int32),
                                      pos, cache, zero)
                    return np.array(lg)[0]
            else:
                ids = np.zeros((1, max_length), np.int32)
                ids[0, :len(prefix)] = prefix

                def logits_at(pos):
                    ids[0, :len(seq)] = seq
                    return np.array(step(jnp.asarray(ids), pos, embs_i))[0]
            for pos in range(len(prefix) - 1):  # warm the prompt (cache)
                if use_cache:
                    logits_at(pos)
            for pos in range(len(prefix) - 1, max_length - 1):
                logits = logits_at(pos)
                logits = _penalised(logits, seq, 1.1)
                # HF MinLengthLogitsProcessor: total length, prompt counts
                if pos + 1 < min_length:
                    logits[eos] = -1e9
                p = np.exp(logits - logits.max())
                p /= p.sum()
                order = np.argsort(-p)
                keep = np.cumsum(p[order]) <= top_p
                keep[0] = True
                p2 = np.zeros_like(p)
                p2[order[keep]] = p[order[keep]]
                p2 /= p2.sum()
                nxt = int(rng.choice(len(p2), p=p2))
                seq.append(nxt)
                if nxt == eos:
                    break
            outs = [seq]
        elif use_cache:
            outs = [_beam_search_cached(cinit, cstep, embs_i, prefix, eos,
                                        num_beams, max_length, min_length,
                                        repetition_penalty)]
        else:
            def step1(ids, pos):
                return np.array(step(jnp.asarray(ids), pos,
                                     jnp.repeat(embs_i, len(ids), 0)))
            outs = [_beam_search(step1, prefix, eos, num_beams, max_length,
                                 min_length, repetition_penalty)]
        text = tokenizer.decode(outs[0], skip_special_tokens=True)
        captions.append(text[len(prompt):] if text.startswith(prompt)
                        else text)
    return captions


# ---------------------------------------------------------------------------
# VQA (reference blip_vqa.py:10-184 BLIP_VQA)
# ---------------------------------------------------------------------------

def init_blip_vqa_params(key, cfg: BlipConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    base = init_blip_params(k1, cfg, dtype=dtype)
    enc = add_cross_attention_params(k2, base["text"], cfg, dtype=dtype)
    dec = init_blip_params(k3, cfg, dtype=dtype)["text"]
    # the answer decoder cross-attends over HIDDEN-width question states,
    # not vision-width image tokens (reference blip_vqa.py:69-72)
    dec_cfg = dataclasses.replace(
        cfg, vision=dataclasses.replace(cfg.vision,
                                        width=cfg.text.hidden_size))
    dec = add_cross_attention_params(k4, dec, dec_cfg, dtype=dtype)
    return {"visual": base["visual"], "text_encoder": enc,
            "text_decoder": dec,
            "lm_head": init_lm_head(k5, cfg.text, dtype=dtype)}


def blip_vqa_params_from_state_dict(sd, dtype=jnp.float32) -> dict:
    dec = blip_decoder_params_from_state_dict(sd, dtype=dtype)
    dec["text_encoder"] = bert_params_from_state_dict(sd, "text_encoder",
                                                      dtype)
    return dec


def blip_vqa_loss(params: dict, images: jnp.ndarray,
                  q_ids: jnp.ndarray, q_mask: jnp.ndarray,
                  a_ids: jnp.ndarray, a_mask: jnp.ndarray,
                  answer_to_question: jnp.ndarray, weights: jnp.ndarray,
                  cfg: BlipConfig, pad_token_id: int = 0) -> jnp.ndarray:
    """Train loss (reference blip_vqa.py:46-81). The reference's python
    repeat loop (:61-67 — question b duplicated n[b] times) becomes the
    static gather index ``answer_to_question`` [Na] built by the data
    pipeline; weights [Na] are the per-answer weights, loss is the weighted
    per-answer LM loss summed / n_images (:78-79). q_ids[:, 0] must be
    [ENC], a_ids[:, 0] must be the bos token."""
    image_embeds = blip_vit_forward(params["visual"], images, cfg.vision)
    q_states = bert_encode(params["text_encoder"], q_ids, q_mask, cfg.text,
                           encoder_hidden_states=image_embeds)
    q_states = jnp.take(q_states, answer_to_question, axis=0)
    q_att = jnp.take(q_mask, answer_to_question, axis=0)
    hidden = bert_encode(params["text_decoder"], a_ids, a_mask, cfg.text,
                         encoder_hidden_states=q_states,
                         encoder_attention_mask=q_att, causal=True)
    logits = lm_logits(params["lm_head"], hidden)
    targets = jnp.where(a_ids == pad_token_id, IGNORE_INDEX, a_ids)
    per_answer = lm_loss(logits, targets, reduction="none")
    return (weights * per_answer).sum() / images.shape[0]


def vqa_rank_answers(params: dict, images: jnp.ndarray,
                     q_ids: jnp.ndarray, q_mask: jnp.ndarray,
                     answer_ids: jnp.ndarray, answer_mask: jnp.ndarray,
                     cfg: BlipConfig, k: int = 128,
                     pad_token_id: int = 0) -> jnp.ndarray:
    """'rank' inference (reference blip_vqa.py:113-167 rank_answer): score
    each question's top-k candidate answers (by first-token probability) with
    the full decoder LM log-prob; returns [num_questions] indices into the
    answer list. Fully on-device — the reference's index_select/topk python
    assembly becomes gathers under one jit."""

    @jax.jit
    def rank(params, images, q_ids, q_mask, answer_ids, answer_mask):
        image_embeds = blip_vit_forward(params["visual"], images, cfg.vision)
        q_states = bert_encode(params["text_encoder"], q_ids, q_mask,
                               cfg.text, encoder_hidden_states=image_embeds)
        nq = q_states.shape[0]
        # first forward: bos only -> P(first answer token) (:125-136)
        start = jnp.full((nq, 1), answer_ids[0, 0], jnp.int32)
        h0 = bert_encode(params["text_decoder"], start,
                         jnp.ones((nq, 1), jnp.int32), cfg.text,
                         encoder_hidden_states=q_states,
                         encoder_attention_mask=q_mask, causal=True)
        first_logits = lm_logits(params["lm_head"], h0)[:, 0, :]
        probs = jax.nn.softmax(first_logits.astype(jnp.float32), axis=-1)
        p_first = probs[:, answer_ids[:, 1]]          # [nq, n_answers]
        topk_p, topk_ids = jax.lax.top_k(p_first, k)  # [nq, k]

        # second forward: full LM score of each shortlisted answer (:138-162)
        cand_ids = answer_ids[topk_ids.reshape(-1)]       # [nq*k, L]
        cand_mask = answer_mask[topk_ids.reshape(-1)]
        qs = jnp.repeat(q_states, k, axis=0)
        qa = jnp.repeat(q_mask, k, axis=0)
        hidden = bert_encode(params["text_decoder"], cand_ids, cand_mask,
                             cfg.text, encoder_hidden_states=qs,
                             encoder_attention_mask=qa, causal=True)
        logits = lm_logits(params["lm_head"], hidden)
        targets = jnp.where(cand_ids == pad_token_id, IGNORE_INDEX, cand_ids)
        logp = -lm_loss(logits, targets, reduction="none").reshape(nq, k)
        best = jnp.argmax(logp, axis=1)
        return jnp.take_along_axis(topk_ids, best[:, None], axis=1)[:, 0]

    return rank(params, images, q_ids, q_mask, answer_ids, answer_mask)


def vqa_generate_answers(params: dict, images: jnp.ndarray,
                         q_ids: jnp.ndarray, q_mask: jnp.ndarray,
                         cfg: BlipConfig, tokenizer, num_beams: int = 3,
                         max_length: int = 10, min_length: int = 1,
                         use_cache: bool = True) -> list[str]:
    """'generate' inference (reference blip_vqa.py:96-112): the answer
    decoder beam-searches from a bare bos over question states (question
    encoder output, image-conditioned), eos = [SEP]. q_ids[:, 0] must be the
    [ENC] token (reference :54).

    Decoder cross-attention uses an ALL-ONES mask over the question states
    — the reference generate path builds question_atts = torch.ones(...)
    (blip_vqa.py:94), so padded question positions ARE attended during
    decoding (unlike the 'rank' path, which gates with the real q_mask).
    use_cache=True decodes with the KV-cached incremental step (identical
    tokens; the all-ones mask is the cached decoder's convention)."""
    q_states = _jitted_question_encode(cfg)(params, images, q_ids, q_mask)
    q_mask = jnp.ones_like(jnp.asarray(q_mask))

    if use_cache:
        cinit, cstep = make_cached_decoder(params, cfg, max_length)
    else:
        @jax.jit
        def _step(pp, ids, pos, qs, qm):
            mask = (jnp.arange(max_length)[None, :] <= pos).astype(jnp.int32)
            hidden = bert_encode(pp["text_decoder"], ids, mask, cfg.text,
                                 encoder_hidden_states=qs,
                                 encoder_attention_mask=qm, causal=True)
            return lm_logits(pp["lm_head"], hidden)[:, pos, :].astype(
                jnp.float32)

        def step(ids, pos, qs, qm):  # params as jit args, not HLO constants
            return _step(params, ids, pos, qs, qm)

    eos = tokenizer.sep_token_id
    prefix = np.asarray([tokenizer.bos_token_id], np.int64)
    answers = []
    for i in range(q_states.shape[0]):
        qs_i, qm_i = q_states[i:i + 1], jnp.asarray(q_mask)[i:i + 1]

        if use_cache:
            seq = _beam_search_cached(cinit, cstep, qs_i, prefix, eos,
                                      num_beams, max_length, min_length, 1.0)
        else:
            def step1(ids, pos):
                return np.array(step(jnp.asarray(ids), pos,
                                     jnp.repeat(qs_i, len(ids), 0),
                                     jnp.repeat(qm_i, len(ids), 0)))

            seq = _beam_search(step1, prefix, eos, num_beams, max_length,
                               min_length, 1.0)
        answers.append(tokenizer.decode(seq, skip_special_tokens=True))
    return answers


# ---------------------------------------------------------------------------
# NLVR (reference blip_nlvr.py + nlvr_encoder.py twin cross-attention)
# ---------------------------------------------------------------------------

def nlvr_encode(p: dict, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                emb0: jnp.ndarray, emb1: jnp.ndarray,
                cfg: BertConfig) -> jnp.ndarray:
    """BERT encoder whose every layer cross-attends over two image-token
    streams through twin params (reference nlvr_encoder.py:250-345):
    ctx_s = attend(x, emb_s) through x{s}* params, heads merged by
    (dense0(ctx0)+dense1(ctx1))/2 or merge_layer(concat) when the layer
    carries merge weights (layer_num>=6 in the reference), then
    LN(residual), then the usual FFN."""
    eps = cfg.layer_norm_eps
    emb = p["embeddings"]
    x = emb["word"][input_ids]
    x = x + emb["position"][: input_ids.shape[1]].astype(x.dtype)[None]
    if "token_type" in emb:
        x = x + emb["token_type"][0].astype(x.dtype)[None, None, :]
    x = layer_norm(x, emb["ln"], eps=eps)

    mask = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :] * -10000.0
    xmask = jnp.zeros((x.shape[0], 1, 1, emb0.shape[1]), jnp.float32)
    heads = cfg.num_heads
    scale = (cfg.hidden_size // heads) ** -0.5

    for layer in p["layers"]:
        x = _mha(x, x, ("q", "k", "v", "attn_out", "attn_ln"),
                 layer, heads, scale, mask, eps)
        ctx0 = _attend(x, emb0.astype(x.dtype), ("x0q", "x0k", "x0v"),
                       layer, heads, scale, xmask)
        ctx1 = _attend(x, emb1.astype(x.dtype), ("x1q", "x1k", "x1v"),
                       layer, heads, scale, xmask)
        h0 = linear(ctx0, layer["x0_out_w"], layer["x0_out_b"])
        h1 = linear(ctx1, layer["x1_out_w"], layer["x1_out_b"])
        if "merge_w" in layer:
            h = linear(jnp.concatenate([h0, h1], axis=-1),
                       layer["merge_w"], layer["merge_b"])
        else:
            h = (h0 + h1) / 2
        x = layer_norm(x + h, layer["x_ln"], eps=eps)
        inter = gelu(linear(x, layer["inter_w"], layer["inter_b"]))
        out = linear(inter, layer["out_w"], layer["out_b"])
        x = layer_norm(x + out, layer["out_ln"], eps=eps)
    return x


def init_blip_nlvr_params(key, cfg: BlipConfig, dtype=jnp.float32) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    base = init_blip_params(k1, cfg, dtype=dtype)
    text = add_cross_attention_params(k2, base["text"], cfg, dtype=dtype,
                                      twin=True)
    h = cfg.text.hidden_size
    s = 0.02
    return {"visual": base["visual"], "text_encoder": text,
            "cls_head": {
                "w1": (jax.random.normal(k3, (h, h)) * s).astype(dtype),
                "b1": jnp.zeros((h,), dtype),
                "w2": (jax.random.normal(k4, (2, h)) * s).astype(dtype),
                "b2": jnp.zeros((2,), dtype)}}


def blip_nlvr_params_from_state_dict(sd, dtype=jnp.float32) -> dict:
    """Map a BLIP-NLVR checkpoint — retrieval/caption checkpoints become
    NLVR-loadable after the reference's key duplication (self -> self0/self1,
    dense -> dense0/dense1; reference blip_nlvr.py:88-98 load_checkpoint)."""
    return {"visual": blip_visual_params_from_state_dict(sd, dtype),
            "text_encoder": bert_params_from_state_dict(sd, "text_encoder",
                                                        dtype),
            "cls_head": {"w1": jnp.asarray(sd["cls_head.0.weight"], dtype),
                         "b1": jnp.asarray(sd["cls_head.0.bias"], dtype),
                         "w2": jnp.asarray(sd["cls_head.2.weight"], dtype),
                         "b2": jnp.asarray(sd["cls_head.2.bias"], dtype)}}


def blip_nlvr_forward(params: dict, images: jnp.ndarray,
                      input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                      cfg: BlipConfig,
                      targets: jnp.ndarray | None = None) -> jnp.ndarray:
    """images [2B, 3, S, S] (the two scenes stacked, reference
    blip_nlvr.py:44-46 torch.split), text [B, L] with input_ids[:, 0] =
    [ENC]. Returns [B, 2] logits, or the mean CE loss when targets given
    (:61-63)."""
    image_embeds = blip_vit_forward(params["visual"], images, cfg.vision)
    b = input_ids.shape[0]
    emb0, emb1 = image_embeds[:b], image_embeds[b:]
    hidden = nlvr_encode(params["text_encoder"], input_ids, attention_mask,
                         emb0, emb1, cfg.text)
    ch = params["cls_head"]
    x = jax.nn.relu(linear(hidden[:, 0, :], ch["w1"], ch["b1"]))
    logits = linear(x, ch["w2"], ch["b2"])
    if targets is None:
        return logits
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, targets[:, None], axis=-1).mean()
