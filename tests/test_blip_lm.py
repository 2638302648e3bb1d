"""BLIP MED-decoder family: LM head/loss vs torch oracles, caption loss +
generate, VQA loss/rank, NLVR twin cross-attention.

Reference: BLIP/models/med.py:811-930 (BertLMHeadModel), blip.py:78-177
(BLIP_Decoder), blip_vqa.py:10-184, blip_nlvr.py + nlvr_encoder.py:219-345.
"""

import dataclasses

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rs_ov.nn.bert import BertConfig, bert_encode
from rs_ov.nn.blip import BlipConfig, bert_params_from_state_dict
from rs_ov.nn.blip_lm import (blip_caption_loss, blip_nlvr_forward,
                              blip_vqa_loss, caption_targets,
                              generate_captions, init_blip_decoder_params,
                              init_blip_nlvr_params, init_blip_vqa_params,
                              lm_head_from_state_dict, lm_logits, lm_loss,
                              nlvr_encode, vqa_rank_answers)
from rs_ov.nn.blip_vit import BlipVisionConfig


def _tiny_cfg():
    return BlipConfig(
        vision=BlipVisionConfig(image_size=32, patch_size=8, width=24,
                                layers=2, heads=2),
        text=BertConfig(vocab_size=64, hidden_size=16, num_layers=2,
                        num_heads=2, intermediate_size=32,
                        max_position_embeddings=40),
        embed_dim=8)


# ---------------------------------------------------------------------------
# oracle parity: decoder logits vs transformers BertLMHeadModel
# ---------------------------------------------------------------------------

def test_decoder_logits_match_transformers_lm_head():
    """Causal mask + cross-attention + prediction head against HF's
    BertLMHeadModel(is_decoder=True, add_cross_attention=True) — the model
    reference med.py is derived from (minus its encoder_width tweak, so the
    encoder states here are hidden-size wide)."""
    from transformers import BertConfig as HFConfig, BertLMHeadModel

    hf_cfg = HFConfig(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=64,
                      max_position_embeddings=40, is_decoder=True,
                      add_cross_attention=True)
    torch.manual_seed(0)
    model = BertLMHeadModel(hf_cfg)
    model.eval()

    sd = {f"text_decoder.{k}": v.detach().numpy()
          for k, v in model.state_dict().items()}
    params = bert_params_from_state_dict(sd, "text_decoder")
    head = lm_head_from_state_dict(sd)

    cfg = BertConfig(vocab_size=120, hidden_size=32, num_layers=2,
                     num_heads=2, intermediate_size=64)
    rng = np.random.RandomState(0)
    ids = rng.randint(1, 119, size=(2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    enc = rng.randn(2, 5, 32).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask),
                    encoder_hidden_states=torch.from_numpy(enc)
                    ).logits.numpy()
    hidden = bert_encode(params, jnp.asarray(ids.astype(np.int32)),
                         jnp.asarray(mask.astype(np.int32)), cfg,
                         encoder_hidden_states=jnp.asarray(enc), causal=True)
    got = np.asarray(lm_logits(head, hidden))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=2e-3)


def test_lm_loss_matches_torch_label_smoothing():
    rng = np.random.RandomState(1)
    logits = rng.randn(3, 7, 11).astype(np.float32)
    labels = rng.randint(0, 11, size=(3, 7)).astype(np.int64)
    labels[0, :2] = -100
    labels[2, 5:] = -100

    # reference med.py:910-916 — shift, label_smoothing=0.1, ignore -100
    sl = torch.from_numpy(logits[:, :-1]).reshape(-1, 11)
    ll = torch.from_numpy(labels[:, 1:]).reshape(-1)
    ce = torch.nn.CrossEntropyLoss(reduction="mean", label_smoothing=0.1,
                                   ignore_index=-100)
    ref_mean = float(ce(sl, ll))
    got_mean = float(lm_loss(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got_mean, ref_mean, rtol=1e-5)

    ce_none = torch.nn.CrossEntropyLoss(reduction="none", label_smoothing=0.1,
                                        ignore_index=-100)
    ref_none = ce_none(sl, ll).reshape(3, -1).sum(1).numpy()
    got_none = np.asarray(lm_loss(jnp.asarray(logits), jnp.asarray(labels),
                                  reduction="none"))
    np.testing.assert_allclose(got_none, ref_none, rtol=1e-5)


# ---------------------------------------------------------------------------
# captioning
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def cap():
    cfg = _tiny_cfg()
    params = init_blip_decoder_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_caption_loss_finite_and_causal(cap):
    cfg, params = cap
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32))
    ids = rng.randint(1, 60, size=(2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    loss = float(blip_caption_loss(params, images, jnp.asarray(ids),
                                   jnp.asarray(mask), cfg, prompt_length=3))
    assert np.isfinite(loss) and loss > 0

    # grad flows to both towers
    g = jax.grad(lambda p: blip_caption_loss(p, images, jnp.asarray(ids),
                                             jnp.asarray(mask), cfg))(params)
    assert float(jnp.abs(g["visual"]["cls_token"]).sum()) > 0
    assert float(jnp.abs(g["lm_head"]["t_w"]).sum()) > 0


def test_causal_mask_blocks_future(cap):
    """Logits at position t must not change when a later token changes."""
    cfg, params = cap
    rng = np.random.RandomState(1)
    enc = jnp.asarray(rng.randn(1, 4, cfg.vision.width).astype(np.float32))
    ids = rng.randint(1, 60, size=(1, 8)).astype(np.int32)
    ids2 = ids.copy()
    ids2[0, 6] = (ids2[0, 6] + 1) % 60
    mask = jnp.ones((1, 8), jnp.int32)

    def logits(i):
        h = bert_encode(params["text_decoder"], jnp.asarray(i), mask,
                        cfg.text, encoder_hidden_states=enc, causal=True)
        return np.asarray(lm_logits(params["lm_head"], h))

    a, b = logits(ids), logits(ids2)
    np.testing.assert_allclose(a[0, :6], b[0, :6], atol=1e-6)
    assert np.abs(a[0, 6:] - b[0, 6:]).max() > 0


def test_generate_captions_beam_and_sample(cap, tmp_path):
    cfg, params = cap
    from rs_ov.text.wordpiece import WordPieceTokenizer

    vocab = tmp_path / "vocab.txt"
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "picture", "of",
             "tree", "road", "##s", "water", "build", "##ing"]
    words += [f"w{i}" for i in range(64 - 2 - len(words))]
    vocab.write_text("\n".join(words))
    tok = WordPieceTokenizer(str(vocab))
    assert tok.bos_token_id == 62 and tok.enc_token_id == 63

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32))
    caps = generate_captions(params, images, cfg, tok, prompt="a picture of ",
                             max_length=12, min_length=2, num_beams=2)
    assert len(caps) == 2 and all(isinstance(c, str) for c in caps)
    # deterministic
    assert caps == generate_captions(params, images, cfg, tok,
                                     prompt="a picture of ", max_length=12,
                                     min_length=2, num_beams=2)
    sampled = generate_captions(params, images, cfg, tok,
                                prompt="a picture of ", sample=True,
                                max_length=12, min_length=2,
                                rng=np.random.RandomState(7))
    assert len(sampled) == 2


def test_cached_decode_matches_full_prefix_step(cap):
    """KV-cached incremental decoding (round-4 VERDICT #5; reference
    med.py:150-167 past_key_value) must produce the same logits as the
    full-prefix step at every position — the masked tail slots contribute
    exact fp32 zeros either way."""
    from rs_ov.nn.blip_lm import make_cached_decoder, make_caption_step
    from rs_ov.nn.blip_vit import blip_vit_forward

    cfg, params = cap
    max_length = 12
    rng = np.random.RandomState(5)
    images = jnp.asarray(rng.randn(1, 3, 32, 32).astype(np.float32))
    embs = blip_vit_forward(params["visual"], images, cfg.vision)

    full = make_caption_step(params, cfg, max_length)
    cinit, cstep = make_cached_decoder(params, cfg, max_length)

    seq = rng.randint(1, 60, size=(max_length,)).astype(np.int32)
    ids = np.zeros((1, max_length), np.int32)
    cache = cinit(embs)
    zero = jnp.zeros((1,), jnp.int32)
    for pos in range(max_length - 1):
        ids[0, pos] = seq[pos]
        ref = np.array(full(jnp.asarray(ids), pos, embs))[0]
        got, cache = cstep(jnp.asarray([seq[pos]], jnp.int32), pos, cache,
                           zero)
        np.testing.assert_allclose(np.array(got)[0], ref, atol=1e-5,
                                   rtol=1e-5)


def test_cached_generate_matches_full_prefix(cap, tmp_path):
    """End-to-end: beam and nucleus captions decoded with the KV cache must
    equal the full-prefix path token-for-token."""
    cfg, params = cap
    from rs_ov.text.wordpiece import WordPieceTokenizer

    vocab = tmp_path / "vocab.txt"
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "picture", "of"]
    words += [f"w{i}" for i in range(64 - 2 - len(words))]
    vocab.write_text("\n".join(words))
    tok = WordPieceTokenizer(str(vocab))

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32))
    kw = dict(prompt="a picture of ", max_length=12, min_length=2,
              num_beams=2)
    assert (generate_captions(params, images, cfg, tok, use_cache=True, **kw)
            == generate_captions(params, images, cfg, tok, use_cache=False,
                                 **kw))
    skw = dict(prompt="a picture of ", sample=True, max_length=12,
               min_length=2)
    assert (generate_captions(params, images, cfg, tok, use_cache=True,
                              rng=np.random.RandomState(7), **skw)
            == generate_captions(params, images, cfg, tok, use_cache=False,
                                 rng=np.random.RandomState(7), **skw))


def test_caption_targets():
    ids = jnp.asarray([[5, 9, 3, 0, 0]], jnp.int32)
    t = np.asarray(caption_targets(ids, pad_token_id=0, prompt_length=2))
    np.testing.assert_array_equal(t, [[-100, -100, 3, -100, -100]])


# ---------------------------------------------------------------------------
# VQA
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def vqa():
    cfg = _tiny_cfg()
    params = init_blip_vqa_params(jax.random.PRNGKey(1), cfg)
    return cfg, params


def test_vqa_loss_finite(vqa):
    cfg, params = vqa
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32))
    q_ids = jnp.asarray(rng.randint(1, 60, size=(2, 6)), jnp.int32)
    q_mask = jnp.ones((2, 6), jnp.int32)
    # question 0 has 2 answers, question 1 has 1 (reference n=[2,1])
    a_ids = jnp.asarray(rng.randint(1, 60, size=(3, 5)), jnp.int32)
    a_mask = jnp.ones((3, 5), jnp.int32)
    a2q = jnp.asarray([0, 0, 1], jnp.int32)
    w = jnp.asarray([0.6, 0.4, 1.0], jnp.float32)
    loss = float(blip_vqa_loss(params, images, q_ids, q_mask, a_ids, a_mask,
                               a2q, w, cfg))
    assert np.isfinite(loss) and loss > 0


def test_vqa_rank_matches_bruteforce(vqa):
    """With k = n_answers the shortlist is total, so rank must equal the
    argmax of the full per-candidate LM scores (reference rank_answer
    semantics with an exhaustive top-k)."""
    cfg, params = vqa
    rng = np.random.RandomState(3)
    nq, na = 2, 4
    images = jnp.asarray(rng.randn(nq, 3, 32, 32).astype(np.float32))
    q_ids = jnp.asarray(rng.randint(1, 60, size=(nq, 6)), jnp.int32)
    q_mask = jnp.ones((nq, 6), jnp.int32)
    bos = 62
    ans = rng.randint(1, 60, size=(na, 5)).astype(np.int32)
    ans[:, 0] = bos
    a_mask = np.ones((na, 5), np.int32)

    got = np.asarray(vqa_rank_answers(params, images, q_ids, q_mask,
                                      jnp.asarray(ans), jnp.asarray(a_mask),
                                      cfg, k=na))

    # brute force: full LM score of every answer for every question
    from rs_ov.nn.blip_vit import blip_vit_forward
    from rs_ov.nn.blip_lm import IGNORE_INDEX

    embeds = blip_vit_forward(params["visual"], images, cfg.vision)
    q_states = bert_encode(params["text_encoder"], q_ids, q_mask, cfg.text,
                           encoder_hidden_states=embeds)
    best = []
    for q in range(nq):
        scores = []
        for a in range(na):
            h = bert_encode(params["text_decoder"],
                            jnp.asarray(ans[a:a + 1]),
                            jnp.asarray(a_mask[a:a + 1]), cfg.text,
                            encoder_hidden_states=q_states[q:q + 1],
                            encoder_attention_mask=q_mask[q:q + 1],
                            causal=True)
            lg = lm_logits(params["lm_head"], h)
            tgt = jnp.where(jnp.asarray(ans[a:a + 1]) == 0, IGNORE_INDEX,
                            jnp.asarray(ans[a:a + 1]))
            scores.append(-float(lm_loss(lg, tgt, reduction="none")[0]))
        best.append(int(np.argmax(scores)))
    np.testing.assert_array_equal(got, best)


def test_vqa_generate_answers(vqa, tmp_path):
    """'generate' inference (reference blip_vqa.py:96-112): bos-seeded beam
    over question states; deterministic; one string per question."""
    from rs_ov.nn.blip_lm import vqa_generate_answers
    from rs_ov.text.wordpiece import WordPieceTokenizer

    cfg, params = vqa
    vocab = tmp_path / "vocab.txt"
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]"]
    words += [f"w{i}" for i in range(64 - 2 - len(words))]
    vocab.write_text("\n".join(words))
    tok = WordPieceTokenizer(str(vocab))

    rng = np.random.RandomState(5)
    nq = 2
    images = jnp.asarray(rng.randn(nq, 3, 32, 32).astype(np.float32))
    q_ids = rng.randint(4, 60, size=(nq, 6)).astype(np.int32)
    q_ids[:, 0] = tok.enc_token_id
    q_mask = np.ones((nq, 6), np.int32)
    q_mask[1, 4:] = 0  # padded question — gates the question ENCODER only

    ans = vqa_generate_answers(params, images, jnp.asarray(q_ids),
                               jnp.asarray(q_mask), cfg, tok,
                               num_beams=2, max_length=8)
    assert len(ans) == nq and all(isinstance(a, str) for a in ans)
    assert ans == vqa_generate_answers(params, images, jnp.asarray(q_ids),
                                       jnp.asarray(q_mask), cfg, tok,
                                       num_beams=2, max_length=8)
    # KV-cached decode (the default) must match the full-prefix oracle
    assert ans == vqa_generate_answers(params, images, jnp.asarray(q_ids),
                                       jnp.asarray(q_mask), cfg, tok,
                                       num_beams=2, max_length=8,
                                       use_cache=False)

    # Reference decode semantics (blip_vqa.py:94): question_atts =
    # torch.ones(...) — the DECODER cross-attends ALL question positions,
    # padded included; only the question encoder sees the real mask.
    # Verify at the logits level: with the padded row's q_states, the
    # first-step decoder logits under an all-ones cross-attn mask must
    # differ from the q_mask-gated variant (i.e. the mask choice is live),
    # and vqa_generate_answers' first token must follow the all-ones one.
    from rs_ov.nn.blip_lm import lm_logits
    from rs_ov.nn.blip_vit import blip_vit_forward

    image_embeds = blip_vit_forward(params["visual"], images, cfg.vision)
    q_states = bert_encode(params["text_encoder"], jnp.asarray(q_ids),
                           jnp.asarray(q_mask), cfg.text,
                           encoder_hidden_states=image_embeds)
    max_length = 8
    dec_ids = np.zeros((nq, max_length), np.int32)
    dec_ids[:, 0] = tok.bos_token_id
    dec_mask = (np.arange(max_length)[None, :] <= 0).astype(np.int32)
    dec_mask = np.repeat(dec_mask, nq, axis=0)

    def first_step_logits(cross_mask):
        h = bert_encode(params["text_decoder"], jnp.asarray(dec_ids),
                        jnp.asarray(dec_mask), cfg.text,
                        encoder_hidden_states=q_states,
                        encoder_attention_mask=jnp.asarray(cross_mask),
                        causal=True)
        return np.asarray(lm_logits(params["lm_head"], h)[:, 0, :],
                          dtype=np.float32)

    logits_ones = first_step_logits(np.ones_like(q_mask))
    logits_gated = first_step_logits(q_mask)
    assert not np.allclose(logits_ones[1], logits_gated[1], atol=1e-6), \
        "padded question positions must be reachable by decoder cross-attn"

    # greedy (num_beams=1) first token for the padded row == argmax of the
    # all-ones logits (min_length=1 never bans EOS under HF semantics —
    # total length incl. prompt is already 1 at the first step)
    ans_greedy = vqa_generate_answers(params, images, jnp.asarray(q_ids),
                                      jnp.asarray(q_mask), cfg, tok,
                                      num_beams=1, max_length=8)
    first_tok = tok.decode([int(np.argmax(logits_ones[1]))],
                           skip_special_tokens=True)
    assert ans_greedy[1].split()[:1] == ([first_tok] if first_tok else []), \
        (ans_greedy[1], first_tok)


# ---------------------------------------------------------------------------
# NLVR
# ---------------------------------------------------------------------------

def test_nlvr_twin_collapses_to_single_cross():
    """With both streams' params identical (the reference's checkpoint key
    duplication, blip_nlvr.py:88-98), no merge layers, and emb0 == emb1,
    nlvr_encode must equal the single-stream cross encoder exactly:
    (dense0(ctx) + dense1(ctx)) / 2 == dense(ctx)."""
    cfg = _tiny_cfg()
    params = init_blip_vqa_params(jax.random.PRNGKey(2), cfg)
    single = params["text_encoder"]  # has x* cross params

    import copy
    twin = copy.deepcopy(single)
    for layer in twin["layers"]:
        for s in (0, 1):
            for suf in ("q_w", "q_b", "k_w", "k_b", "v_w", "v_b",
                        "_out_w", "_out_b"):
                layer[f"x{s}{suf}"] = layer[f"x{suf}"]

    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(1, 60, size=(2, 7)), jnp.int32)
    mask = jnp.ones((2, 7), jnp.int32)
    emb = jnp.asarray(rng.randn(2, 5, cfg.vision.width).astype(np.float32))

    ref = bert_encode(single, ids, mask, cfg.text,
                      encoder_hidden_states=emb)
    got = nlvr_encode(twin, ids, mask, emb, emb, cfg.text)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_nlvr_forward_and_loss():
    cfg = _tiny_cfg()
    params = init_blip_nlvr_params(jax.random.PRNGKey(3), cfg)
    # merge layers appear from num_layers//2 (reference layer_num>=6 at 12)
    assert "merge_w" not in params["text_encoder"]["layers"][0]
    assert "merge_w" in params["text_encoder"]["layers"][1]

    rng = np.random.RandomState(0)
    b = 2
    images = jnp.asarray(rng.randn(2 * b, 3, 32, 32).astype(np.float32))
    ids = jnp.asarray(rng.randint(1, 60, size=(b, 7)), jnp.int32)
    mask = jnp.ones((b, 7), jnp.int32)
    logits = blip_nlvr_forward(params, images, ids, mask, cfg)
    assert logits.shape == (b, 2)
    targets = jnp.asarray([0, 1], jnp.int32)
    loss = float(blip_nlvr_forward(params, images, ids, mask, cfg,
                                   targets=targets))
    assert np.isfinite(loss) and loss > 0
    # swapping the two scenes must change the prediction (streams differ)
    swapped = jnp.concatenate([images[b:], images[:b]])
    logits_sw = blip_nlvr_forward(params, swapped, ids, mask, cfg)
    assert np.abs(np.asarray(logits) - np.asarray(logits_sw)).max() > 1e-6


def test_nlvr_encode_matches_reference_nlvr_encoder():
    """nlvr_encode == reference BLIP/models/nlvr_encoder.py BertModel with
    list-valued encoder_hidden_states (twin self0/self1 cross-attention,
    dense0/dense1 averaged below layer 6, merge_layer concat from layer 6 —
    :219-345), weights shared through bert_params_from_state_dict. 8 layers
    so BOTH merge modes are exercised."""
    import torch
    from ref_shim import load_reference_module

    nlvr = load_reference_module("nlvr_encoder")
    hf_cfg = nlvr.BertConfig(vocab_size=80, hidden_size=32,
                             num_hidden_layers=8, num_attention_heads=2,
                             intermediate_size=48,
                             max_position_embeddings=24,
                             add_cross_attention=True, is_decoder=False)
    hf_cfg.encoder_width = 20  # image-token width != hidden on purpose
    torch.manual_seed(0)
    model = nlvr.BertModel(hf_cfg, add_pooling_layer=False)
    model.eval()

    sd = {f"text_encoder.{k}": v.detach().numpy()
          for k, v in model.state_dict().items()}
    params = bert_params_from_state_dict(sd, "text_encoder")
    assert "x0q_w" in params["layers"][0] and "x1q_w" in params["layers"][0]
    assert "merge_w" not in params["layers"][5]
    assert "merge_w" in params["layers"][6]

    cfg = BertConfig(vocab_size=80, hidden_size=32, num_layers=8,
                     num_heads=2, intermediate_size=48,
                     max_position_embeddings=24)
    rng = np.random.RandomState(2)
    ids = rng.randint(1, 79, size=(2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    emb0 = rng.randn(2, 5, 20).astype(np.float32)
    emb1 = rng.randn(2, 5, 20).astype(np.float32)
    atts = torch.ones((2, 5), dtype=torch.long)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask),
                    encoder_hidden_states=[torch.from_numpy(emb0),
                                           torch.from_numpy(emb1)],
                    encoder_attention_mask=[atts, atts],
                    return_dict=True).last_hidden_state.numpy()
    got = np.asarray(nlvr_encode(params, jnp.asarray(ids.astype(np.int32)),
                                 jnp.asarray(mask.astype(np.int32)),
                                 jnp.asarray(emb0), jnp.asarray(emb1), cfg))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=2e-4)
