"""End-to-end decode golden (round-4 VERDICT #8).

A committed tiny checkpoint (tests/fixtures/blip_decode_golden.npz) is
replayed through the WHOLE generate surface — beam-search captioning,
nucleus-sampling captioning, VQA answer ranking and VQA beam generation
(reference BLIP/models/blip.py:78-177 generate, blip_vqa.py:96-167) — and
the decoded strings must match the committed golden byte-for-byte. This is
the regression gate that catches beam-search/sampling/KV-cache drift the
unit parity tests can miss. Regenerate (only on intentional decode-surface
changes) with: python tools/make_blip_decode_golden.py
"""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


@pytest.fixture(scope="module")
def golden():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(FIXDIR), "..", "tools"))
    from make_blip_decode_golden import tiny_cfg, unflatten

    flat = dict(np.load(os.path.join(FIXDIR, "blip_decode_golden.npz")))
    cap = unflatten({k[4:]: v for k, v in flat.items() if k.startswith("cap/")})
    vqa = unflatten({k[4:]: v for k, v in flat.items() if k.startswith("vqa/")})
    with open(os.path.join(FIXDIR, "blip_decode_golden.json")) as f:
        expect = json.load(f)
    return tiny_cfg(), cap, vqa, expect


@pytest.fixture(scope="module")
def tok():
    from rs_ov.text.wordpiece import WordPieceTokenizer

    return WordPieceTokenizer(os.path.join(FIXDIR, "blip_decode_vocab.txt"))


def _inputs(tok):
    rng = np.random.RandomState(0)
    images = rng.randn(2, 3, 32, 32).astype(np.float32)
    q_ids = rng.randint(4, 60, size=(2, 6)).astype(np.int32)
    q_ids[:, 0] = tok.enc_token_id
    q_mask = np.ones((2, 6), np.int32)
    q_mask[1, 4:] = 0
    ans_ids = rng.randint(4, 60, size=(4, 5)).astype(np.int32)
    ans_ids[:, 0] = tok.bos_token_id
    ans_mask = np.ones((4, 5), np.int32)
    return images, q_ids, q_mask, ans_ids, ans_mask


def test_beam_caption_golden(golden, tok):
    from rs_ov.nn.blip_lm import generate_captions

    cfg, cap, _, expect = golden
    images = _inputs(tok)[0]
    got = generate_captions(cap, jnp.asarray(images), cfg, tok,
                            prompt="a picture of ", max_length=14,
                            min_length=3, num_beams=3)
    assert got == expect["beam_captions"]


def test_nucleus_caption_golden(golden, tok):
    from rs_ov.nn.blip_lm import generate_captions

    cfg, cap, _, expect = golden
    images = _inputs(tok)[0]
    got = generate_captions(cap, jnp.asarray(images), cfg, tok,
                            prompt="a picture of ", sample=True,
                            max_length=14, min_length=3,
                            rng=np.random.RandomState(7))
    assert got == expect["nucleus_captions"]


def test_vqa_rank_golden(golden, tok):
    from rs_ov.nn.blip_lm import vqa_rank_answers

    cfg, _, vqa, expect = golden
    images, q_ids, q_mask, ans_ids, ans_mask = _inputs(tok)
    got = vqa_rank_answers(vqa, jnp.asarray(images), jnp.asarray(q_ids),
                           jnp.asarray(q_mask), jnp.asarray(ans_ids),
                           jnp.asarray(ans_mask), cfg, k=4)
    assert [int(i) for i in np.asarray(got)] == expect["vqa_rank_indices"]


def test_vqa_generate_golden(golden, tok):
    from rs_ov.nn.blip_lm import vqa_generate_answers

    cfg, _, vqa, expect = golden
    images, q_ids, q_mask, _, _ = _inputs(tok)
    got = vqa_generate_answers(vqa, jnp.asarray(images), jnp.asarray(q_ids),
                               jnp.asarray(q_mask), cfg, tok, num_beams=2,
                               max_length=8)
    assert got == expect["vqa_generated_answers"]
