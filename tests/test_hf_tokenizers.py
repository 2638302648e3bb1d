"""HF/SigLIP tokenizer wrappers: local-asset loading, SigLIP cleaning +
pad/eos semantics, and the tokenize -> encode_text round trip for a
SigLIP-style text config (reference tokenizer.py:397-510)."""

import dataclasses
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_tokenizer_json(tmp_path_factory):
    """Build a tiny WordPiece fast-tokenizer file with the `tokenizers` lib
    (the same rust backend transformers' fast tokenizers use)."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordPiece
    from tokenizers.pre_tokenizers import Whitespace

    vocab = {"[UNK]": 0, "<eos>": 1, "a": 2, "photo": 3, "of": 4,
             "building": 5, "road": 6, "water": 7, "the": 8}
    tok = Tokenizer(WordPiece(vocab=vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    tok.save(str(path))
    return str(path)


def test_siglip_tokenizer_semantics(tiny_tokenizer_json):
    from rs_ov.text.hf_tokenizers import SigLipTokenizer

    t = SigLipTokenizer(tiny_tokenizer_json, context_length=8)
    ids = t(["A Photo, of a BUILDING!", "road"])
    assert ids.shape == (2, 8) and ids.dtype == np.int32
    # canonicalize cleaning lowercases and strips punctuation
    row = [i for i in ids[0].tolist() if i not in (0, 1)]
    assert row == [2, 3, 4, 2, 5]  # a photo of a building
    # pad id forced to 1 (SigLIP convention), fills the tail
    assert ids[1, -1] == 1

    # named remote vocabs refuse with the canonical URL (zero egress)
    with pytest.raises(FileNotFoundError):
        SigLipTokenizer("c4-en")


def test_hf_tokenizer_local_and_missing(tiny_tokenizer_json):
    from rs_ov.text.hf_tokenizers import HFTokenizer

    t = HFTokenizer(tiny_tokenizer_json, context_length=6)
    ids = t("a photo of water")
    assert ids.shape == (1, 6)
    with pytest.raises(FileNotFoundError):
        HFTokenizer("bert-base-uncased")  # not a local asset here


def test_get_tokenizer_routing(tiny_tokenizer_json):
    from rs_ov.factory import get_tokenizer
    from rs_ov.text.hf_tokenizers import SigLipTokenizer
    from rs_ov.text.tokenizer import SimpleTokenizer

    assert isinstance(get_tokenizer("ViT-B-16"), SimpleTokenizer)
    t = get_tokenizer("ViT-B-16-SigLIP",
                      local_tokenizer_path=tiny_tokenizer_json)
    assert isinstance(t, SigLipTokenizer)
    assert t.context_length == 64


def test_siglip_tokenize_encode_roundtrip(tiny_tokenizer_json):
    """tokenize -> text_forward with SigLIP text semantics (no causal mask,
    last-token pool, proj bias, 1e-6-eps friendly shapes)."""
    from rs_ov.core.config import get_model_config
    from rs_ov.core.params import init_text_params
    from rs_ov.text.encoder import text_forward
    from rs_ov.text.hf_tokenizers import SigLipTokenizer

    scfg = get_model_config("ViT-B-16-SigLIP").text
    tiny = dataclasses.replace(scfg, width=32, heads=2, layers=2,
                               vocab_size=16, context_length=8, output_dim=24)
    t = SigLipTokenizer(tiny_tokenizer_json, context_length=8)
    ids = t(["a photo of a building", "a photo of a road", "water"])
    p = init_text_params(jax.random.PRNGKey(0), tiny)
    assert "text_projection_b" in p  # proj_bias=True flows into params
    emb = text_forward(p, jnp.asarray(ids), tiny, normalize=True)
    assert emb.shape == (3, 24)
    n = np.linalg.norm(np.asarray(emb, np.float32), axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-5)
    # different texts give different embeddings; identical prefixes padded
    # identically give identical ones
    emb2 = text_forward(p, jnp.asarray(t(["a photo of a building"])), tiny,
                        normalize=True)
    np.testing.assert_allclose(np.asarray(emb)[0], np.asarray(emb2)[0],
                               atol=1e-6)
    assert not np.allclose(np.asarray(emb)[0], np.asarray(emb)[2])
