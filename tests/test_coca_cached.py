"""KV-cached CoCa decoding (rs_ov/nn/coca.py make_coca_cached_decoder).

The reference CoCa generate re-runs the full text prefix per step
(reference open_clip/coca_model.py:243-268); rs_ov decodes with fixed-shape
per-layer KV caches. These tests pin the cached step to the full-prefix
oracle: per-position logits parity and end-to-end token equality for
beam search and (deterministic) top-k sampling.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rs_ov.core.config import TextConfig, VisionConfig
from rs_ov.nn.coca import (CoCaConfig, MultimodalConfig, coca_encode_image,
                           coca_forward, coca_generate, init_coca_params,
                           make_coca_cached_decoder)

SMALL = CoCaConfig(
    embed_dim=16,
    vision=VisionConfig(image_size=32, patch_size=16, width=24, layers=2,
                        output_dim=16, head_width=12),
    text=TextConfig(context_length=12, vocab_size=64, width=16, heads=2,
                    layers=2, output_dim=16, pool_type="last"),
    multimodal=MultimodalConfig(context_length=12, vocab_size=64, width=16,
                                heads=2, layers=2),
    attn_pooler_queries=8, attn_pooler_heads=2,
)


@pytest.fixture(scope="module")
def setup():
    params = init_coca_params(jax.random.PRNGKey(0), SMALL)
    rng = np.random.RandomState(7)
    images = jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32))
    _, image_embs = coca_encode_image(params, images, SMALL)
    return params, images, image_embs


def test_cached_step_logits_match_full_prefix(setup):
    """Every cached step's next-token logits equal the full-prefix
    coca_forward logits at that position (the reference semantics)."""
    params, _, image_embs = setup
    max_len = 9
    rng = np.random.RandomState(1)
    texts = rng.randint(1, 63, size=(2, max_len)).astype(np.int32)

    full = coca_forward(params, None, jnp.asarray(texts), SMALL,
                        image_latent=jnp.zeros((2, 16)),
                        image_embs=image_embs)["logits"]  # [2, max_len, V]

    init, step = make_coca_cached_decoder(params, SMALL, max_len)
    cache = init(image_embs)
    arange = jnp.arange(2, dtype=jnp.int32)
    for pos in range(max_len):
        logits, cache = step(jnp.asarray(texts[:, pos]),
                             jnp.asarray(pos, jnp.int32), cache, arange)
        np.testing.assert_allclose(np.asarray(logits),
                                   np.asarray(full[:, pos]).astype(np.float32),
                                   rtol=2e-5, atol=2e-5)


def test_cached_beam_parity(setup):
    """use_cache=True beam search produces the same tokens as the
    full-prefix oracle path."""
    params, images, _ = setup
    kw = dict(seq_len=8, min_seq_len=2, generation_type="beam_search",
              num_beams=3, sot_token_id=1, eos_token_id=2)
    got = coca_generate(params, images, SMALL, use_cache=True, **kw)
    want = coca_generate(params, images, SMALL, use_cache=False, **kw)
    np.testing.assert_array_equal(got, want)


def test_cached_beam_parity_with_rep_penalty(setup):
    params, images, _ = setup
    kw = dict(seq_len=8, min_seq_len=2, generation_type="beam_search",
              num_beams=2, repetition_penalty=1.3,
              sot_token_id=1, eos_token_id=2)
    got = coca_generate(params, images, SMALL, use_cache=True, **kw)
    want = coca_generate(params, images, SMALL, use_cache=False, **kw)
    np.testing.assert_array_equal(got, want)


def test_cached_topk_parity(setup):
    """top_k=1 (deterministic argmax sampling) matches the oracle path."""
    params, images, _ = setup
    kw = dict(seq_len=8, min_seq_len=2, generation_type="top_k", top_k=1,
              sot_token_id=1, eos_token_id=2, seed=3)
    got = coca_generate(params, images, SMALL, use_cache=True, **kw)
    want = coca_generate(params, images, SMALL, use_cache=False, **kw)
    np.testing.assert_array_equal(got, want)


def test_seq_len_beyond_context_falls_back(setup):
    """seq_len > context_length uses the sliding-window full-prefix path
    (the cached decoder's absolute positions cannot represent the window)."""
    params, images, _ = setup
    out = coca_generate(params, images, SMALL, seq_len=14, min_seq_len=2,
                        generation_type="top_k", top_k=1,
                        sot_token_id=1, eos_token_id=2, use_cache=True)
    assert out.shape[0] == 2 and out.shape[1] <= 14
    assert (out[:, 0] == 1).all()
