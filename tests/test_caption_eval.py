"""Caption-generation evaluation loop + rank-shard result files.

Reference: BLIP/eval_nocaps.py:30-51 (evaluate: generate per batch, collect
{"image_id", "caption"} records) and BLIP data/utils.py save_result
(rank-stamped shard files merged by rank 0, duplicates dropped by key).
"""

import json

import jax
import numpy as np
import pytest

from rs_ov.nn.bert import BertConfig
from rs_ov.nn.blip import BlipConfig
from rs_ov.nn.blip_vit import BlipVisionConfig
from rs_ov.nn.blip_lm import init_blip_decoder_params
from rs_ov.evalsuite.caption import (evaluate_captions, merge_results,
                                     save_result)

TINY = BlipConfig(
    vision=BlipVisionConfig(image_size=32, patch_size=16, width=16,
                            layers=2, heads=2),
    text=BertConfig(vocab_size=64, hidden_size=16, num_layers=2, num_heads=2,
                    intermediate_size=32, max_position_embeddings=16),
    embed_dim=8,
)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    params = init_blip_decoder_params(jax.random.PRNGKey(0), TINY)
    from rs_ov.text.wordpiece import WordPieceTokenizer

    vocab = tmp_path_factory.mktemp("v") / "vocab.txt"
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "picture", "of"]
    words += [f"w{i}" for i in range(64 - 2 - len(words))]
    vocab.write_text("\n".join(words))
    return params, WordPieceTokenizer(str(vocab))


def test_evaluate_captions_records_and_tail_padding(setup):
    params, tok = setup
    rng = np.random.RandomState(0)
    images = rng.randn(5, 3, 32, 32).astype(np.float32)
    ids = [107, 12, 54, 3, 99]
    res = evaluate_captions(params, TINY, images, ids, tok, batch=2,
                            num_beams=2, max_length=10, min_length=1)
    assert [r["image_id"] for r in res] == ids  # tail batch (1 of 2) trimmed
    assert all(isinstance(r["caption"], str) for r in res)
    # batched loop == one-at-a-time loop (padding must not leak)
    solo = evaluate_captions(params, TINY, images, ids, tok, batch=1,
                             num_beams=2, max_length=10, min_length=1)
    assert [r["caption"] for r in res] == [r["caption"] for r in solo]


def test_save_and_merge_rank_shards(tmp_path):
    r0 = [{"image_id": 1, "caption": "a"}, {"image_id": 2, "caption": "b"}]
    r1 = [{"image_id": 2, "caption": "b"}, {"image_id": 3, "caption": "c"}]
    save_result(r0, str(tmp_path), "nocaps_val", rank=0)
    save_result(r1, str(tmp_path), "nocaps_val", rank=1)
    path = merge_results(str(tmp_path), "nocaps_val", world=2)
    merged = json.load(open(path))
    assert [r["image_id"] for r in merged] == [1, 2, 3]  # dup 2 dropped
