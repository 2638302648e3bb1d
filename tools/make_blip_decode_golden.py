#!/usr/bin/env python
"""Generate the end-to-end BLIP decode golden fixture (round-4 VERDICT #8).

Writes tests/fixtures/blip_decode_golden.npz (tiny caption + VQA param
pytrees, flattened by path — a COMMITTED checkpoint, so the golden does not
depend on jax PRNG stability across versions) and
tests/fixtures/blip_decode_golden.json (the exact caption strings beam and
nucleus decode produce, the VQA rank answer index, and the VQA generated
answer string). tests/test_decode_golden.py replays the fixture through the
whole generate path (reference BLIP/models/blip.py:78-177 generate,
blip_vqa.py:96-167) and compares strings — the regression gate that catches
beam-search/decode drift.

Rerun (only) when the decode surface intentionally changes:
    python tools/make_blip_decode_golden.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "fixtures")

VOCAB_WORDS = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "picture", "of",
                "tree", "road", "##s", "water", "build", "##ing", "yes",
                "no", "two", "green"]
               + [f"w{i}" for i in range(64 - 2 - 17)])  # + [DEC]/[ENC]


def tiny_cfg():
    from rs_ov.nn.bert import BertConfig
    from rs_ov.nn.blip import BlipConfig
    from rs_ov.nn.blip_vit import BlipVisionConfig

    return BlipConfig(
        vision=BlipVisionConfig(image_size=32, patch_size=8, width=24,
                                layers=2, heads=2),
        text=BertConfig(vocab_size=64, hidden_size=16, num_layers=2,
                        num_heads=2, intermediate_size=32,
                        max_position_embeddings=40),
        embed_dim=8)


def flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten(flat: dict):
    root: dict = {}
    for path, arr in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            if keys and all(k.isdigit() for k in keys):
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)


def main() -> None:
    from rs_ov.nn.blip_lm import (generate_captions, init_blip_decoder_params,
                                  init_blip_vqa_params, vqa_generate_answers,
                                  vqa_rank_answers)
    from rs_ov.text.wordpiece import WordPieceTokenizer

    os.makedirs(FIXDIR, exist_ok=True)
    vocab_path = os.path.join(FIXDIR, "blip_decode_vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(VOCAB_WORDS))
    tok = WordPieceTokenizer(vocab_path)

    cfg = tiny_cfg()
    cap_params = init_blip_decoder_params(jax.random.PRNGKey(42), cfg)
    vqa_params = init_blip_vqa_params(jax.random.PRNGKey(43), cfg)

    rng = np.random.RandomState(0)
    images = rng.randn(2, 3, 32, 32).astype(np.float32)
    q_ids = rng.randint(4, 60, size=(2, 6)).astype(np.int32)
    q_ids[:, 0] = tok.enc_token_id
    q_mask = np.ones((2, 6), np.int32)
    q_mask[1, 4:] = 0
    ans_ids = rng.randint(4, 60, size=(4, 5)).astype(np.int32)
    ans_ids[:, 0] = tok.bos_token_id
    ans_mask = np.ones((4, 5), np.int32)

    beam = generate_captions(cap_params, jnp.asarray(images), cfg, tok,
                             prompt="a picture of ", max_length=14,
                             min_length=3, num_beams=3)
    nucleus = generate_captions(cap_params, jnp.asarray(images), cfg, tok,
                                prompt="a picture of ", sample=True,
                                max_length=14, min_length=3,
                                rng=np.random.RandomState(7))
    rank = vqa_rank_answers(vqa_params, jnp.asarray(images),
                            jnp.asarray(q_ids), jnp.asarray(q_mask),
                            jnp.asarray(ans_ids), jnp.asarray(ans_mask),
                            cfg, k=4)
    gen = vqa_generate_answers(vqa_params, jnp.asarray(images),
                               jnp.asarray(q_ids), jnp.asarray(q_mask),
                               cfg, tok, num_beams=2, max_length=8)

    np.savez_compressed(
        os.path.join(FIXDIR, "blip_decode_golden.npz"),
        **{f"cap/{k}": v for k, v in flatten(cap_params).items()},
        **{f"vqa/{k}": v for k, v in flatten(vqa_params).items()})
    golden = {
        "beam_captions": beam,
        "nucleus_captions": nucleus,
        "vqa_rank_indices": [int(i) for i in np.asarray(rank)],
        "vqa_generated_answers": gen,
    }
    with open(os.path.join(FIXDIR, "blip_decode_golden.json"), "w") as f:
        json.dump(golden, f, indent=2)
    print(json.dumps(golden, indent=2))


if __name__ == "__main__":
    main()
