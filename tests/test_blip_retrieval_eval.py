"""BLIP retrieval evaluation kernel: ITC shortlist -> ITM rerank -> recall@K.

Reference semantics: BLIP/train_retrieval.py:69-211 (evaluation + itm_eval)
and BLIP/eval_retrieval_video.py:29-176 (video variant). The oracle here is
an explicit per-row Python loop over the SAME rs_ov model functions — it
verifies the chunked/batched one-dispatch-per-chunk machinery (top-k gather,
repeat, tail padding, sharding, densify) is exact, which is the part that
differs structurally from the reference.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rs_ov.nn.bert import BertConfig, bert_encode
from rs_ov.nn.blip import BlipConfig
from rs_ov.nn.blip_vit import BlipVisionConfig, blip_vit_forward
from rs_ov.nn.layers import linear
from rs_ov.evalsuite.retrieval import (blip_retrieval_evaluation, densify,
                                       encode_retrieval_images,
                                       encode_retrieval_texts,
                                       encode_retrieval_videos, itm_eval,
                                       retrieval_rerank)
from rs_ov.train.blip_retrieval import init_blip_retrieval_state

TINY = BlipConfig(
    vision=BlipVisionConfig(image_size=32, patch_size=16, width=64,
                            layers=2, heads=2),
    text=BertConfig(vocab_size=64, hidden_size=64, num_layers=2, num_heads=2,
                    intermediate_size=128, max_position_embeddings=16),
    embed_dim=32,
)
N_IMG, N_TXT, L, K, ENC = 5, 8, 7, 3, 3


@pytest.fixture(scope="module")
def setup():
    import jax
    state = init_blip_retrieval_state(jax.random.PRNGKey(0), TINY,
                                      queue_size=16)
    params = state["params"]
    rng = np.random.RandomState(1)
    images = rng.randn(N_IMG, 3, 32, 32).astype(np.float32)
    ids = rng.randint(4, 64, (N_TXT, L)).astype(np.int32)
    atts = np.ones((N_TXT, L), np.int32)
    atts[2, 5:] = 0  # one padded caption
    return params, images, ids, atts


def _itm_row(params, feats_row, ids, atts):
    """One row's ITM scores the reference way: [k, L] batch, one image."""
    enc = jnp.broadcast_to(jnp.asarray(feats_row)[None],
                           (len(ids),) + feats_row.shape)
    hidden = bert_encode(params["text"], jnp.asarray(ids), jnp.asarray(atts),
                         TINY.text, encoder_hidden_states=enc)
    logits = linear(hidden[:, 0, :], params["itm_head"]["w"],
                    params["itm_head"]["b"])
    return np.asarray(logits[:, 1], np.float32)


def test_rerank_matches_per_row_reference_loop(setup):
    params, images, ids, atts = setup
    txt = encode_retrieval_texts(params, TINY, ids, atts, ENC, batch=4)
    img = encode_retrieval_images(params, TINY, images, batch=2)
    rr = retrieval_rerank(params, TINY, img["image_feats"],
                          img["image_embeds"], txt["text_embeds"],
                          txt["enc_ids"], txt["text_atts"], K,
                          rows_per_chunk=2)  # 5 rows -> padded tail chunk

    sims = rr["sims"]
    assert sims.shape == (N_IMG, N_TXT)
    # text embeds: CLS proj, normalised; [ENC] substituted only in enc_ids
    assert np.allclose(np.linalg.norm(txt["text_embeds"], axis=-1), 1, atol=1e-5)
    assert (txt["enc_ids"][:, 0] == ENC).all() and (ids[:, 0] != ENC).any()

    # i2t: reference per-row loop
    for i in range(N_IMG):
        topk = np.argsort(-sims[i])[:K]
        assert set(rr["idx_i2t"][i]) == set(topk)
        score = _itm_row(params, img["image_feats"][i],
                         txt["enc_ids"][rr["idx_i2t"][i]],
                         txt["text_atts"][rr["idx_i2t"][i]])
        np.testing.assert_allclose(rr["scores_i2t"][i],
                                   score + sims[i, rr["idx_i2t"][i]],
                                   rtol=0, atol=2e-5)
    # t2i: reference per-row loop (k images per text)
    for t in range(N_TXT):
        idx = rr["idx_t2i"][t]
        enc = jnp.asarray(img["image_feats"][idx])
        hidden = bert_encode(params["text"],
                             jnp.repeat(jnp.asarray(txt["enc_ids"][t:t+1]), K, 0),
                             jnp.repeat(jnp.asarray(txt["text_atts"][t:t+1]), K, 0),
                             TINY.text, encoder_hidden_states=enc)
        logits = linear(hidden[:, 0, :], params["itm_head"]["w"],
                        params["itm_head"]["b"])
        np.testing.assert_allclose(
            rr["scores_t2i"][t],
            np.asarray(logits[:, 1], np.float32) + sims.T[t, idx],
            rtol=0, atol=2e-5)


def test_sharded_rows_merge_to_full(setup):
    params, images, ids, atts = setup
    txt = encode_retrieval_texts(params, TINY, ids, atts, ENC)
    img = encode_retrieval_images(params, TINY, images)
    full = retrieval_rerank(params, TINY, img["image_feats"],
                            img["image_embeds"], txt["text_embeds"],
                            txt["enc_ids"], txt["text_atts"], K)
    d_full = densify(full["scores_i2t"], full["idx_i2t"], full["rows_i2t"],
                     (N_IMG, N_TXT))
    merged = np.full((N_IMG, N_TXT), -100.0, np.float32)
    for rank in range(2):
        part = retrieval_rerank(params, TINY, img["image_feats"],
                                img["image_embeds"], txt["text_embeds"],
                                txt["enc_ids"], txt["text_atts"], K,
                                shard=(rank, 2))
        assert (part["rows_i2t"] == np.arange(N_IMG)[rank::2]).all()
        merged = np.maximum(merged, densify(
            part["scores_i2t"], part["idx_i2t"], part["rows_i2t"],
            (N_IMG, N_TXT)))
    np.testing.assert_allclose(merged, d_full, atol=2e-5)


def test_itm_eval_metric_math():
    # 3 images x 6 texts; img2txt lists (2 captions each), txt2img scalars.
    scores_i2t = np.array([
        [9, 1, 1, 1, 1, 1],    # gold {0,1}: best rank 0 -> r1
        [1, 1, 5, 9, 1, 7],    # gold {2,3}: text 3 top -> r1
        [9, 8, 7, 6, 1, 2],    # gold {4,5}: text 5 at rank 4 -> r5
    ], np.float32)
    img2txt = [[0, 1], [2, 3], [4, 5]]
    txt2img = [0, 0, 1, 1, 2, 2]
    scores_t2i = np.array([
        [9, 1, 1], [1, 9, 1],  # t0 correct(r1), t1 wrong img (gold 0 rank 1)
        [1, 9, 1], [9, 1, 1],  # t2 correct, t3 wrong (gold 1 rank 1)
        [1, 1, 9], [1, 1, 9],  # t4, t5 correct
    ], np.float32)
    m = itm_eval(scores_i2t, scores_t2i, txt2img, img2txt, median_rank=True)
    assert m["txt_r1"] == pytest.approx(100 * 2 / 3)
    assert m["txt_r5"] == pytest.approx(100.0)
    assert m["img_r1"] == pytest.approx(100 * 4 / 6)
    assert m["img_r5"] == pytest.approx(100.0)
    assert m["txt_r_mean"] == pytest.approx((200 / 3 + 100 + 100) / 3)
    assert m["r_mean"] == pytest.approx(
        (m["txt_r_mean"] + m["img_r_mean"]) / 2)
    assert m["img_mdR"] == pytest.approx(1.0)  # ranks 0,1,0,1,0,0 -> median 1


def test_video_encode_semantics(setup):
    params, images, ids, atts = setup
    f = 2
    rng = np.random.RandomState(2)
    videos = rng.randn(3, f, 3, 32, 32).astype(np.float32)
    v = encode_retrieval_videos(params, TINY, videos, batch=4)
    tok = (32 // 16) ** 2 + 1
    assert v["image_feats"].shape == (3, f * tok, 64)
    assert v["image_embeds"].shape == (3, TINY.embed_dim)
    # reference averages the RAW projections across frames, then normalises
    for i in range(3):
        projs = []
        for j in range(f):
            fe = blip_vit_forward(params["visual"],
                                  jnp.asarray(videos[i, j:j+1]), TINY.vision)
            projs.append(np.asarray(linear(
                fe[:, 0, :], params["vision_proj"]["w"],
                params["vision_proj"]["b"]), np.float32)[0])
            np.testing.assert_allclose(v["image_feats"][i, j*tok:(j+1)*tok],
                                       np.asarray(fe)[0], atol=2e-5)
        mean = np.stack(projs).mean(0)
        mean = mean / np.linalg.norm(mean)
        np.testing.assert_allclose(v["image_embeds"][i], mean, atol=2e-5)


def test_end_to_end_evaluation_runs(setup):
    params, images, ids, atts = setup
    img2txt = [[i] for i in range(N_IMG)]
    txt2img = list(range(N_IMG)) + [0, 1, 2]
    m = blip_retrieval_evaluation(params, TINY, images, ids, atts, ENC,
                                  txt2img, img2txt, k_test=K)
    for k in ("txt_r1", "img_r10", "r_mean"):
        assert 0.0 <= m[k] <= 100.0
