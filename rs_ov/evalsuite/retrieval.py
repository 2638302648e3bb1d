"""BLIP image/video-text retrieval evaluation: ITC shortlist -> ITM rerank
-> recall@K.

Reference: BLIP/train_retrieval.py:69-168 (``evaluation``: batched text/image
feature sweep, sims matmul, per-row top-k ITM rerank into -100-filled score
matrices) and :171-211 (``itm_eval`` recall metrics), plus
BLIP/eval_retrieval_video.py:29-135 (video variant: per-frame CLS embeds
mean-pooled into one video embed, frame token sequences concatenated as the
cross-attention context, and a median-rank metric).

TPU-native shape: the reference drives one [k_test, L] ITM batch per matrix
row from a Python loop over rows. Here each direction is a host loop over
fixed-size ROW CHUNKS with ONE jitted program (pad the tail chunk, compile
once): a chunk gathers its rows' top-k candidate texts, flattens to a
[rows*k_test, L] batch, and runs the cross-attention text encoder + itm_head
on the MXU in one dispatch. Like the reference, the big per-image token
tensors stay in host memory and only each chunk's gather moves to the device.

Multi-worker sharding: shard rows with ``rows=(rank, world)`` like
eval.py --shard, then merge the per-shard (scores, idx) pairs by
concatenation. (The reference instead all_reduce-SUMs -100-initialised full
matrices, which uniformly shifts every written entry by -100*(world-1) per
row — rank-order-equivalent; we keep the sparse pairs and densify once.)
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from rs_ov.nn.bert import bert_encode
from rs_ov.nn.blip import BlipConfig
from rs_ov.nn.blip_vit import blip_vit_forward
from rs_ov.nn.layers import linear

__all__ = [
    "encode_retrieval_texts", "encode_retrieval_images",
    "encode_retrieval_videos", "retrieval_rerank", "densify", "itm_eval",
    "blip_retrieval_evaluation",
]


def _l2norm32(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def _pad_rows(a: np.ndarray, mult: int) -> np.ndarray:
    pad = (-len(a)) % mult
    if pad == 0:
        return a
    return np.concatenate([a, np.repeat(a[-1:], pad, axis=0)], axis=0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _text_embed_chunk(params: dict, ids: jnp.ndarray, atts: jnp.ndarray,
                      cfg: BlipConfig) -> jnp.ndarray:
    hidden = bert_encode(params["text"], ids, atts, cfg.text)
    return _l2norm32(linear(hidden[:, 0, :], params["text_proj"]["w"],
                            params["text_proj"]["b"]))


def encode_retrieval_texts(params: dict, cfg: BlipConfig,
                           input_ids: np.ndarray, attention_mask: np.ndarray,
                           enc_token_id: int,
                           batch: int = 256) -> Dict[str, np.ndarray]:
    """Tokenised captions -> normalised ITC embeds + [ENC]-prefixed ids for
    the ITM rerank (reference train_retrieval.py:80-98: text_embeds via
    mode='text' + text_proj, then ``text_ids[:,0] = enc_token_id``)."""
    input_ids = np.asarray(input_ids, np.int32)
    attention_mask = np.asarray(attention_mask, np.int32)
    n = len(input_ids)
    ids_p = _pad_rows(input_ids, batch)
    att_p = _pad_rows(attention_mask, batch)
    embeds = [np.asarray(_text_embed_chunk(params, jnp.asarray(ids_p[i:i + batch]),
                                           jnp.asarray(att_p[i:i + batch]), cfg))
              for i in range(0, len(ids_p), batch)]
    enc_ids = input_ids.copy()
    enc_ids[:, 0] = enc_token_id
    return {"text_embeds": np.concatenate(embeds)[:n],
            "enc_ids": enc_ids, "text_atts": attention_mask}


@functools.partial(jax.jit, static_argnames=("cfg",))
def _image_feat_chunk(params: dict, images: jnp.ndarray, cfg: BlipConfig):
    feats = blip_vit_forward(params["visual"], images, cfg.vision)
    embed = _l2norm32(linear(feats[:, 0, :], params["vision_proj"]["w"],
                             params["vision_proj"]["b"]))
    return feats, embed


def encode_retrieval_images(params: dict, cfg: BlipConfig, images: np.ndarray,
                            batch: int = 16) -> Dict[str, np.ndarray]:
    """[N, 3, S, S] -> full token features (host memory, the ITM context)
    + normalised CLS embeds (reference train_retrieval.py:100-110)."""
    images = np.asarray(images, np.float32)
    n = len(images)
    imgs_p = _pad_rows(images, batch)
    feats, embeds = [], []
    for i in range(0, len(imgs_p), batch):
        f, e = _image_feat_chunk(params, jnp.asarray(imgs_p[i:i + batch]), cfg)
        feats.append(np.asarray(f))
        embeds.append(np.asarray(e))
    return {"image_feats": np.concatenate(feats)[:n],
            "image_embeds": np.concatenate(embeds)[:n]}


def encode_retrieval_videos(params: dict, cfg: BlipConfig, videos: np.ndarray,
                            batch: int = 16) -> Dict[str, np.ndarray]:
    """[N, F, 3, S, S] -> frame-mean video embeds + frame-CONCATENATED token
    features (reference eval_retrieval_video.py:60-74: vision_proj(CLS) per
    frame, ``.view(B,N,-1).mean(dim=1)`` then normalise; the cross-attention
    context is ``video_feat.view(B, -1, D)`` — all frames' tokens end to end).

    Note the reference normalises AFTER averaging the raw projections; the
    per-frame embeds are unnormalised when averaged. Reproduced here.
    """
    videos = np.asarray(videos, np.float32)
    n, f = videos.shape[:2]
    flat = videos.reshape((-1,) + videos.shape[2:])
    flat_p = _pad_rows(flat, batch)
    feats, projs = [], []
    for i in range(0, len(flat_p), batch):
        fe = blip_vit_forward(params["visual"], jnp.asarray(flat_p[i:i + batch]),
                              cfg.vision)
        pr = linear(fe[:, 0, :], params["vision_proj"]["w"],
                    params["vision_proj"]["b"]).astype(jnp.float32)
        feats.append(np.asarray(fe))
        projs.append(np.asarray(pr))
    feats = np.concatenate(feats)[: n * f]
    projs = np.concatenate(projs)[: n * f]
    embeds = projs.reshape(n, f, -1).mean(axis=1)
    embeds = embeds / np.maximum(
        np.linalg.norm(embeds, axis=-1, keepdims=True), 1e-12)
    tok = feats.shape[1]
    return {"image_feats": feats.reshape(n, f * tok, feats.shape[-1]),
            "image_embeds": embeds.astype(np.float32)}


@functools.partial(jax.jit, static_argnames=("cfg", "k"))
def _i2t_chunk(params: dict, feats: jnp.ndarray, enc_ids: jnp.ndarray,
               text_atts: jnp.ndarray, topk_idx: jnp.ndarray,
               cfg: BlipConfig, k: int) -> jnp.ndarray:
    """feats [R, P, H], topk_idx [R, k] -> itm 'match' logits [R, k].
    One [R*k, L] cross-attention batch per chunk (reference rows use R=1)."""
    r = topk_idx.shape[0]
    flat = topk_idx.reshape(-1)
    ids = enc_ids[flat]
    atts = text_atts[flat]
    enc = jnp.repeat(feats, k, axis=0)
    hidden = bert_encode(params["text"], ids, atts, cfg.text,
                         encoder_hidden_states=enc)
    logits = linear(hidden[:, 0, :], params["itm_head"]["w"],
                    params["itm_head"]["b"])
    return logits[:, 1].reshape(r, k).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cfg", "k"))
def _t2i_chunk(params: dict, feats_gathered: jnp.ndarray, ids: jnp.ndarray,
               atts: jnp.ndarray, cfg: BlipConfig, k: int) -> jnp.ndarray:
    """feats_gathered [R*k, P, H] (host-gathered top-k images per text row),
    ids/atts [R, L] -> itm logits [R, k]."""
    r = ids.shape[0]
    ids_rep = jnp.repeat(ids, k, axis=0)
    atts_rep = jnp.repeat(atts, k, axis=0)
    hidden = bert_encode(params["text"], ids_rep, atts_rep, cfg.text,
                         encoder_hidden_states=feats_gathered)
    logits = linear(hidden[:, 0, :], params["itm_head"]["w"],
                    params["itm_head"]["b"])
    return logits[:, 1].reshape(r, k).astype(jnp.float32)


def retrieval_rerank(params: dict, cfg: BlipConfig, image_feats: np.ndarray,
                     image_embeds: np.ndarray, text_embeds: np.ndarray,
                     enc_ids: np.ndarray, text_atts: np.ndarray,
                     k_test: int, rows_per_chunk: int = 4,
                     shard: tuple[int, int] = (0, 1),
                     log: Callable[[str], None] | None = None) -> Dict[str, np.ndarray]:
    """Both rerank directions (reference train_retrieval.py:112-160).

    Returns sparse {scores,idx}_{i2t,t2i} [rows, k_test] float32/int32 pairs
    plus the raw ITC ``sims`` matrix; densify() lays them out as the
    reference's -100-filled matrices. ``shard=(rank, world)`` takes every
    world-th row of each direction (the reference's rank row-range split)."""
    k = int(k_test)
    sims = image_embeds.astype(np.float32) @ text_embeds.astype(np.float32).T
    n_img, n_txt = sims.shape
    if k > n_txt or k > n_img:
        raise ValueError(f"k_test={k} exceeds matrix dims {sims.shape}")
    enc_ids_d = jnp.asarray(enc_ids, jnp.int32)
    text_atts_d = jnp.asarray(text_atts, jnp.int32)
    rank, world = shard
    out: Dict[str, np.ndarray] = {"sims": sims}

    # image->text: top-k texts per image row
    rows = np.arange(n_img)[rank::world]
    topk_idx = np.argsort(-sims[rows], axis=1)[:, :k].astype(np.int32)
    scores = np.empty((len(rows), k), np.float32)
    rows_p = _pad_rows(rows, rows_per_chunk)
    idx_p = _pad_rows(topk_idx, rows_per_chunk)
    for c in range(0, len(rows_p), rows_per_chunk):
        sl = slice(c, c + rows_per_chunk)
        got = np.asarray(_i2t_chunk(
            params, jnp.asarray(image_feats[rows_p[sl]]), enc_ids_d,
            text_atts_d, jnp.asarray(idx_p[sl]), cfg, k))
        keep = min(rows_per_chunk, len(rows) - c)
        if keep > 0:
            scores[c:c + keep] = got[:keep]
        if log:
            log(f"i2t rerank {min(c + rows_per_chunk, len(rows))}/{len(rows)}")
    out["scores_i2t"] = scores + np.take_along_axis(sims[rows], topk_idx, 1)
    out["idx_i2t"] = topk_idx
    out["rows_i2t"] = rows

    # text->image: top-k images per text row
    simsT = sims.T
    rows = np.arange(n_txt)[rank::world]
    topk_idx = np.argsort(-simsT[rows], axis=1)[:, :k].astype(np.int32)
    scores = np.empty((len(rows), k), np.float32)
    rows_p = _pad_rows(rows, rows_per_chunk)
    idx_p = _pad_rows(topk_idx, rows_per_chunk)
    for c in range(0, len(rows_p), rows_per_chunk):
        sl = slice(c, c + rows_per_chunk)
        gathered = image_feats[idx_p[sl].reshape(-1)]  # host gather
        got = np.asarray(_t2i_chunk(
            params, jnp.asarray(gathered), jnp.asarray(enc_ids[rows_p[sl]]),
            jnp.asarray(text_atts[rows_p[sl]]), cfg, k))
        keep = min(rows_per_chunk, len(rows) - c)
        if keep > 0:
            scores[c:c + keep] = got[:keep]
        if log:
            log(f"t2i rerank {min(c + rows_per_chunk, len(rows))}/{len(rows)}")
    out["scores_t2i"] = scores + np.take_along_axis(simsT[rows], topk_idx, 1)
    out["idx_t2i"] = topk_idx
    out["rows_t2i"] = rows
    return out


def densify(scores: np.ndarray, idx: np.ndarray, rows: np.ndarray,
            shape: tuple[int, int], fill: float = -100.0) -> np.ndarray:
    """Sparse per-row (score, col-idx) pairs -> the reference's -100-filled
    dense score matrix (train_retrieval.py:115, :140)."""
    dense = np.full(shape, fill, np.float32)
    dense[rows[:, None], idx] = scores
    return dense


def itm_eval(scores_i2t: np.ndarray, scores_t2i: np.ndarray,
             txt2img: Sequence[int] | Dict[int, int],
             img2txt: Sequence[Sequence[int]] | Dict[int, List[int]],
             median_rank: bool = False) -> Dict[str, float]:
    """Recall metrics (reference train_retrieval.py:171-211; the video
    variant adds t2v median rank, eval_retrieval_video.py:139-176).

    img2txt[i] is the list of ground-truth caption indices for image i
    (rank = best of them); txt2img[t] the single ground-truth image index.
    """
    ranks = np.zeros(scores_i2t.shape[0])
    for index, score in enumerate(scores_i2t):
        inds = np.argsort(score)[::-1]
        gold = img2txt[index]
        if np.isscalar(gold):
            gold = [int(gold)]
        rank = 1e20
        for i in gold:
            tmp = np.where(inds == i)[0][0]
            if tmp < rank:
                rank = tmp
        ranks[index] = rank
    tr1 = 100.0 * len(np.where(ranks < 1)[0]) / len(ranks)
    tr5 = 100.0 * len(np.where(ranks < 5)[0]) / len(ranks)
    tr10 = 100.0 * len(np.where(ranks < 10)[0]) / len(ranks)

    ranks = np.zeros(scores_t2i.shape[0])
    for index, score in enumerate(scores_t2i):
        inds = np.argsort(score)[::-1]
        ranks[index] = np.where(inds == txt2img[index])[0][0]
    ir1 = 100.0 * len(np.where(ranks < 1)[0]) / len(ranks)
    ir5 = 100.0 * len(np.where(ranks < 5)[0]) / len(ranks)
    ir10 = 100.0 * len(np.where(ranks < 10)[0]) / len(ranks)

    tr_mean = (tr1 + tr5 + tr10) / 3
    ir_mean = (ir1 + ir5 + ir10) / 3
    result = {"txt_r1": tr1, "txt_r5": tr5, "txt_r10": tr10,
              "txt_r_mean": tr_mean,
              "img_r1": ir1, "img_r5": ir5, "img_r10": ir10,
              "img_r_mean": ir_mean, "r_mean": (tr_mean + ir_mean) / 2}
    if median_rank:
        result["img_mdR"] = float(np.median(ranks + 1))
    return result


def blip_retrieval_evaluation(params: dict, cfg: BlipConfig,
                              images: np.ndarray, input_ids: np.ndarray,
                              attention_mask: np.ndarray, enc_token_id: int,
                              txt2img, img2txt, k_test: int = 8,
                              video: bool = False,
                              rows_per_chunk: int = 4,
                              shard: tuple[int, int] = (0, 1),
                              log: Callable[[str], None] | None = None
                              ) -> Dict[str, float]:
    """End-to-end: encode -> rerank -> metrics (the whole reference
    ``evaluation`` + ``itm_eval`` flow in one call). ``video=True`` expects
    images as [N, F, 3, S, S] frame stacks."""
    txt = encode_retrieval_texts(params, cfg, input_ids, attention_mask,
                                 enc_token_id)
    enc = encode_retrieval_videos if video else encode_retrieval_images
    img = enc(params, cfg, images)
    rr = retrieval_rerank(params, cfg, img["image_feats"],
                          img["image_embeds"], txt["text_embeds"],
                          txt["enc_ids"], txt["text_atts"], k_test,
                          rows_per_chunk=rows_per_chunk, shard=shard, log=log)
    n_img = len(img["image_embeds"])
    n_txt = len(txt["text_embeds"])
    d_i2t = densify(rr["scores_i2t"], rr["idx_i2t"], rr["rows_i2t"],
                    (n_img, n_txt))
    d_t2i = densify(rr["scores_t2i"], rr["idx_t2i"], rr["rows_t2i"],
                    (n_txt, n_img))
    return itm_eval(d_i2t, d_t2i, txt2img, img2txt, median_rank=video)
