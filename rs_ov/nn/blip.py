"""BLIP retrieval model assembly for the segmentation pipeline.

The reference uses BLIP_Retrieval (reference BLIP/models/blip_retrieval.py)
only through: ``visual_encoder(img, ignore_residual)`` + ``vision_proj`` for
patch features and ``text_encoder(ids, attention_mask, mode='text')`` +
``text_proj`` + CLS pooling for text queries (reference segmentor.py:160-166,
:289-292). This module provides exactly that surface: param init, checkpoint
name-mapping from BLIP .pth files, and the two encode functions. Momentum
encoders / queues / ITM heads are training-time machinery out of scope.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from rs_ov.nn.bert import BertConfig, bert_encode
from rs_ov.nn.blip_vit import BlipVisionConfig, blip_vit_forward
from rs_ov.nn.layers import linear

__all__ = ["BlipConfig", "init_blip_params", "blip_params_from_state_dict",
           "bert_params_from_state_dict", "blip_visual_params_from_state_dict",
           "blip_encode_image", "blip_encode_text",
           "blip_multimodal_features", "blip_itm_score"]


@dataclasses.dataclass(frozen=True)
class BlipConfig:
    vision: BlipVisionConfig = BlipVisionConfig()
    text: BertConfig = BertConfig()
    embed_dim: int = 256

    @staticmethod
    def base(image_size: int = 224) -> "BlipConfig":
        return BlipConfig(vision=BlipVisionConfig(image_size=image_size))

    @staticmethod
    def large(image_size: int = 224) -> "BlipConfig":
        return BlipConfig(
            vision=BlipVisionConfig(image_size=image_size, width=1024,
                                    layers=24, heads=16))


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _ln(width, dtype):
    return {"scale": jnp.ones((width,), dtype), "bias": jnp.zeros((width,), dtype)}


def _vit_block(key, width, mlp_ratio, dtype):
    ks = jax.random.split(key, 4)
    hidden = int(width * mlp_ratio)
    s = 0.02
    return {
        "norm1": _ln(width, dtype),
        "attn": {
            "in_proj_w": (jax.random.normal(ks[0], (3 * width, width)) * s).astype(dtype),
            "in_proj_b": jnp.zeros((3 * width,), dtype),
            "out_proj_w": (jax.random.normal(ks[1], (width, width)) * s).astype(dtype),
            "out_proj_b": jnp.zeros((width,), dtype),
        },
        "norm2": _ln(width, dtype),
        "mlp": {
            "c_fc_w": (jax.random.normal(ks[2], (hidden, width)) * s).astype(dtype),
            "c_fc_b": jnp.zeros((hidden,), dtype),
            "c_proj_w": (jax.random.normal(ks[3], (width, hidden)) * s).astype(dtype),
            "c_proj_b": jnp.zeros((width,), dtype),
        },
    }


def _bert_layer(key, h, inter, dtype):
    ks = jax.random.split(key, 6)
    s = 0.02
    def lin(k, o, i):
        return (jax.random.normal(k, (o, i)) * s).astype(dtype)
    return {
        "q_w": lin(ks[0], h, h), "q_b": jnp.zeros((h,), dtype),
        "k_w": lin(ks[1], h, h), "k_b": jnp.zeros((h,), dtype),
        "v_w": lin(ks[2], h, h), "v_b": jnp.zeros((h,), dtype),
        "attn_out_w": lin(ks[3], h, h), "attn_out_b": jnp.zeros((h,), dtype),
        "attn_ln": _ln(h, dtype),
        "inter_w": lin(ks[4], inter, h), "inter_b": jnp.zeros((inter,), dtype),
        "out_w": lin(ks[5], h, inter), "out_b": jnp.zeros((h,), dtype),
        "out_ln": _ln(h, dtype),
    }


def init_blip_params(key, cfg: BlipConfig, dtype=jnp.float32) -> dict:
    # one compiled (persistently cached) program — eager per-tensor
    # jax.random dispatches cost tens of seconds through the axon tunnel
    return _init_blip_params_jit(key, cfg, dtype=np.dtype(dtype).name)


def _init_blip_params_impl(key, cfg: BlipConfig, dtype) -> dict:
    v, t = cfg.vision, cfg.text
    keys = jax.random.split(key, v.layers + t.num_layers + 8)
    gp = (v.image_size // v.patch_size) ** 2
    params = {
        "visual": {
            "patch_embed": {
                "w": (jax.random.normal(keys[0], (v.width, 3, v.patch_size,
                                                  v.patch_size)) * 0.02).astype(dtype),
                "b": jnp.zeros((v.width,), dtype),
            },
            "cls_token": jnp.zeros((v.width,), dtype),
            "pos_embed": (jax.random.normal(keys[1], (gp + 1, v.width))
                          * 0.02).astype(dtype),
            "blocks": [_vit_block(keys[2 + i], v.width, v.mlp_ratio, dtype)
                       for i in range(v.layers)],
            "norm": _ln(v.width, dtype),
        },
        "vision_proj": {
            "w": (jax.random.normal(keys[v.layers + 2],
                                    (cfg.embed_dim, v.width)) * 0.02).astype(dtype),
            "b": jnp.zeros((cfg.embed_dim,), dtype),
        },
        "text": {
            "embeddings": {
                "word": (jax.random.normal(keys[v.layers + 3],
                                           (t.vocab_size, t.hidden_size))
                         * 0.02).astype(dtype),
                "position": (jax.random.normal(keys[v.layers + 4],
                                               (t.max_position_embeddings,
                                                t.hidden_size)) * 0.02).astype(dtype),
                "token_type": jnp.zeros((2, t.hidden_size), dtype),
                "ln": _ln(t.hidden_size, dtype),
            },
            "layers": [_bert_layer(keys[v.layers + 5 + i], t.hidden_size,
                                   t.intermediate_size, dtype)
                       for i in range(t.num_layers)],
        },
        "text_proj": {
            "w": (jax.random.normal(keys[-1], (cfg.embed_dim, t.hidden_size))
                  * 0.02).astype(dtype),
            "b": jnp.zeros((cfg.embed_dim,), dtype),
        },
    }
    return params


_init_blip_params_jit = jax.jit(
    _init_blip_params_impl, static_argnums=(1,), static_argnames=("dtype",))


# ---------------------------------------------------------------------------
# checkpoint mapping (BLIP .pth: visual_encoder.* / text_encoder.* naming)
# ---------------------------------------------------------------------------

def bert_params_from_state_dict(sd: Mapping[str, np.ndarray], prefix: str,
                                dtype=jnp.float32) -> dict:
    """Map a BertModel subtree (reference med.py naming: ``{prefix}.
    embeddings.* / {prefix}.encoder.layer.N.*``, auto-descending into
    ``{prefix}.bert`` for LM-head checkpoints) to the nn/bert.py pytree,
    including MED cross-attention weights when present."""
    def a(name):
        return jnp.asarray(sd[name], dtype)

    def ln(p):
        return {"scale": a(f"{p}.weight"), "bias": a(f"{p}.bias")}

    tp = prefix
    if f"{tp}.bert.embeddings.word_embeddings.weight" in sd:
        tp = f"{tp}.bert"
    n_t = 0
    while f"{tp}.encoder.layer.{n_t}.attention.self.query.weight" in sd:
        n_t += 1
    text = {
        "embeddings": {
            "word": a(f"{tp}.embeddings.word_embeddings.weight"),
            "position": a(f"{tp}.embeddings.position_embeddings.weight"),
            "ln": ln(f"{tp}.embeddings.LayerNorm"),
        },
        "layers": [],
    }
    if f"{tp}.embeddings.token_type_embeddings.weight" in sd:
        text["embeddings"]["token_type"] = a(
            f"{tp}.embeddings.token_type_embeddings.weight")
    for i in range(n_t):
        pre = f"{tp}.encoder.layer.{i}"
        layer = {
            "q_w": a(f"{pre}.attention.self.query.weight"),
            "q_b": a(f"{pre}.attention.self.query.bias"),
            "k_w": a(f"{pre}.attention.self.key.weight"),
            "k_b": a(f"{pre}.attention.self.key.bias"),
            "v_w": a(f"{pre}.attention.self.value.weight"),
            "v_b": a(f"{pre}.attention.self.value.bias"),
            "attn_out_w": a(f"{pre}.attention.output.dense.weight"),
            "attn_out_b": a(f"{pre}.attention.output.dense.bias"),
            "attn_ln": ln(f"{pre}.attention.output.LayerNorm"),
            "inter_w": a(f"{pre}.intermediate.dense.weight"),
            "inter_b": a(f"{pre}.intermediate.dense.bias"),
            "out_w": a(f"{pre}.output.dense.weight"),
            "out_b": a(f"{pre}.output.dense.bias"),
            "out_ln": ln(f"{pre}.output.LayerNorm"),
        }
        # MED cross-attention weights (reference med.py BertLayer
        # crossattention — present in retrieval/caption checkpoints)
        if f"{pre}.crossattention.self.query.weight" in sd:
            layer.update({
                "xq_w": a(f"{pre}.crossattention.self.query.weight"),
                "xq_b": a(f"{pre}.crossattention.self.query.bias"),
                "xk_w": a(f"{pre}.crossattention.self.key.weight"),
                "xk_b": a(f"{pre}.crossattention.self.key.bias"),
                "xv_w": a(f"{pre}.crossattention.self.value.weight"),
                "xv_b": a(f"{pre}.crossattention.self.value.bias"),
                "x_out_w": a(f"{pre}.crossattention.output.dense.weight"),
                "x_out_b": a(f"{pre}.crossattention.output.dense.bias"),
                "x_ln": ln(f"{pre}.crossattention.output.LayerNorm"),
            })
        # NLVR twin cross-attention (reference nlvr_encoder.py:219-345:
        # self0/self1 streams, dense0/dense1, merge_layer from layer 6)
        if f"{pre}.crossattention.self0.query.weight" in sd:
            for s in (0, 1):
                layer.update({
                    f"x{s}q_w": a(f"{pre}.crossattention.self{s}.query.weight"),
                    f"x{s}q_b": a(f"{pre}.crossattention.self{s}.query.bias"),
                    f"x{s}k_w": a(f"{pre}.crossattention.self{s}.key.weight"),
                    f"x{s}k_b": a(f"{pre}.crossattention.self{s}.key.bias"),
                    f"x{s}v_w": a(f"{pre}.crossattention.self{s}.value.weight"),
                    f"x{s}v_b": a(f"{pre}.crossattention.self{s}.value.bias"),
                    f"x{s}_out_w": a(f"{pre}.crossattention.output.dense{s}.weight"),
                    f"x{s}_out_b": a(f"{pre}.crossattention.output.dense{s}.bias"),
                })
            layer["x_ln"] = ln(f"{pre}.crossattention.output.LayerNorm")
            if f"{pre}.crossattention.output.merge_layer.weight" in sd:
                layer["merge_w"] = a(f"{pre}.crossattention.output.merge_layer.weight")
                layer["merge_b"] = a(f"{pre}.crossattention.output.merge_layer.bias")
        text["layers"].append(layer)
    return text


def blip_visual_params_from_state_dict(sd: Mapping[str, np.ndarray],
                                       dtype=jnp.float32,
                                       prefix: str = "visual_encoder") -> dict:
    """Map the BLIP ViT tower (reference BLIP/models/vit.py naming)."""
    def a(name):
        return jnp.asarray(sd[name.replace("visual_encoder", prefix, 1)], dtype)

    def ln(p):
        return {"scale": a(f"{p}.weight"), "bias": a(f"{p}.bias")}

    def raw(name):
        return np.asarray(sd[name.replace("visual_encoder", prefix, 1)])

    n_v = 0
    while f"{prefix}.blocks.{n_v}.norm1.weight" in sd:
        n_v += 1
    vis = {
        "patch_embed": {"w": a("visual_encoder.patch_embed.proj.weight"),
                        "b": a("visual_encoder.patch_embed.proj.bias")},
        "cls_token": jnp.asarray(raw("visual_encoder.cls_token").reshape(-1),
                                 dtype),
        "pos_embed": jnp.asarray(raw("visual_encoder.pos_embed")[0], dtype),
        "blocks": [],
        "norm": ln("visual_encoder.norm"),
    }
    for i in range(n_v):
        pre = f"visual_encoder.blocks.{i}"
        vis["blocks"].append({
            "norm1": ln(f"{pre}.norm1"),
            "attn": {
                "in_proj_w": a(f"{pre}.attn.qkv.weight"),
                "in_proj_b": a(f"{pre}.attn.qkv.bias"),
                "out_proj_w": a(f"{pre}.attn.proj.weight"),
                "out_proj_b": a(f"{pre}.attn.proj.bias"),
            },
            "norm2": ln(f"{pre}.norm2"),
            "mlp": {
                "c_fc_w": a(f"{pre}.mlp.fc1.weight"),
                "c_fc_b": a(f"{pre}.mlp.fc1.bias"),
                "c_proj_w": a(f"{pre}.mlp.fc2.weight"),
                "c_proj_b": a(f"{pre}.mlp.fc2.bias"),
            },
        })
    return vis


def blip_params_from_state_dict(sd: Mapping[str, np.ndarray],
                                dtype=jnp.float32) -> dict:
    def a(name):
        return jnp.asarray(sd[name], dtype)

    vis = blip_visual_params_from_state_dict(sd, dtype)
    # text: BertModel under 'text_encoder.' (reference med.py naming)
    text = bert_params_from_state_dict(sd, "text_encoder", dtype)

    out = {
        "visual": vis,
        "vision_proj": {"w": a("vision_proj.weight"), "b": a("vision_proj.bias")},
        "text": text,
        "text_proj": {"w": a("text_proj.weight"), "b": a("text_proj.bias")},
    }
    # retrieval-checkpoint extras (reference blip_retrieval.py:38-68)
    if "itm_head.weight" in sd:
        out["itm_head"] = {"w": a("itm_head.weight"), "b": a("itm_head.bias")}
    if "temp" in sd:
        out["temp"] = jnp.asarray(np.asarray(sd["temp"]).reshape(()), jnp.float32)
    return out


# ---------------------------------------------------------------------------
# encode functions (the segmentor-facing surface)
# ---------------------------------------------------------------------------

def blip_encode_image(params: dict, images: jnp.ndarray, cfg: BlipConfig,
                      ignore_residual: bool = True) -> jnp.ndarray:
    """[B, 3, S, S] -> projected PATCH features [B, P, embed_dim]
    (reference segmentor.py:289-292: vision_proj of tokens[:, 1:])."""
    feats = blip_vit_forward(params["visual"], images, cfg.vision,
                             ignore_residual=ignore_residual)
    return linear(feats[:, 1:, :], params["vision_proj"]["w"],
                  params["vision_proj"]["b"])


def blip_multimodal_features(params: dict, images: jnp.ndarray,
                             input_ids: jnp.ndarray,
                             attention_mask: jnp.ndarray,
                             cfg: BlipConfig) -> jnp.ndarray:
    """BLIP_Base mode='multimodal' (reference blip.py:62-74): text stream
    cross-attending over full image tokens -> last hidden state [B, L, H].
    input_ids[:, 0] must be the [ENC] token (reference :67)."""
    image_embeds = blip_vit_forward(params["visual"], images, cfg.vision)
    return bert_encode(params["text"], input_ids, attention_mask, cfg.text,
                       encoder_hidden_states=image_embeds)


def blip_itm_score(params: dict, images: jnp.ndarray, input_ids: jnp.ndarray,
                   attention_mask: jnp.ndarray, cfg: BlipConfig,
                   match_head: str = "itm") -> jnp.ndarray:
    """BLIP_ITM forward (reference blip_itm.py:41-67): match_head='itm'
    returns [B, 2] match logits (multimodal CLS -> itm_head); 'itc' returns
    the [B, B] image x text cosine-similarity matrix."""
    if match_head == "itm":
        hidden = blip_multimodal_features(params, images, input_ids,
                                          attention_mask, cfg)
        return linear(hidden[:, 0, :], params["itm_head"]["w"],
                      params["itm_head"]["b"])
    if match_head != "itc":
        raise ValueError(f"match_head must be 'itm' or 'itc', got {match_head!r}")
    image_embeds = blip_vit_forward(params["visual"], images, cfg.vision)
    image_feat = linear(image_embeds[:, 0, :], params["vision_proj"]["w"],
                        params["vision_proj"]["b"]).astype(jnp.float32)
    image_feat = image_feat / jnp.maximum(
        jnp.linalg.norm(image_feat, axis=-1, keepdims=True), 1e-12)
    text_feat = blip_encode_text(params, input_ids, attention_mask, cfg)
    return image_feat @ text_feat.astype(jnp.float32).T


def blip_encode_text(params: dict, input_ids: jnp.ndarray,
                     attention_mask: jnp.ndarray, cfg: BlipConfig,
                     normalize: bool = True) -> jnp.ndarray:
    """Token ids -> projected CLS embedding [B, embed_dim]
    (reference segmentor.py:164-166)."""
    hidden = bert_encode(params["text"], input_ids, attention_mask, cfg.text)
    pooled = linear(hidden[:, 0, :], params["text_proj"]["w"],
                    params["text_proj"]["b"])
    if normalize:
        p32 = pooled.astype(jnp.float32)
        pooled = (p32 / jnp.maximum(jnp.linalg.norm(p32, axis=-1, keepdims=True),
                                    1e-12)).astype(pooled.dtype)
    return pooled
