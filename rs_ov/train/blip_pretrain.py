"""BLIP pretraining: ITC (momentum + queue) + ITM (hard negatives) + caption
LM through a weight-tied MED decoder.

Reference: BLIP/models/blip_pretrain.py:29-95 (model assembly, queue),
:97-212 (forward: loss_ita/loss_itm/loss_lm), :270-339
(tie_encoder_decoder_weights with skip_key='/attention': everything is
shared between text encoder and decoder EXCEPT each layer's self-attention
block).

TPU-first: the tied weights exist ONCE in the param pytree ('text'); the
decoder's untied self-attention lives in 'dec_self_attn' and the decoder
tree is assembled functionally inside the loss — exactly one canonical copy
of every tied parameter, so AdamW can never de-tie them (the torch version
relies on parameter object aliasing for the same guarantee). The step itself
is the retrieval step (rs_ov/train/blip_retrieval.py — GSPMD global batch,
EMA momentum pairs, dynamic_update_slice queue ring) with the LM branch
switched on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rs_ov.nn.bert import BertConfig
from rs_ov.nn.blip import BlipConfig
from rs_ov.nn.blip_lm import init_lm_head
from rs_ov.train.blip_retrieval import (ENC_TOKEN_ID,
                                        init_blip_retrieval_state,
                                        make_blip_retrieval_train_step)

__all__ = ["init_blip_pretrain_state", "make_blip_pretrain_train_step",
           "BOS_TOKEN_ID"]

# BLIP tokenizer layout (reference blip.py init_tokenizer): [DEC] bos=30522
BOS_TOKEN_ID = 30522


def _self_attn_layer(key, cfg: BertConfig, dtype):
    """Fresh decoder-owned self-attention params (the UNTIED block —
    reference tie_encoder_decoder_weights skips '/attention' paths)."""
    h = cfg.hidden_size
    ks = jax.random.split(key, 4)
    s = 0.02

    def lin(k):
        return (jax.random.normal(k, (h, h)) * s).astype(dtype)

    return {
        "q_w": lin(ks[0]), "q_b": jnp.zeros((h,), dtype),
        "k_w": lin(ks[1]), "k_b": jnp.zeros((h,), dtype),
        "v_w": lin(ks[2]), "v_b": jnp.zeros((h,), dtype),
        "attn_out_w": lin(ks[3]), "attn_out_b": jnp.zeros((h,), dtype),
        "attn_ln": {"scale": jnp.ones((h,), dtype),
                    "bias": jnp.zeros((h,), dtype)},
    }


def init_blip_pretrain_state(key, cfg: BlipConfig, queue_size: int = 57600,
                             dtype=jnp.float32) -> dict:
    """Retrieval state (params incl. cross-attention + itm_head + temp,
    momentum copies, queue) + the decoder-only additions: per-layer untied
    self-attention ('dec_self_attn') and the LM prediction head."""
    k_base, k_dec, k_head = jax.random.split(key, 3)
    state = init_blip_retrieval_state(k_base, cfg, queue_size=queue_size,
                                      dtype=dtype)
    ks = jax.random.split(k_dec, cfg.text.num_layers)
    state["params"]["dec_self_attn"] = [
        _self_attn_layer(ks[i], cfg.text, dtype)
        for i in range(cfg.text.num_layers)]
    state["params"]["lm_head"] = init_lm_head(k_head, cfg.text, dtype=dtype)
    return state


def make_blip_pretrain_train_step(cfg: BlipConfig, mesh, optimizer=None,
                                  momentum: float = 0.995,
                                  enc_token_id: int = ENC_TOKEN_ID,
                                  bos_token_id: int = BOS_TOKEN_ID,
                                  pad_token_id: int = 0,
                                  compute_dtype=None):
    """step(state, opt_state, images, input_ids, attn_mask, idx, alpha, rng)
    -> (state, opt_state, (loss_ita, loss_itm, loss_lm)) — reference
    blip_pretrain.py forward returning all three losses. input_ids must be
    tokenizer output with [CLS] in slot 0 (the step rewrites slot 0 to
    [ENC] for ITM and to [DEC] for the LM branch, reference :145/:199)."""
    return make_blip_retrieval_train_step(
        cfg, mesh, optimizer=optimizer, momentum=momentum,
        enc_token_id=enc_token_id, compute_dtype=compute_dtype,
        lm_cfg={"bos_token_id": bos_token_id, "pad_token_id": pad_token_id})
