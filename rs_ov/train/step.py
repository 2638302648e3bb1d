"""Sharded CLIP contrastive training step (dp x tp over a TPU mesh).

The reference ships training losses but no TPU story (NCCL all_gather,
reference loss.py:19-63). Here the whole step is one jitted global program:
inputs sharded over 'data', params tensor-sharded over 'model'
(rs_ov.parallel.sharding), the global-batch contrastive loss written in
global form — XLA GSPMD inserts the all-gathers/reduce-scatters the reference
hand-rolled. Activation rematerialisation (jax.checkpoint) trades FLOPs for
HBM on the transformer blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from rs_ov.core.config import CLIPConfig
from rs_ov.nn.attention import standard_attention
from rs_ov.nn.layers import gelu, layer_norm, mlp, quick_gelu
from rs_ov.nn.vit import _patchify
from rs_ov.text.encoder import causal_mask
from rs_ov.parallel.sharding import clip_param_shardings
from rs_ov.train.losses import clip_loss, siglip_loss

__all__ = ["encode_image_train", "encode_text_train", "make_clip_train_step"]


def _run_blocks(x, blocks, heads, act, mask=None, remat=True):
    def apply_block(blk, x):
        attn_out, _ = standard_attention(
            blk["attn"], layer_norm(x, blk["ln_1"]), heads, mask=mask)
        y = x + attn_out
        return y + mlp(layer_norm(y, blk["ln_2"]), blk["mlp"], act=act)

    fn = jax.checkpoint(apply_block) if remat else apply_block
    for blk in blocks:
        x = fn(blk, x)
    return x


def encode_image_train(params: dict, images: jnp.ndarray, cfg: CLIPConfig,
                       remat: bool = True) -> jnp.ndarray:
    """Standard CLIP image embedding (training path): [B,3,H,W] -> [B,D], L2-normed."""
    v = params["visual"]
    vcfg = cfg.vision
    act = quick_gelu if cfg.quick_gelu else gelu
    b = images.shape[0]
    x = _patchify(images, v["conv1_w"])
    cls_tok = jnp.broadcast_to(v["class_embedding"][None, None, :],
                               (b, 1, vcfg.width)).astype(x.dtype)
    x = jnp.concatenate([cls_tok, x], axis=1)
    x = x + v["positional_embedding"].astype(x.dtype)[None]
    x = layer_norm(x, v["ln_pre"])
    x = _run_blocks(x, v["blocks"], vcfg.heads, act, remat=remat)
    x = layer_norm(x, v["ln_post"])
    pooled = x[:, 0] @ v["proj"].astype(x.dtype)
    p32 = pooled.astype(jnp.float32)
    return p32 / jnp.maximum(jnp.linalg.norm(p32, axis=-1, keepdims=True), 1e-12)


def encode_text_train(params: dict, text_ids: jnp.ndarray, cfg: CLIPConfig,
                      remat: bool = True) -> jnp.ndarray:
    t = params["text"]
    tcfg = cfg.text
    act = quick_gelu if cfg.quick_gelu else gelu
    x = t["token_embedding"][text_ids]
    x = x + t["positional_embedding"].astype(x.dtype)[None]
    mask = None if tcfg.no_causal_mask else causal_mask(tcfg.context_length)
    x = _run_blocks(x, t["blocks"], tcfg.heads, act, mask=mask, remat=remat)
    x = layer_norm(x, t["ln_final"])
    eot = jnp.argmax(text_ids, axis=-1)
    pooled = x[jnp.arange(x.shape[0]), eot] @ t["text_projection"].astype(x.dtype)
    p32 = pooled.astype(jnp.float32)
    return p32 / jnp.maximum(jnp.linalg.norm(p32, axis=-1, keepdims=True), 1e-12)


def make_clip_train_step(cfg: CLIPConfig, mesh, optimizer=None, remat: bool = True,
                         compute_dtype=None, loss: str = "clip"):
    """Build (train_step, init_opt_state). Inputs shard over 'data'; params
    shard per clip_param_shardings over 'model'. Returns a jitted step:
        params, opt_state, images, texts -> (params, opt_state, loss)

    loss='siglip' uses the pairwise sigmoid loss in global form (the params
    tree must carry a 'logit_bias'; reference loss.py:307-414 — GSPMD
    partitions the global [B, B] logits the reference's ring exchanged).

    compute_dtype=jnp.bfloat16 runs the TPU mixed-precision recipe: fp32
    master params and optimizer state, bf16 forward/backward on the MXU
    (LayerNorm stays fp32 — nn/layers.layer_norm; the contrastive loss,
    embedding L2-norms and logit_scale stay fp32 at the encoders' output
    casts). Gradients come back fp32 through the cast.
    """
    optimizer = optimizer or optax.adamw(1e-5)

    def loss_fn(params, images, texts):
        cparams = params
        if compute_dtype is not None:
            from rs_ov.core.params import cast_floating
            cparams = cast_floating(params, compute_dtype)
            images = images.astype(compute_dtype)
        img_f = encode_image_train(cparams, images, cfg, remat=remat)
        txt_f = encode_text_train(cparams, texts, cfg, remat=remat)
        # scale from the MASTER tree: exp in fp32
        scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
        if loss == "siglip":
            return siglip_loss(img_f, txt_f, scale,
                               params["logit_bias"].astype(jnp.float32))
        return clip_loss(img_f, txt_f, scale)

    def train_step(params, opt_state, images, texts):
        loss, grads = jax.value_and_grad(loss_fn)(params, images, texts)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    data_spec = NamedSharding(mesh, P("data"))
    state = {"compiled": None}

    def jit_step(params, opt_state, images, texts):
        if state["compiled"] is None:
            specs = clip_param_shardings(params)
            param_spec = jax.tree_util.tree_map(
                lambda s: NamedSharding(mesh, s), specs,
                is_leaf=lambda x: isinstance(x, P))
            # built once — rebuilding jax.jit per call would recompile per step
            state["compiled"] = jax.jit(
                train_step,
                in_shardings=(param_spec, None, data_spec, data_spec),
                out_shardings=(param_spec, None, None),
            )
        return state["compiled"](params, opt_state, images, texts)

    return jit_step, optimizer.init
