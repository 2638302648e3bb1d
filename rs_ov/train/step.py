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

__all__ = ["encode_image_train", "encode_text_train", "make_clip_train_step",
           "make_coca_train_step"]


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
                         compute_dtype=None, loss: str = "clip",
                         accum_steps: int = 1):
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

    accum_steps>1 is gradient accumulation with FULL-BATCH negatives
    (open_clip's --accum-freq semantics): a no-grad pass caches all
    micro-batch embeddings, then each micro-batch is re-encoded with grad,
    spliced into the cached feature matrix, and the full-batch loss is
    differentiated — per-micro grads carry only that micro-batch's feature
    path, so their SUM is exactly the full-batch gradient (a lax.scan holds
    one micro-batch of activations live at a time). The logit_scale /
    logit_bias path is gradient-gated to micro-step 0 so it is counted
    once, not accum_steps times. The global batch must divide accum_steps
    (and the micro-batch should divide the 'data' mesh axis).
    """
    optimizer = optimizer or optax.adamw(1e-5)

    def encode_pair(params, images, texts):
        cparams = params
        if compute_dtype is not None:
            from rs_ov.core.params import cast_floating
            cparams = cast_floating(params, compute_dtype)
            images = images.astype(compute_dtype)
        img_f = encode_image_train(cparams, images, cfg, remat=remat)
        txt_f = encode_text_train(cparams, texts, cfg, remat=remat)
        return img_f, txt_f

    def full_loss(params, img_f, txt_f, live_scale_path):
        # scale from the MASTER tree: exp in fp32
        scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
        scale = jnp.where(live_scale_path, scale, jax.lax.stop_gradient(scale))
        if loss == "siglip":
            bias = params["logit_bias"].astype(jnp.float32)
            bias = jnp.where(live_scale_path, bias, jax.lax.stop_gradient(bias))
            return siglip_loss(img_f, txt_f, scale, bias)
        return clip_loss(img_f, txt_f, scale)

    def loss_fn(params, images, texts):
        img_f, txt_f = encode_pair(params, images, texts)
        return full_loss(params, img_f, txt_f, jnp.bool_(True))

    def train_step_accum(params, opt_state, images, texts):
        b = images.shape[0]
        mb = b // accum_steps
        im = images.reshape((accum_steps, mb) + images.shape[1:])
        tx = texts.reshape((accum_steps, mb) + texts.shape[1:])

        # pass 1: cache every micro-batch's embeddings, no grad
        def enc(_, xt):
            return None, encode_pair(params, *xt)
        _, (img_all, txt_all) = jax.lax.scan(enc, None, (im, tx))
        img_all = jax.lax.stop_gradient(img_all)  # [accum, mb, D] fp32
        txt_all = jax.lax.stop_gradient(txt_all)

        d = img_all.shape[-1]

        def loss_i(params, i, images_i, texts_i):
            f_i, t_i = encode_pair(params, images_i, texts_i)
            ia = jax.lax.dynamic_update_index_in_dim(img_all, f_i, i, 0)
            ta = jax.lax.dynamic_update_index_in_dim(txt_all, t_i, i, 0)
            return full_loss(params, ia.reshape(b, d), ta.reshape(b, d), i == 0)

        # pass 2: re-encode each micro-batch with grad against the cache;
        # sum of per-micro grads == the exact full-batch gradient
        def accum_body(gsum, xt):
            i, images_i, texts_i = xt
            l, g = jax.value_and_grad(loss_i)(params, i, images_i, texts_i)
            return jax.tree.map(jnp.add, gsum, g), l

        gzero = jax.tree.map(jnp.zeros_like, params)
        grads, losses = jax.lax.scan(
            accum_body, gzero, (jnp.arange(accum_steps), im, tx))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # every micro-step evaluates the SAME full-batch loss
        return params, opt_state, losses[0]

    def train_step(params, opt_state, images, texts):
        if accum_steps > 1:
            return train_step_accum(params, opt_state, images, texts)
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


def make_coca_train_step(cfg, mesh, optimizer=None, compute_dtype=None,
                         caption_weight: float = 2.0, clip_weight: float = 1.0):
    """CoCa training step: contrastive + caption cross-entropy
    (reference open_clip/loss.py:134-177 over coca_model.py:157-186).

    Data-parallel over 'data' with replicated params — the reference's CoCa
    trains under torch DDP, which this mirrors; the CLIP tower's megatron
    shardings don't cover the multimodal decoder's cross-attention blocks.
    Returns (jitted step, init_opt): params, opt_state, images, texts ->
    (params, opt_state, (contrastive, caption)).
    """
    import optax as _optax

    from rs_ov.nn.coca import coca_forward
    from rs_ov.train.losses import coca_loss

    optimizer = optimizer or _optax.adamw(1e-5)

    def loss_fn(params, images, texts):
        cparams = params
        if compute_dtype is not None:
            from rs_ov.core.params import cast_floating
            cparams = cast_floating(params, compute_dtype)
            images = images.astype(compute_dtype)
        out = coca_forward(cparams, images, texts, cfg)
        scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
        contrastive, caption = coca_loss(
            out["image_features"].astype(jnp.float32),
            out["text_features"].astype(jnp.float32),
            out["logits"], out["labels"], scale,
            caption_weight=caption_weight, clip_weight=clip_weight,
            pad_id=cfg.pad_id)
        return contrastive + caption, (contrastive, caption)

    def train_step(params, opt_state, images, texts):
        (_, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images, texts)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, parts

    data_spec = NamedSharding(mesh, P("data"))
    state = {"compiled": None}

    def jit_step(params, opt_state, images, texts):
        if state["compiled"] is None:
            param_spec = jax.tree_util.tree_map(
                lambda _: NamedSharding(mesh, P()), params)
            state["compiled"] = jax.jit(
                train_step,
                in_shardings=(param_spec, None, data_spec, data_spec),
                out_shardings=(param_spec, None, None),
            )
        return state["compiled"](params, opt_state, images, texts)

    return jit_step, optimizer.init
