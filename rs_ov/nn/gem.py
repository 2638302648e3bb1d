"""GEM — Generalized Embedding Module (self-self attention dual stream).

Functional re-design of the reference's GEM path (reference gem/gem_utils.py,
gem/gem_wrapper.py): the last ``depth-1`` ViT blocks run a DUAL stream —
  * ori stream: ordinary q·k attention + residual + MLP
  * gem stream: iterated, L2-normalised q·q / k·k / v·v self-self attention
    with adaptive inverse temperature mean(|x|)·scale
    (gem_utils.py:79-118), values-projected and averaged, accumulated
    without MLP (gem_utils.py:126-153).
The final output is the gem stream's PATCH tokens after ln_post/proj
(gem_utils.py:192-199). No weight surgery is needed here: the same param
pytree serves both paths — the "wrapper" is just a different forward.
"""

from __future__ import annotations

import jax.numpy as jnp

from rs_ov.core.config import VisionConfig
from rs_ov.nn.attention import _bmm, _merge_heads, _softmax32, qkv_projection
from rs_ov.nn.layers import gelu, layer_norm, linear, mlp, quick_gelu
from rs_ov.nn.vit import _patchify
from rs_ov.utils.resize import resize_bicubic_antialias

__all__ = ["self_self_attention", "gem_vit_forward"]


def _l2norm(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def self_self_attention(p: dict, x: jnp.ndarray, heads: int, *,
                        ss_attn_iter: int = 1,
                        ss_attn_temp: float | None = None):
    """x: [B, N, C]. Returns (x_gem, x_ori), both [B, N, C]
    (reference gem_utils.py:60-123)."""
    b, n, c = x.shape
    head_dim = c // heads
    scale = head_dim ** -0.5
    q, k, v = qkv_projection(p, x, heads)
    q32, k32, v32 = (t.astype(jnp.float32) for t in (q, k, v))

    # original path
    attn_ori = _softmax32(_bmm(q32, k32.transpose(0, 1, 3, 2)) * scale)
    x_ori = _merge_heads(_bmm(attn_ori, v32).astype(x.dtype))
    x_ori = linear(x_ori, p["out_proj_w"], p["out_proj_b"])

    # adaptive temperature: mean token norm x scale (gem_utils.py:79-83)
    if ss_attn_temp is None:
        pre_norm = jnp.mean(jnp.linalg.norm(x.astype(jnp.float32), axis=-1),
                            axis=-1)  # [B]
        inv_temp = (pre_norm * scale)[:, None, None, None]
    else:
        inv_temp = jnp.asarray(ss_attn_temp, jnp.float32)

    xs = [v32, k32, q32]
    for _ in range(ss_attn_iter):
        xs = [_l2norm(t) for t in xs]
        xs = [_bmm(_softmax32(_bmm(t, t.transpose(0, 1, 3, 2)) * inv_temp), t)
              for t in xs]

    # final assignment to the ORIGINAL values (gem_utils.py:102-118)
    xs = [_l2norm(t) for t in xs]
    outs = [_bmm(_softmax32(_bmm(t, t.transpose(0, 1, 3, 2)) * inv_temp), v32)
            for t in xs]
    x_gem = (outs[0] + outs[1] + outs[2]) / 3.0
    x_gem = _merge_heads(x_gem.astype(x.dtype))
    x_gem = linear(x_gem, p["out_proj_w"], p["out_proj_b"])
    return x_gem, x_ori


def gem_vit_forward(p: dict, images: jnp.ndarray, vcfg: VisionConfig, *,
                    depth: int = 7, ss_attn_iter: int = 1,
                    ss_attn_temp: float | None = None,
                    ignore_residual: bool = False,
                    quick_gelu_act: bool = False) -> jnp.ndarray:
    """GEM forward: [B, 3, H, W] -> patch tokens [B, P, output_dim]
    (reference gem_utils.py:159-199 `modified_vit_forward`)."""
    act = quick_gelu if quick_gelu_act else gelu
    b = images.shape[0]
    h, w = images.shape[-2], images.shape[-1]
    ph = vcfg.patch_size
    gh, gw = h // ph, w // ph

    x = _patchify(images, p["conv1_w"])
    cls_tok = jnp.broadcast_to(p["class_embedding"][None, None, :],
                               (b, 1, vcfg.width)).astype(x.dtype)
    x = jnp.concatenate([cls_tok, x], axis=1)

    pos = p["positional_embedding"]
    if x.shape[1] != pos.shape[0]:
        # GEM resamples with antialiased bicubic (gem_utils.py:12-43), NOT the
        # +0.1-scale quirk of the plain path
        old = int(round((pos.shape[0] - 1) ** 0.5))
        dim = pos.shape[1]
        patch_pos = pos[1:].reshape(old, old, dim).transpose(2, 0, 1)
        resized = resize_bicubic_antialias(patch_pos, (gh, gw))
        pos = jnp.concatenate(
            [pos[:1], resized.transpose(1, 2, 0).reshape(gh * gw, dim)], axis=0)
    x = x + pos.astype(x.dtype)[None]
    x = layer_norm(x, p["ln_pre"])

    blocks = p["blocks"]
    n_layers = len(blocks)
    n_plain = n_layers - (depth - 1)

    for blk in blocks[:n_plain]:
        from rs_ov.nn.attention import standard_attention
        attn_out, _ = standard_attention(blk["attn"], layer_norm(x, blk["ln_1"]),
                                         vcfg.heads)
        x = x + attn_out
        x = x + mlp(layer_norm(x, blk["ln_2"]), blk["mlp"], act=act)

    x_gem = x
    for blk in blocks[n_plain:]:
        gem_res, ori_res = self_self_attention(
            blk["attn"], layer_norm(x, blk["ln_1"]), vcfg.heads,
            ss_attn_iter=ss_attn_iter, ss_attn_temp=ss_attn_temp)
        x_ori = x + ori_res
        x = x_ori + mlp(layer_norm(x_ori, blk["ln_2"]), blk["mlp"], act=act)
        x_gem = gem_res if ignore_residual else x_gem + gem_res

    x_gem = layer_norm(x_gem, p["ln_post"])
    x_gem = jnp.einsum("bpd,de->bpe", x_gem.astype(jnp.float32),
                       p["proj"].astype(jnp.float32),
                       preferred_element_type=jnp.float32).astype(x_gem.dtype)
    return x_gem[:, 1:, :]
