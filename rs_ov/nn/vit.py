"""Vision transformer with the full decontamination pipeline.

Functional re-design of the reference's modified open_clip
``VisionTransformer.forward`` (reference open_clip/transformer.py:538-775):

  conv patchify -> CLS + (interpolated) pos-embed -> ln_pre
  -> blocks[:-last_n]   (capturing: mid-layer features for similarity
                         enhancement; penultimate attention for outlier
                         detection; per-layer EMA for layer fusion)
  -> last block(s): output (+)= custom_attn(ln_1(x))   [residual/MLP dropped
                         when ignore_residual — reference :627-644]
  -> layer-fusion re-weighting | self-attn enhancement | outlier suppression
  -> ln_post -> @proj -> (pooled, tokens)

All toggles are trace-time constants (frozen dataclass), so each configuration
compiles to a single fused XLA program — the reference's runtime attribute-
poking becomes static dispatch.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rs_ov.core.config import VisionConfig
from rs_ov.decontam.layer_fusion import fuse_attention_ema, layer_fusion_reweight
from rs_ov.decontam.outlier import outlier_suppress
from rs_ov.decontam.self_attn_enhance import self_attention_enhance
from rs_ov.decontam.similarity import compute_similarity_map
from rs_ov.nn.attention import custom_attn, standard_attention
from rs_ov.nn.layers import gelu, layer_norm, linear, mlp, quick_gelu
from rs_ov.utils.resize import resize_bicubic_scaled

__all__ = ["VitCallConfig", "vit_forward", "interpolate_pos_embedding"]


@dataclasses.dataclass(frozen=True)
class VitCallConfig:
    """Static per-call configuration (the reference's ~20 kwargs/attributes)."""

    model_type: str = "ClearCLIP"
    ignore_residual: bool = True
    last_n_layers: int = 1
    output_cls_token: bool = False
    quick_gelu: bool = False
    # similarity enhancement (reference similarity_enhancement.py)
    apply_similarity_enhancement: bool = False
    similarity_weight: float = 1.0
    similarity_temperature: float = 1.0
    add_self_similarity: bool = True
    # outlier suppression (reference outlier_suppression.py)
    apply_outlier_suppression: bool = False
    outlier_top_k: int = 10
    contamination_temp: float = 0.1
    # attention source layers for outlier detection / self-attn enhancement.
    # () = reference default: the last front block, i.e. global layer
    # n_layers - last_n_layers - 1 (transformer.py:609's hardcoded capture;
    # set_outlier_suppressor's None default resolves to layers-2, the same
    # block when last_n_layers == 1). Non-empty = the generalized
    # set_outlier_suppressor(suppression_layers=[...]) surface
    # (transformer.py:446-469): capture the head-averaged attention of each
    # listed global layer (negative indices allowed) and use their MEAN as
    # the detection map.
    outlier_source_layers: tuple = ()
    # self-attention enhancement (reference self_attention_enhancement.py)
    apply_self_attn_enhancement: bool = False
    self_attn_strength: float = 0.1
    self_attn_threshold: float = 0.15
    self_attn_mode: str = "feature"
    self_attn_top_k: int = 10
    # attention layer fusion (reference transformer.py:597-690)
    apply_layer_fusion: bool = False
    layer_fusion_lambda: float = 0.5
    layer_fusion_threshold: float = 0.7
    # SOM — Suppress Outlier Module (the reference's `apply_cos` hook,
    # transformer.py:538 "Unused, kept for compatibility"; implemented here
    # from SOM_IMPLEMENTATION.md / SOM_DETECTION_MODES.md)
    apply_som: bool = False
    som_consensus_threshold: float = 0.5
    som_detection_mode: str = "both"
    som_self_sufficiency_ratio: float = 1.0
    # NACLIP-family spatial bias
    gaussian_std: float = 1.0


def _patchify(images: jnp.ndarray, conv1_w: jnp.ndarray) -> jnp.ndarray:
    """conv1 as a patch-extract + matmul (MXU-friendly). images: [B, 3, H, W]."""
    width, cin, ph, pw = conv1_w.shape
    b, c, h, w = images.shape
    gh, gw = h // ph, w // pw
    x = images.reshape(b, c, gh, ph, gw, pw)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, gh * gw, c * ph * pw)
    kernel = conv1_w.reshape(width, cin * ph * pw)
    return linear(x, kernel, None)


def interpolate_pos_embedding(pos_embed: jnp.ndarray, grid_hw: tuple[int, int]) -> jnp.ndarray:
    """Bicubic pos-embed interpolation with the reference's +0.1 scale fudge
    (reference open_clip/transformer.py:777-795). pos_embed: [N+1, width]."""
    n = pos_embed.shape[0] - 1
    gh, gw = grid_hw
    if gh * gw == n and gh == gw:
        return pos_embed
    old = int(round(n ** 0.5))
    dim = pos_embed.shape[1]
    cls_pos = pos_embed[:1]
    patch_pos = pos_embed[1:].reshape(old, old, dim).transpose(2, 0, 1)  # [D, g, g]
    coord_scales = (old / (gh + 0.1), old / (gw + 0.1))
    resized = resize_bicubic_scaled(patch_pos, (gh, gw), coord_scales)
    resized = resized.transpose(1, 2, 0).reshape(gh * gw, dim)
    return jnp.concatenate([cls_pos, resized], axis=0)


def _resblock(blk: dict, x: jnp.ndarray, heads: int, act, need_weights: bool = False):
    """Standard residual attention block (reference transformer.py:234-254).

    Optional per-branch LayerScale gammas ('ls_1'/'ls_2', ViT-M-16-alt's
    ls_init_value — reference transformer.py LayerScale) when present."""
    attn_out, weights = standard_attention(
        blk["attn"], layer_norm(x, blk["ln_1"]), heads, need_weights=need_weights)
    if "ls_1" in blk:
        attn_out = attn_out * blk["ls_1"].astype(attn_out.dtype)
    x = x + attn_out
    mlp_out = mlp(layer_norm(x, blk["ln_2"]), blk["mlp"], act=act)
    if "ls_2" in blk:
        mlp_out = mlp_out * blk["ls_2"].astype(mlp_out.dtype)
    x = x + mlp_out
    return x, weights


def vit_forward(p: dict, images: jnp.ndarray, vcfg: VisionConfig,
                call: VitCallConfig):
    """Run the decontaminating ViT. images: [B, 3, H, W] (H, W multiples of
    patch size — the tiler guarantees this, reference segmentor.py:428-431).

    Returns (pooled, tokens) if call.output_cls_token else tokens;
    tokens: [B, P, output_dim].
    """
    b = images.shape[0]
    h, w = images.shape[-2], images.shape[-1]
    ph = vcfg.patch_size
    gh, gw = h // ph, w // ph
    heads = vcfg.heads
    act = quick_gelu if call.quick_gelu else gelu

    x = _patchify(images, p["conv1_w"])  # [B, P, width]
    cls_tok = jnp.broadcast_to(p["class_embedding"][None, None, :],
                               (b, 1, vcfg.width)).astype(x.dtype)
    x = jnp.concatenate([cls_tok, x], axis=1)

    pos = p["positional_embedding"]
    if x.shape[1] != pos.shape[0]:
        pos = interpolate_pos_embedding(pos, (gh, gw))
    x = x + pos.astype(x.dtype)[None]
    if not vcfg.no_ln_pre:  # CLIPA family drops the pre-LN
        x = layer_norm(x, p["ln_pre"])

    blocks = p["blocks"]
    n_layers = len(blocks)
    last_n = call.last_n_layers
    n_front = n_layers - last_n
    mid_idx = n_front // 2

    # NOTE reference quirk: penultimate attention is captured only when the
    # outlier suppressor is attached (transformer.py:609-610), so self-attn
    # enhancement alone silently no-ops there. We capture when either consumer
    # is enabled; production configs enable both, so parity is unaffected.
    capture_attn = (call.apply_outlier_suppression or call.apply_self_attn_enhancement) \
        and not call.apply_layer_fusion
    # resolve the detection-source layer set (global indices)
    if call.outlier_source_layers:
        src_layers = tuple(sorted({i if i >= 0 else n_layers + i
                                   for i in call.outlier_source_layers}))
        assert all(0 <= i < n_layers for i in src_layers), \
            (call.outlier_source_layers, n_layers)
    else:
        src_layers = (n_front - 1,)
    front_src = tuple(i for i in src_layers if i < n_front)
    tail_src = tuple(i for i in src_layers if i >= n_front)

    mid_features = None
    captured = []        # head-averaged [B, L, L] maps from src_layers
    attn_weights = None  # their mean (single-layer default: that layer's map)
    attn_acc = None      # layer-fusion EMA accumulator

    if not call.apply_layer_fusion and n_front > 1:
        # the homogeneous front blocks run as ONE lax.scan over stacked params
        # (compile time scales with one block, not n_front); captures become
        # scan outputs. Mid-layer features are the state BEFORE block mid_idx
        # (reference transformer.py:592-595), i.e. the embedding for
        # mid_idx == 0 else the output of block mid_idx-1.
        need_mid = call.apply_similarity_enhancement
        x_embed = x
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *blocks[:n_front])

        need_front_w = capture_attn and bool(front_src)

        def scan_body(x, blk):
            x_new, w_attn = _resblock(blk, x, heads, act,
                                      need_weights=need_front_w)
            ys = (x_new if need_mid else jnp.zeros((), x_new.dtype),
                  w_attn if need_front_w else jnp.zeros((), jnp.float32))
            return x_new, ys

        x, (xs_stack, ws_stack) = jax.lax.scan(scan_body, x, stacked)
        if need_mid:
            mid_features = x_embed if mid_idx == 0 else xs_stack[mid_idx - 1]
        if need_front_w:
            captured.extend(ws_stack[i] for i in front_src)
    else:
        for idx in range(n_front):
            if idx == mid_idx and call.apply_similarity_enhancement:
                mid_features = x
            need_w = call.apply_layer_fusion or (capture_attn and idx in front_src)
            x, w_attn = _resblock(blocks[idx], x, heads, act, need_weights=need_w)
            if call.apply_layer_fusion:
                attn_acc = fuse_attention_ema(attn_acc, w_attn,
                                              call.layer_fusion_lambda)
            elif need_w:
                captured.append(w_attn)

    sim_map = None
    if call.apply_similarity_enhancement and mid_features is not None:
        sim_map = compute_similarity_map(
            mid_features[:, 1:, :],
            temperature=call.similarity_temperature,
            add_self_similarity=call.add_self_similarity,
        )

    output = jnp.zeros_like(x)
    qk_attn = None  # per-head qk attention of the FINAL block (for SOM)
    for i in range(last_n):
        blk = blocks[n_front + i]
        if call.apply_som and i == last_n - 1:
            from rs_ov.nn.attention import _bmm, _softmax32, qkv_projection

            q, k, _ = qkv_projection(blk["attn"], layer_norm(x, blk["ln_1"]), heads)
            scale = (vcfg.width // heads) ** -0.5
            qk_attn = _softmax32(
                _bmm(q.astype(jnp.float32), k.astype(jnp.float32)
                     .transpose(0, 1, 3, 2)) * scale)  # [B, H, L, L]
        attn_out = custom_attn(
            blk["attn"], layer_norm(x, blk["ln_1"]),
            mode=call.model_type, heads=heads,
            sim_map=sim_map, similarity_weight=call.similarity_weight,
            gaussian_std=call.gaussian_std, grid_hw=(gh, gw),
        )
        if call.ignore_residual:
            output = output + attn_out
        else:
            x_out = x + attn_out
            x_out = x_out + mlp(layer_norm(x_out, blk["ln_2"]), blk["mlp"], act=act)
            output = output + x_out
        # the ordinary stream continues through the full block either way
        need_w = call.apply_layer_fusion or (capture_attn and (n_front + i) in tail_src)
        x, w_attn = _resblock(blk, x, heads, act, need_weights=need_w)
        if call.apply_layer_fusion:
            attn_acc = fuse_attention_ema(attn_acc, w_attn, call.layer_fusion_lambda)
        elif need_w:
            captured.append(w_attn)

    if captured:
        attn_weights = captured[0] if len(captured) == 1 \
            else sum(captured) / len(captured)

    if call.apply_som and qk_attn is not None:
        from rs_ov.decontam.som import suppress_outlier_module

        cls_part, patch_part = output[:, :1, :], output[:, 1:, :]
        purified, _, _ = suppress_outlier_module(
            patch_part, qk_attn, gh, gw,
            consensus_threshold=call.som_consensus_threshold,
            detection_mode=call.som_detection_mode,
            self_sufficiency_ratio=call.som_self_sufficiency_ratio)
        output = jnp.concatenate([cls_part, purified], axis=1)

    if call.apply_layer_fusion and call.apply_outlier_suppression and attn_acc is not None:
        output = layer_fusion_reweight(output, attn_acc, call.outlier_top_k)

    if call.apply_self_attn_enhancement and attn_weights is not None:
        cls_part, patch_part = output[:, :1, :], output[:, 1:, :]
        d = patch_part.shape[-1]
        spatial = patch_part.transpose(0, 2, 1).reshape(b, d, gh, gw)
        enhanced = self_attention_enhance(
            spatial, attn_weights, gh, gw,
            mode=call.self_attn_mode,
            enhancement_strength=call.self_attn_strength,
            min_self_attn_threshold=call.self_attn_threshold,
            top_k=call.self_attn_top_k,
        )
        patch_part = enhanced.reshape(b, d, gh * gw).transpose(0, 2, 1)
        output = jnp.concatenate([cls_part, patch_part], axis=1)

    if call.apply_outlier_suppression and attn_weights is not None:
        cls_part, patch_part = output[:, :1, :], output[:, 1:, :]
        d = patch_part.shape[-1]
        spatial = patch_part.transpose(0, 2, 1).reshape(b, d, gh, gw)
        suppressed = outlier_suppress(
            spatial, attn_weights, gh, gw,
            top_k=call.outlier_top_k,
            contamination_temp=call.contamination_temp,
        )
        patch_part = suppressed.reshape(b, d, gh * gw).transpose(0, 2, 1)
        x = jnp.concatenate([cls_part, patch_part], axis=1)
    else:
        x = output

    def _pool(y):
        return jnp.mean(y[:, 1:], axis=1) if vcfg.pool_type == "avg" else y[:, 0]

    if vcfg.final_ln_after_pool:
        # CLIPA: pool the raw stream, LN only the pooled vector
        # (reference transformer.py applies ln_post after _global_pool there)
        pooled, tokens = layer_norm(_pool(x), p["ln_post"]), x[:, 1:]
    else:
        x = layer_norm(x, p["ln_post"])
        pooled, tokens = _pool(x), x[:, 1:]
    proj = p["proj"]
    pooled = jnp.einsum("bd,de->be", pooled.astype(jnp.float32),
                        proj.astype(jnp.float32),
                        preferred_element_type=jnp.float32).astype(x.dtype)
    tokens = jnp.einsum("bpd,de->bpe", tokens.astype(jnp.float32),
                        proj.astype(jnp.float32),
                        preferred_element_type=jnp.float32).astype(x.dtype)

    if call.output_cls_token:
        return pooled, tokens
    return tokens
