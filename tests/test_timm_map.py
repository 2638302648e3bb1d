"""timm-flavoured ViT checkpoint name mapping (capability subset of the
reference's timm_model.py adapter): a timm-named state dict loads into the
nn/vit.py pytree and computes identical outputs."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from rs_ov.core.checkpoint import (detect_timm_vision_prefix,
                                   infer_clip_config_from_state_dict,
                                   vision_params_from_timm_state_dict)
from rs_ov.core.config import VisionConfig
from rs_ov.core.params import init_vision_params
from rs_ov.nn.vit import VitCallConfig, vit_forward

VCFG = VisionConfig(image_size=32, patch_size=16, width=64, layers=3,
                    output_dim=24, head_width=32)
CALL = VitCallConfig(model_type="vanilla", output_cls_token=True)


def _to_timm_sd(p, prefix="", qkv_bias_style="fused", with_cls=True,
                with_head=True):
    """Serialise an rs_ov vision pytree under timm names."""
    sd = {}
    sd[f"{prefix}patch_embed.proj.weight"] = np.asarray(p["conv1_w"])
    if with_cls:
        sd[f"{prefix}cls_token"] = np.asarray(p["class_embedding"])[None, None]
        sd[f"{prefix}pos_embed"] = np.asarray(p["positional_embedding"])[None]
    else:
        sd[f"{prefix}pos_embed"] = np.asarray(p["positional_embedding"])[None, 1:]
    sd[f"{prefix}norm_pre.weight"] = np.asarray(p["ln_pre"]["scale"])
    sd[f"{prefix}norm_pre.bias"] = np.asarray(p["ln_pre"]["bias"])
    for i, blk in enumerate(p["blocks"]):
        b = f"{prefix}blocks.{i}"
        sd[f"{b}.norm1.weight"] = np.asarray(blk["ln_1"]["scale"])
        sd[f"{b}.norm1.bias"] = np.asarray(blk["ln_1"]["bias"])
        sd[f"{b}.attn.qkv.weight"] = np.asarray(blk["attn"]["in_proj_w"])
        if qkv_bias_style == "fused":
            sd[f"{b}.attn.qkv.bias"] = np.asarray(blk["attn"]["in_proj_b"])
        else:  # EVA/BLIP: separate q/v bias, zero k bias
            q, k, v = np.split(np.asarray(blk["attn"]["in_proj_b"]), 3)
            sd[f"{b}.attn.q_bias"] = q
            sd[f"{b}.attn.v_bias"] = v
        sd[f"{b}.attn.proj.weight"] = np.asarray(blk["attn"]["out_proj_w"])
        sd[f"{b}.attn.proj.bias"] = np.asarray(blk["attn"]["out_proj_b"])
        sd[f"{b}.norm2.weight"] = np.asarray(blk["ln_2"]["scale"])
        sd[f"{b}.norm2.bias"] = np.asarray(blk["ln_2"]["bias"])
        sd[f"{b}.mlp.fc1.weight"] = np.asarray(blk["mlp"]["c_fc_w"])
        sd[f"{b}.mlp.fc1.bias"] = np.asarray(blk["mlp"]["c_fc_b"])
        sd[f"{b}.mlp.fc2.weight"] = np.asarray(blk["mlp"]["c_proj_w"])
        sd[f"{b}.mlp.fc2.bias"] = np.asarray(blk["mlp"]["c_proj_b"])
    sd[f"{prefix}norm.weight"] = np.asarray(p["ln_post"]["scale"])
    sd[f"{prefix}norm.bias"] = np.asarray(p["ln_post"]["bias"])
    if with_head:
        sd[f"{prefix}head.proj.weight"] = np.asarray(p["proj"]).T
    return sd


def _forward(p):
    img = jnp.asarray(np.random.RandomState(3).randn(2, 3, 32, 32), jnp.float32)
    pooled, tokens = vit_forward(p, img, VCFG, CALL)
    return np.asarray(pooled, np.float32), np.asarray(tokens, np.float32)


def test_timm_roundtrip_exact():
    p = init_vision_params(jax.random.PRNGKey(0), VCFG)
    sd = _to_timm_sd(p)
    assert detect_timm_vision_prefix(sd) == ""
    p2 = vision_params_from_timm_state_dict(sd)
    a, b = _forward(p), _forward(p2)
    np.testing.assert_allclose(a[0], b[0], atol=1e-6)
    np.testing.assert_allclose(a[1], b[1], atol=1e-6)


def test_timm_prefixed_and_eva_bias():
    p = init_vision_params(jax.random.PRNGKey(1), VCFG)
    # zero the k-bias thirds so the EVA-style split (which drops k bias)
    # is lossless
    for blk in p["blocks"]:
        b = np.asarray(blk["attn"]["in_proj_b"]).copy()
        d = b.shape[0] // 3
        b[d:2 * d] = 0
        blk["attn"]["in_proj_b"] = jnp.asarray(b)
    sd = _to_timm_sd(p, prefix="visual.trunk.", qkv_bias_style="eva")
    assert detect_timm_vision_prefix(sd) == "visual.trunk."
    p2 = vision_params_from_timm_state_dict(sd)
    a, b = _forward(p), _forward(p2)
    np.testing.assert_allclose(a[1], b[1], atol=1e-6)


def test_timm_clsless_pos_and_identity_proj():
    p = init_vision_params(jax.random.PRNGKey(2), VCFG)
    sd = _to_timm_sd(p, with_cls=False, with_head=False)
    p2 = vision_params_from_timm_state_dict(sd)
    # CLS embedding + its pos row fall back to zeros; proj to identity
    assert p2["positional_embedding"].shape == p["positional_embedding"].shape
    assert np.allclose(np.asarray(p2["positional_embedding"])[0], 0.0)
    assert p2["proj"].shape == (VCFG.width, VCFG.width)
    pooled, tokens = _forward(p2)
    assert tokens.shape == (2, 4, VCFG.width)
    assert np.isfinite(tokens).all()


def test_timm_infer_config():
    p = init_vision_params(jax.random.PRNGKey(0), VCFG)
    sd = _to_timm_sd(p, prefix="visual.trunk.")
    cfg = infer_clip_config_from_state_dict(sd)
    assert cfg.vision.width == 64 and cfg.vision.layers == 3
    assert cfg.vision.patch_size == 16 and cfg.vision.image_size == 32
    assert cfg.embed_dim == 24  # from head.proj
