"""Checkpoint round-trips for the native timm-tower families.

Synthesizes open_clip-style exports (``visual.trunk.*`` timm names +
``visual.head.*``, reference timm_model.py:66-109) from our own init trees,
then loads them back through core/checkpoint.py and checks the forward
outputs are identical — proving every parameter lands in the right slot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from rs_ov.core.checkpoint import timm_tower_params_from_state_dict
from rs_ov.nn import timm_tower as tt


def _ohwi(a):
    return np.asarray(a).transpose(3, 2, 0, 1)  # HWIO -> torch OIHW


def _np(t):
    return np.asarray(t)


def _export_convnext(params, arch, sd, t="visual.trunk."):
    sd[t + "stem.0.weight"] = _ohwi(params["stem_conv_w"])
    sd[t + "stem.0.bias"] = _np(params["stem_conv_b"])
    sd[t + "stem.1.weight"] = _np(params["stem_norm"]["scale"])
    sd[t + "stem.1.bias"] = _np(params["stem_norm"]["bias"])
    sd[t + "head.norm.weight"] = _np(params["head_norm"]["scale"])
    sd[t + "head.norm.bias"] = _np(params["head_norm"]["bias"])
    for i, st in enumerate(params["stages"]):
        if "downsample" in st:
            sd[t + f"stages.{i}.downsample.0.weight"] = _np(st["downsample"]["norm"]["scale"])
            sd[t + f"stages.{i}.downsample.0.bias"] = _np(st["downsample"]["norm"]["bias"])
            sd[t + f"stages.{i}.downsample.1.weight"] = _ohwi(st["downsample"]["conv_w"])
            sd[t + f"stages.{i}.downsample.1.bias"] = _np(st["downsample"]["conv_b"])
        for j, blk in enumerate(st["blocks"]):
            pre = t + f"stages.{i}.blocks.{j}."
            sd[pre + "conv_dw.weight"] = _ohwi(blk["conv_dw_w"])
            sd[pre + "conv_dw.bias"] = _np(blk["conv_dw_b"])
            sd[pre + "norm.weight"] = _np(blk["norm"]["scale"])
            sd[pre + "norm.bias"] = _np(blk["norm"]["bias"])
            sd[pre + "mlp.fc1.weight"] = _np(blk["fc1_w"])
            sd[pre + "mlp.fc1.bias"] = _np(blk["fc1_b"])
            sd[pre + "mlp.fc2.weight"] = _np(blk["fc2_w"])
            sd[pre + "mlp.fc2.bias"] = _np(blk["fc2_b"])
            sd[pre + "gamma"] = _np(blk["gamma"])
    return sd


def test_convnext_full_model_roundtrip(tmp_path):
    """create_model('convnext_tiny', pretrained=<torch ckpt>) end to end."""
    from rs_ov import factory

    src = factory.create_model("convnext_tiny", seed=3)
    sd = {}
    _export_convnext(src.params["visual"]["trunk"], tt.timm_arch("convnext_tiny"), sd)
    sd["visual.head.proj.weight"] = _np(src.params["visual"]["head"]["proj_w"])
    # classic CLIP text tower naming (non-custom_text config)
    tp = src.params["text"]
    sd["token_embedding.weight"] = _np(tp["token_embedding"])
    sd["positional_embedding"] = _np(tp["positional_embedding"])
    for i, blk in enumerate(tp["blocks"]):
        pre = f"transformer.resblocks.{i}."
        sd[pre + "ln_1.weight"] = _np(blk["ln_1"]["scale"])
        sd[pre + "ln_1.bias"] = _np(blk["ln_1"]["bias"])
        sd[pre + "attn.in_proj_weight"] = _np(blk["attn"]["in_proj_w"])
        sd[pre + "attn.in_proj_bias"] = _np(blk["attn"]["in_proj_b"])
        sd[pre + "attn.out_proj.weight"] = _np(blk["attn"]["out_proj_w"])
        sd[pre + "attn.out_proj.bias"] = _np(blk["attn"]["out_proj_b"])
        sd[pre + "ln_2.weight"] = _np(blk["ln_2"]["scale"])
        sd[pre + "ln_2.bias"] = _np(blk["ln_2"]["bias"])
        sd[pre + "mlp.c_fc.weight"] = _np(blk["mlp"]["c_fc_w"])
        sd[pre + "mlp.c_fc.bias"] = _np(blk["mlp"]["c_fc_b"])
        sd[pre + "mlp.c_proj.weight"] = _np(blk["mlp"]["c_proj_w"])
        sd[pre + "mlp.c_proj.bias"] = _np(blk["mlp"]["c_proj_b"])
    sd["ln_final.weight"] = _np(tp["ln_final"]["scale"])
    sd["ln_final.bias"] = _np(tp["ln_final"]["bias"])
    sd["text_projection"] = _np(tp["text_projection"])
    sd["logit_scale"] = _np(src.params["logit_scale"])

    path = str(tmp_path / "convnext_tiny.pt")
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)

    loaded = factory.create_model("convnext_tiny", pretrained=path)
    img = jnp.asarray(np.random.RandomState(0).randn(1, 3, 224, 224), jnp.float32)
    np.testing.assert_allclose(np.asarray(loaded.encode_image(img)),
                               np.asarray(src.encode_image(img)), atol=1e-5)
    ids = jnp.zeros((1, 77), jnp.int32)
    np.testing.assert_allclose(np.asarray(loaded.encode_text(ids)),
                               np.asarray(src.encode_text(ids)), atol=1e-5)


def test_siglip_trunk_mapping_roundtrip(monkeypatch):
    arch = tt.SigLipVitArch(patch=16, width=32, depth=2, heads=2)
    monkeypatch.setitem(tt.TIMM_ARCHS, "siglip_test_tiny", arch)
    src = tt.init_siglip_vit_params(jax.random.PRNGKey(0), arch, image_size=32)
    t = "visual.trunk."
    sd = {
        t + "patch_embed.proj.weight": _np(src["patch_embed_w"]),
        t + "patch_embed.proj.bias": _np(src["patch_embed_b"]),
        t + "pos_embed": _np(src["pos_embed"])[None],
        t + "norm.weight": _np(src["norm"]["scale"]),
        t + "norm.bias": _np(src["norm"]["bias"]),
        t + "attn_pool.latent": _np(src["attn_pool"]["latent"])[None],
        t + "attn_pool.q.weight": _np(src["attn_pool"]["q_w"]),
        t + "attn_pool.q.bias": _np(src["attn_pool"]["q_b"]),
        t + "attn_pool.kv.weight": _np(src["attn_pool"]["kv_w"]),
        t + "attn_pool.kv.bias": _np(src["attn_pool"]["kv_b"]),
        t + "attn_pool.proj.weight": _np(src["attn_pool"]["proj_w"]),
        t + "attn_pool.proj.bias": _np(src["attn_pool"]["proj_b"]),
        t + "attn_pool.norm.weight": _np(src["attn_pool"]["norm"]["scale"]),
        t + "attn_pool.norm.bias": _np(src["attn_pool"]["norm"]["bias"]),
        t + "attn_pool.mlp.fc1.weight": _np(src["attn_pool"]["mlp"]["c_fc_w"]),
        t + "attn_pool.mlp.fc1.bias": _np(src["attn_pool"]["mlp"]["c_fc_b"]),
        t + "attn_pool.mlp.fc2.weight": _np(src["attn_pool"]["mlp"]["c_proj_w"]),
        t + "attn_pool.mlp.fc2.bias": _np(src["attn_pool"]["mlp"]["c_proj_b"]),
    }
    for i, blk in enumerate(src["blocks"]):
        pre = t + f"blocks.{i}."
        sd[pre + "norm1.weight"] = _np(blk["ln_1"]["scale"])
        sd[pre + "norm1.bias"] = _np(blk["ln_1"]["bias"])
        sd[pre + "attn.qkv.weight"] = _np(blk["attn"]["in_proj_w"])
        sd[pre + "attn.qkv.bias"] = _np(blk["attn"]["in_proj_b"])
        sd[pre + "attn.proj.weight"] = _np(blk["attn"]["out_proj_w"])
        sd[pre + "attn.proj.bias"] = _np(blk["attn"]["out_proj_b"])
        sd[pre + "norm2.weight"] = _np(blk["ln_2"]["scale"])
        sd[pre + "norm2.bias"] = _np(blk["ln_2"]["bias"])
        sd[pre + "mlp.fc1.weight"] = _np(blk["mlp"]["c_fc_w"])
        sd[pre + "mlp.fc1.bias"] = _np(blk["mlp"]["c_fc_b"])
        sd[pre + "mlp.fc2.weight"] = _np(blk["mlp"]["c_proj_w"])
        sd[pre + "mlp.fc2.bias"] = _np(blk["mlp"]["c_proj_b"])

    loaded = timm_tower_params_from_state_dict(sd, "siglip_test_tiny")["trunk"]
    img = jnp.asarray(np.random.RandomState(1).randn(1, 3, 32, 32), jnp.float32)
    got = tt.siglip_vit_forward(loaded, img, arch)
    want = tt.siglip_vit_forward(src, img, arch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_eva_trunk_mapping_roundtrip(monkeypatch):
    arch = tt.EvaArch(patch=8, width=16, depth=2, heads=2, mlp_hidden=24,
                      swiglu=True, rope=True, scale_mlp=True,
                      scale_attn_inner=True, fused_qkv=False,
                      ref_feat_hw=(16, 16))
    monkeypatch.setitem(tt.TIMM_ARCHS, "eva_test_tiny", arch)
    src = tt.init_eva_params(jax.random.PRNGKey(2), arch, image_size=16,
                             embed_dim=12)
    t = "visual.trunk."
    sd = {
        t + "patch_embed.proj.weight": _np(src["patch_embed_w"]),
        t + "patch_embed.proj.bias": _np(src["patch_embed_b"]),
        t + "cls_token": _np(src["cls_token"])[None, None],
        t + "pos_embed": _np(src["pos_embed"])[None],
        t + "norm.weight": _np(src["norm"]["scale"]),
        t + "norm.bias": _np(src["norm"]["bias"]),
        t + "head.weight": _np(src["head_w"]),
        t + "head.bias": _np(src["head_b"]),
    }
    for i, blk in enumerate(src["blocks"]):
        pre = t + f"blocks.{i}."
        sd[pre + "norm1.weight"] = _np(blk["ln_1"]["scale"])
        sd[pre + "norm1.bias"] = _np(blk["ln_1"]["bias"])
        sd[pre + "norm2.weight"] = _np(blk["ln_2"]["scale"])
        sd[pre + "norm2.bias"] = _np(blk["ln_2"]["bias"])
        sd[pre + "attn.q_proj.weight"] = _np(blk["q_w"])
        sd[pre + "attn.q_proj.bias"] = _np(blk["q_b"])
        sd[pre + "attn.k_proj.weight"] = _np(blk["k_w"])
        sd[pre + "attn.v_proj.weight"] = _np(blk["v_w"])
        sd[pre + "attn.v_proj.bias"] = _np(blk["v_b"])
        sd[pre + "attn.norm.weight"] = _np(blk["inner_norm"]["scale"])
        sd[pre + "attn.norm.bias"] = _np(blk["inner_norm"]["bias"])
        sd[pre + "attn.proj.weight"] = _np(blk["out_proj_w"])
        sd[pre + "attn.proj.bias"] = _np(blk["out_proj_b"])
        sd[pre + "mlp.fc1_g.weight"] = _np(blk["mlp"]["fc1g_w"])
        sd[pre + "mlp.fc1_g.bias"] = _np(blk["mlp"]["fc1g_b"])
        sd[pre + "mlp.fc1_x.weight"] = _np(blk["mlp"]["fc1x_w"])
        sd[pre + "mlp.fc1_x.bias"] = _np(blk["mlp"]["fc1x_b"])
        sd[pre + "mlp.norm.weight"] = _np(blk["mlp"]["mlp_norm"]["scale"])
        sd[pre + "mlp.norm.bias"] = _np(blk["mlp"]["mlp_norm"]["bias"])
        sd[pre + "mlp.fc2.weight"] = _np(blk["mlp"]["fc2_w"])
        sd[pre + "mlp.fc2.bias"] = _np(blk["mlp"]["fc2_b"])

    loaded = timm_tower_params_from_state_dict(sd, "eva_test_tiny")["trunk"]
    img = jnp.asarray(np.random.RandomState(3).randn(1, 3, 16, 16), jnp.float32)
    got = tt.eva_forward(loaded, img, arch, embed_dim=12)
    want = tt.eva_forward(src, img, arch, embed_dim=12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
