"""Arch + pretrained registry parity with the reference surface
(reference open_clip/factory.py:32-53, model_configs/*.json,
pretrained.py:30-440)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rs_ov.core.config import get_model_config, list_models
from rs_ov.pretrained import (get_pretrained_cfg, get_pretrained_url,
                              is_pretrained_cfg, list_pretrained,
                              list_pretrained_tags_by_model)

# the reference's 60 model_configs/*.json names, verbatim
REF_MODELS = {
    "EVA01-g-14", "EVA01-g-14-plus", "EVA02-B-16", "EVA02-E-14",
    "EVA02-E-14-plus", "EVA02-L-14", "EVA02-L-14-336",
    "ViT-B-16", "ViT-B-16-SigLIP", "ViT-B-16-SigLIP-256",
    "ViT-B-16-SigLIP-384", "ViT-B-16-SigLIP-512", "ViT-B-16-SigLIP-i18n-256",
    "ViT-B-16-plus", "ViT-B-16-plus-240", "ViT-B-16-quickgelu",
    "ViT-B-32", "ViT-B-32-256", "ViT-B-32-plus-256", "ViT-B-32-quickgelu",
    "ViT-H-14", "ViT-H-14-378-quickgelu", "ViT-H-14-CLIPA",
    "ViT-H-14-CLIPA-336", "ViT-H-14-quickgelu", "ViT-H-16",
    "ViT-L-14", "ViT-L-14-280", "ViT-L-14-336", "ViT-L-14-CLIPA",
    "ViT-L-14-CLIPA-336", "ViT-L-14-quickgelu", "ViT-L-16", "ViT-L-16-320",
    "ViT-L-16-SigLIP-256", "ViT-L-16-SigLIP-384", "ViT-M-16", "ViT-M-16-alt",
    "ViT-M-32", "ViT-M-32-alt", "ViT-bigG-14", "ViT-bigG-14-CLIPA",
    "ViT-bigG-14-CLIPA-336", "ViT-e-14", "ViT-g-14",
    "coca_ViT-B-32", "coca_ViT-L-14", "coca_base", "coca_roberta-ViT-B-32",
    "convnext_base", "convnext_base_w", "convnext_base_w_320",
    "convnext_large", "convnext_large_d", "convnext_large_d_320",
    "convnext_small", "convnext_tiny", "convnext_xlarge",
    "convnext_xxlarge", "convnext_xxlarge_320",
}


def test_list_models_matches_reference_surface():
    assert set(list_models()) == REF_MODELS
    assert len(list_models()) == 60


def test_every_model_config_resolves():
    for name in list_models():
        cfg = get_model_config(name)
        assert cfg.embed_dim > 0


def test_openai_aliases_quickgelu():
    for name in ("ViT-B/16", "ViT-B/32", "ViT-L/14"):
        assert get_model_config(name).quick_gelu
    # dash spelling of non-quickgelu stays GELU
    assert not get_model_config("ViT-B-16").quick_gelu


def test_arch_shapes_spotcheck():
    g = get_model_config("ViT-g-14")
    assert (g.vision.width, g.vision.layers, g.vision.heads) == (1408, 40, 16)
    assert abs(g.vision.mlp_ratio - 4.3637) < 1e-9
    h = get_model_config("ViT-H-14")
    assert (h.vision.head_width, h.text.layers) == (80, 24)
    clipa = get_model_config("ViT-L-14-CLIPA")
    assert clipa.vision.no_ln_pre and clipa.vision.pool_type == "avg"
    assert clipa.text.no_causal_mask and clipa.text.context_length == 32
    sig = get_model_config("ViT-B-16-SigLIP-384")
    assert sig.text.vocab_size == 32000 and sig.text.proj_bias
    assert sig.init_logit_bias == -10.0
    coca = get_model_config("coca_ViT-L-14")
    assert coca.vision.attentional_pool and coca.text.embed_cls


def test_pretrained_registry_counts_and_lookup():
    assert len(list_pretrained()) == 121  # reference pretrained.py parity
    assert len(list_pretrained(include_rs=True)) > 121
    assert is_pretrained_cfg("ViT-B-16", "openai")
    assert get_pretrained_url("ViT-B/16", "openai").startswith(
        "https://openaipublic.azureedge.net/clip/models/")
    cfg = get_pretrained_cfg("ViT-B-16-SigLIP", "webli")
    assert cfg["resize_mode"] == "squash" and cfg["mean"] == (0.5, 0.5, 0.5)
    assert "openai" in list_pretrained_tags_by_model("ViT-B-16")
    # RS-domain tags the segmentor uses resolve too
    assert get_pretrained_url("ViT-L-14", "georsclip")
    assert get_pretrained_url("ViT-L/14", "remoteclip")


def test_layer_scale_and_clipa_forward():
    """ls_init_value blocks and CLIPA pooling run on tiny clones."""
    from rs_ov.core.params import init_clip_params
    from rs_ov.nn.vit import VitCallConfig, vit_forward

    cfg = get_model_config("ViT-M-16-alt")
    tiny = dataclasses.replace(cfg, vision=dataclasses.replace(
        cfg.vision, width=64, layers=2, image_size=32, head_width=32))
    p = init_clip_params(jax.random.PRNGKey(0), tiny)
    assert "ls_1" in p["visual"]["blocks"][0]
    img = jnp.asarray(np.random.RandomState(0).randn(1, 3, 32, 32),
                      jnp.float32)
    out = vit_forward(p["visual"], img, tiny.vision,
                      VitCallConfig(model_type="vanilla"))
    assert out.shape == (1, 4, 384) and bool(jnp.isfinite(out).all())

    cfg = get_model_config("ViT-L-14-CLIPA")
    tiny = dataclasses.replace(
        cfg,
        vision=dataclasses.replace(cfg.vision, width=64, layers=2,
                                   image_size=28, patch_size=14,
                                   head_width=32),
        text=dataclasses.replace(cfg.text, width=32, heads=2, layers=2))
    p = init_clip_params(jax.random.PRNGKey(0), tiny)
    img = jnp.asarray(np.random.RandomState(0).randn(1, 3, 28, 28),
                      jnp.float32)
    pooled, tokens = vit_forward(
        p["visual"], img, tiny.vision,
        VitCallConfig(model_type="vanilla", output_cls_token=True))
    assert pooled.shape == (1, 768) and tokens.shape == (1, 4, 768)


def test_timm_configs_construct_natively():
    # timm-named towers construct natively since nn/timm_tower.py
    # (deep-dive coverage in tests/test_timm_towers.py); the decontamination
    # hooks remain CLIP-ViT-only and raise a clear error on these towers
    import jax.numpy as jnp

    from rs_ov.factory import create_model

    m = create_model("convnext_base")
    assert m.cfg.vision.timm_model_name == "convnext_base"
    with pytest.raises(NotImplementedError):
        m.encode_image(jnp.zeros((1, 3, 224, 224)), model_type="SegEarth")
    # coca_roberta-ViT-B-32 constructs natively (rs_ov/nn/hf_text.py) —
    # covered by tests/test_hf_text.py::test_coca_roberta_builds_and_encodes


def test_force_image_size():
    import jax.numpy as jnp
    import numpy as np

    from rs_ov.factory import create_model

    m = create_model("ViT-B-32", force_image_size=64)
    assert m.cfg.vision.image_size == 64
    out = m.encode_image(jnp.asarray(
        np.random.RandomState(0).randn(1, 3, 64, 64), jnp.float32))
    assert out.shape == (1, 4, 512)  # 2x2 patch grid tokens
