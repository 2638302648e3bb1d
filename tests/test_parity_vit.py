"""Golden parity: rs_ov ViT vs the reference torch VisionTransformer.

Random weights, tiny architecture, fp32 — every attention mode and every
decontamination hook must match the reference numerics.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ref_shim import load_reference_module, load_reference_transformer
from rs_ov.core.checkpoint import vision_params_from_state_dict
from rs_ov.core.config import VisionConfig
from rs_ov.nn.vit import VitCallConfig, vit_forward

IMAGE = 64
PATCH = 16
WIDTH = 64
LAYERS = 4
HEADS = 2
EMBED = 32


@pytest.fixture(scope="module")
def ref_model():
    tmod = load_reference_transformer()
    torch.manual_seed(0)
    model = tmod.VisionTransformer(
        image_size=IMAGE, patch_size=PATCH, width=WIDTH, layers=LAYERS,
        heads=HEADS, mlp_ratio=4.0, output_dim=EMBED)
    # give LayerNorms / pos-embeds non-trivial values so bugs can't hide
    with torch.no_grad():
        for name, p in model.named_parameters():
            if "ln" in name or "bias" in name:
                p.add_(torch.randn_like(p) * 0.05)
    model.eval()
    return model


@pytest.fixture(scope="module")
def jax_params(ref_model):
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    return vision_params_from_state_dict(sd, prefix="")


@pytest.fixture(scope="module")
def vcfg():
    return VisionConfig(image_size=IMAGE, patch_size=PATCH, width=WIDTH,
                        layers=LAYERS, output_dim=EMBED, head_width=WIDTH // HEADS)


def _image(b=1, hw=IMAGE):
    rng = np.random.RandomState(42)
    return rng.randn(b, 3, hw, hw).astype(np.float32)


def _run_both(ref_model, jax_params, vcfg, img, call: VitCallConfig, **torch_kwargs):
    with torch.no_grad():
        ref = ref_model(
            torch.from_numpy(img), model_type=call.model_type,
            ignore_residual=call.ignore_residual, output_cls_token=True,
            **torch_kwargs)
    ref_pooled, ref_tokens = (r.numpy() for r in ref)
    pooled, tokens = vit_forward(jax_params, jnp.asarray(img), vcfg,
                                 VitCallConfig(**{**call.__dict__, "output_cls_token": True}))
    return (ref_pooled, ref_tokens), (np.asarray(pooled), np.asarray(tokens))


MODES = ["vanilla", "MaskCLIP", "SCLIP", "SegEarth", "SFP",
         "Experimental", "ClearCLIP", "NACLIP", "NOnly", "GAV"]


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("ignore_residual", [True, False])
def test_attention_modes(ref_model, jax_params, vcfg, mode, ignore_residual):
    call = VitCallConfig(model_type=mode, ignore_residual=ignore_residual)
    (rp, rt), (p, t) = _run_both(ref_model, jax_params, vcfg, _image(), call)
    np.testing.assert_allclose(p, rp, atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(t, rt, atol=2e-4, rtol=2e-3)


def test_non_square_input_pos_interp(ref_model, jax_params, vcfg):
    """Non-224 input triggers bicubic pos-embed interpolation."""
    img = np.random.RandomState(7).randn(1, 3, 96, 96).astype(np.float32)
    call = VitCallConfig(model_type="ClearCLIP", ignore_residual=True)
    with torch.no_grad():
        ref_pooled, ref_tokens = (r.numpy() for r in ref_model(
            torch.from_numpy(img), model_type="ClearCLIP",
            ignore_residual=True, output_cls_token=True))
    pooled, tokens = vit_forward(
        jax_params, jnp.asarray(img), vcfg,
        VitCallConfig(model_type="ClearCLIP", output_cls_token=True))
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled, atol=3e-4, rtol=3e-3)
    np.testing.assert_allclose(np.asarray(tokens), ref_tokens, atol=3e-4, rtol=3e-3)


def test_similarity_enhancement(ref_model, jax_params, vcfg):
    sim_mod = load_reference_module("similarity_enhancement")
    ref_model.similarity_enhancer = sim_mod.SimilarityEnhancementModule(
        similarity_weight=1.0, temperature=1.0, add_self_similarity=True)
    try:
        call = VitCallConfig(model_type="Experimental", ignore_residual=True,
                             apply_similarity_enhancement=True)
        (rp, rt), (p, t) = _run_both(ref_model, jax_params, vcfg, _image(), call,
                                     apply_similarity_enhancement=True)
        np.testing.assert_allclose(p, rp, atol=2e-4, rtol=2e-3)
        np.testing.assert_allclose(t, rt, atol=2e-4, rtol=2e-3)
    finally:
        ref_model.similarity_enhancer = None


def test_outlier_suppression(ref_model, jax_params, vcfg):
    os_mod = load_reference_module("outlier_suppression")
    ref_model.outlier_suppressor = os_mod.OutlierSuppressionModule(top_k=5)
    try:
        call = VitCallConfig(model_type="SegEarth", ignore_residual=True,
                             apply_outlier_suppression=True, outlier_top_k=5)
        (rp, rt), (p, t) = _run_both(ref_model, jax_params, vcfg, _image(), call)
        np.testing.assert_allclose(p, rp, atol=2e-4, rtol=2e-3)
        np.testing.assert_allclose(t, rt, atol=3e-4, rtol=3e-3)
    finally:
        ref_model.outlier_suppressor = None


def test_self_attn_enhancement_with_outlier(ref_model, jax_params, vcfg):
    os_mod = load_reference_module("outlier_suppression")
    sa_mod = load_reference_module("self_attention_enhancement")
    ref_model.outlier_suppressor = os_mod.OutlierSuppressionModule(top_k=4)
    ref_model.self_attn_enhancer = sa_mod.SelfAttentionEnhancementModule(
        enhancement_strength=0.1, min_self_attn_threshold=0.15, mode="feature")
    try:
        call = VitCallConfig(model_type="Experimental", ignore_residual=True,
                             apply_outlier_suppression=True, outlier_top_k=4,
                             apply_self_attn_enhancement=True)
        (rp, rt), (p, t) = _run_both(ref_model, jax_params, vcfg, _image(), call)
        np.testing.assert_allclose(p, rp, atol=3e-4, rtol=3e-3)
        np.testing.assert_allclose(t, rt, atol=3e-4, rtol=3e-3)
    finally:
        ref_model.outlier_suppressor = None
        ref_model.self_attn_enhancer = None


def test_production_recipe(ref_model, jax_params, vcfg):
    """The base_config.py recipe: Experimental + ignore_residual + similarity
    enhancement + outlier suppression (reference configs/base_config.py:2-25)."""
    os_mod = load_reference_module("outlier_suppression")
    sim_mod = load_reference_module("similarity_enhancement")
    ref_model.outlier_suppressor = os_mod.OutlierSuppressionModule(top_k=6)
    ref_model.similarity_enhancer = sim_mod.SimilarityEnhancementModule(
        similarity_weight=1.0, temperature=1.0, add_self_similarity=True)
    try:
        call = VitCallConfig(model_type="Experimental", ignore_residual=True,
                             apply_similarity_enhancement=True,
                             apply_outlier_suppression=True, outlier_top_k=6)
        (rp, rt), (p, t) = _run_both(ref_model, jax_params, vcfg, _image(), call,
                                     apply_similarity_enhancement=True)
        np.testing.assert_allclose(p, rp, atol=3e-4, rtol=3e-3)
        np.testing.assert_allclose(t, rt, atol=3e-4, rtol=3e-3)
    finally:
        ref_model.outlier_suppressor = None
        ref_model.similarity_enhancer = None
