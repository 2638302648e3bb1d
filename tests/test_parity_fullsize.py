"""Full-size parity: production-geometry ViT-B/16 (224^2 tile, 197 tokens,
12 layers, 12 heads) vs the reference — guards size-dependent bugs the
tiny-arch tests can't see (grid sqrt assumptions, head splits, top-k=30)."""

import numpy as np
import torch

import jax.numpy as jnp

from ref_shim import load_reference_module, load_reference_transformer
from rs_ov.core.checkpoint import vision_params_from_state_dict
from rs_ov.core.config import get_model_config
from rs_ov.nn.vit import VitCallConfig, vit_forward


def test_vit_b16_production_tile_parity():
    tmod = load_reference_transformer()
    os_mod = load_reference_module("outlier_suppression")
    sim_mod = load_reference_module("similarity_enhancement")

    torch.manual_seed(0)
    ref = tmod.VisionTransformer(image_size=224, patch_size=16, width=768,
                                 layers=12, heads=12, mlp_ratio=4.0,
                                 output_dim=512)
    ref.similarity_enhancer = sim_mod.SimilarityEnhancementModule(1.0, 1.0, True)
    ref.outlier_suppressor = os_mod.OutlierSuppressionModule(top_k=30)
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = vision_params_from_state_dict(sd, prefix="")
    vcfg = get_model_config("ViT-B/16").vision

    img = np.random.RandomState(0).randn(1, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        ref_pooled, ref_tokens = (r.numpy() for r in ref(
            torch.from_numpy(img), model_type="Experimental",
            ignore_residual=True, output_cls_token=True,
            apply_similarity_enhancement=True))

    call = VitCallConfig(model_type="Experimental", ignore_residual=True,
                         output_cls_token=True, quick_gelu=False,
                         apply_similarity_enhancement=True,
                         apply_outlier_suppression=True, outlier_top_k=30)
    pooled, tokens = vit_forward(params, jnp.asarray(img), vcfg, call)
    np.testing.assert_allclose(np.asarray(pooled), ref_pooled,
                               atol=5e-4, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(tokens), ref_tokens,
                               atol=5e-4, rtol=5e-3)
