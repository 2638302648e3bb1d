"""GEM dual-stream parity vs reference gem_utils (SelfSelfAttention,
GEMResidualBlock, modified_vit_forward)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ref_shim import load_reference_module, load_reference_transformer
from rs_ov.core.checkpoint import vision_params_from_state_dict
from rs_ov.core.config import VisionConfig
from rs_ov.nn.gem import gem_vit_forward, self_self_attention

IMAGE, PATCH, WIDTH, LAYERS, HEADS, EMBED = 64, 16, 64, 4, 2, 32


def _build_ref_gem(depth=3, ignore_residual=False):
    tmod = load_reference_transformer()
    gem_utils = load_reference_module("gem_utils")
    torch.manual_seed(3)
    vit = tmod.VisionTransformer(image_size=IMAGE, patch_size=PATCH, width=WIDTH,
                                 layers=LAYERS, heads=HEADS, mlp_ratio=4.0,
                                 output_dim=EMBED)
    with torch.no_grad():
        for p in vit.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    sd = {k: v.detach().numpy() for k, v in vit.state_dict().items()}

    # apply_gem surgery (reference gem/gem_wrapper.py:24-45)
    for i in range(1, depth):
        blk = vit.transformer.resblocks[-i]
        num_heads = blk.attn.num_heads
        dim = blk.attn.head_dim * num_heads
        ss = gem_utils.SelfSelfAttention(dim=dim, num_heads=num_heads, qkv_bias=True)
        ss.qkv.weight.data = blk.attn.in_proj_weight.clone()
        ss.qkv.bias.data = blk.attn.in_proj_bias.clone()
        ss.proj.weight.data = blk.attn.out_proj.weight.clone()
        ss.proj.bias.data = blk.attn.out_proj.bias.clone()
        blk.attn = ss
        vit.transformer.resblocks[-i] = gem_utils.GEMResidualBlock(blk, ignore_residual)
    vit.forward = gem_utils.modified_vit_forward.__get__(vit, tmod.VisionTransformer)
    vit.eval()
    return vit, sd


def test_self_self_attention_parity():
    gem_utils = load_reference_module("gem_utils")
    torch.manual_seed(4)
    ss = gem_utils.SelfSelfAttention(dim=WIDTH, num_heads=HEADS, qkv_bias=True)
    ss.eval()
    x = torch.randn(17, 1, WIDTH)  # [L, B, C] as the reference expects
    with torch.no_grad():
        gem_t, ori_t = ss(x)

    p = {
        "in_proj_w": jnp.asarray(ss.qkv.weight.detach().numpy()),
        "in_proj_b": jnp.asarray(ss.qkv.bias.detach().numpy()),
        "out_proj_w": jnp.asarray(ss.proj.weight.detach().numpy()),
        "out_proj_b": jnp.asarray(ss.proj.bias.detach().numpy()),
    }
    gem_j, ori_j = self_self_attention(p, jnp.asarray(
        x.numpy().transpose(1, 0, 2)), HEADS)
    np.testing.assert_allclose(np.asarray(ori_j)[0], ori_t.numpy()[:, 0],
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gem_j)[0], gem_t.numpy()[:, 0],
                               atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("ignore_residual", [False, True])
def test_gem_vit_forward_parity(ignore_residual):
    vit, sd = _build_ref_gem(depth=3, ignore_residual=ignore_residual)
    params = vision_params_from_state_dict(sd, prefix="")
    vcfg = VisionConfig(image_size=IMAGE, patch_size=PATCH, width=WIDTH,
                        layers=LAYERS, output_dim=EMBED,
                        head_width=WIDTH // HEADS)
    img = np.random.RandomState(5).randn(1, 3, IMAGE, IMAGE).astype(np.float32)
    with torch.no_grad():
        ref = vit(torch.from_numpy(img)).numpy()
    got = np.asarray(gem_vit_forward(params, jnp.asarray(img), vcfg, depth=3,
                                     ignore_residual=ignore_residual))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_gem_pos_embed_resample():
    """Non-native input size exercises the antialias resample path."""
    vit, sd = _build_ref_gem(depth=3)
    params = vision_params_from_state_dict(sd, prefix="")
    vcfg = VisionConfig(image_size=IMAGE, patch_size=PATCH, width=WIDTH,
                        layers=LAYERS, output_dim=EMBED,
                        head_width=WIDTH // HEADS)
    img = np.random.RandomState(6).randn(1, 3, 32, 96).astype(np.float32)
    with torch.no_grad():
        ref = vit(torch.from_numpy(img)).numpy()
    got = np.asarray(gem_vit_forward(params, jnp.asarray(img), vcfg, depth=3))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-3)


def test_gem_visualize_overlays(tmp_path):
    """visualize (reference gem/gem.py:151-189): per-class JET overlays,
    heatmap_{cls}.png files, CHW-normalised-tensor un-normalisation."""
    import numpy as np

    from rs_ov.gem_api import visualize

    img = np.random.RandomState(0).randint(0, 256, (64, 48, 3), np.uint8)
    logits = np.random.RandomState(1).rand(1, 2, 32, 24).astype(np.float32)
    out = visualize(img, ["tree", "road"], logits,
                    save_path=str(tmp_path) + "/")
    assert len(out) == 2 and out[0].shape == (32, 24, 3)
    assert out[0].dtype == np.uint8
    assert sorted(p.name for p in tmp_path.iterdir()) == [
        "heatmap_road.png", "heatmap_tree.png"]

    chw = (np.random.RandomState(2).rand(3, 32, 24).astype(np.float32) - 0.5)
    assert visualize(chw, ["a"], logits[0, :1])[0].shape == (32, 24, 3)
