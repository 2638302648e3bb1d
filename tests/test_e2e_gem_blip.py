"""End-to-end GEM/BLIP segmentor-path parity vs torch oracles.

The component math is parity-tested elsewhere; these guard the PIPELINE
wiring: GEM (reference segearth_segmentor.py forward_feature with
net.visual -> patch tokens -> normalise -> logits) and BLIP (reference
segmentor.py:289-292: image resize -> visual_encoder -> vision_proj).
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ref_shim import load_reference_module, load_reference_transformer
from rs_ov.core.config import CLIPConfig, TextConfig, VisionConfig
from rs_ov.core.checkpoint import vision_params_from_state_dict
from rs_ov.pipeline.segmentor import SegmentorEx

IMAGE, PATCH, WIDTH, LAYERS, HEADS, EMBED = 64, 16, 64, 4, 2, 32

TINY = CLIPConfig(
    embed_dim=EMBED,
    vision=VisionConfig(image_size=IMAGE, patch_size=PATCH, width=WIDTH,
                        layers=LAYERS, output_dim=EMBED,
                        head_width=WIDTH // HEADS),
    text=TextConfig(context_length=77, vocab_size=49408, width=32, heads=2,
                    layers=1, output_dim=EMBED),
)


def _oracle_postpipeline(feats, qf, img_hw, logit_scale=50.0, prob_thd=0.1,
                         bg_idx=0):
    """reference segearth forward_feature tail + postprocess (no upsampler):
    normalise -> logits -> reshape to grid -> bilinear to pixels ->
    softmax/argmax/threshold."""
    feats = feats / feats.norm(dim=-1, keepdim=True)
    logits = feats @ qf.T  # [1, P, Q]
    gh = img_hw[0] // PATCH
    gw = img_hw[1] // PATCH
    logits = logits.permute(0, 2, 1).reshape(1, -1, gh, gw)
    logits = F.interpolate(logits, size=img_hw, mode="bilinear")
    probs = (logits[0] * logit_scale).softmax(0)
    pred = probs.argmax(0, keepdim=True)
    pred[probs.max(0, keepdim=True)[0] < prob_thd] = bg_idx
    return probs.numpy(), pred.numpy()


def test_gem_segmentor_path_parity(tmp_path):
    tmod = load_reference_transformer()
    gem_utils = load_reference_module("gem_utils")
    torch.manual_seed(0)
    vit = tmod.VisionTransformer(image_size=IMAGE, patch_size=PATCH,
                                 width=WIDTH, layers=LAYERS, heads=HEADS,
                                 mlp_ratio=4.0, output_dim=EMBED)
    with torch.no_grad():
        for p in vit.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    sd = {k: v.detach().numpy() for k, v in vit.state_dict().items()}

    depth = 3
    for i in range(1, depth):
        blk = vit.transformer.resblocks[-i]
        ss = gem_utils.SelfSelfAttention(dim=WIDTH, num_heads=HEADS, qkv_bias=True)
        ss.qkv.weight.data = blk.attn.in_proj_weight.clone()
        ss.qkv.bias.data = blk.attn.in_proj_bias.clone()
        ss.proj.weight.data = blk.attn.out_proj.weight.clone()
        ss.proj.bias.data = blk.attn.out_proj.bias.clone()
        blk.attn = ss
        vit.transformer.resblocks[-i] = gem_utils.GEMResidualBlock(blk, False)
    vit.forward = gem_utils.modified_vit_forward.__get__(vit, tmod.VisionTransformer)
    vit.eval()

    rng = np.random.RandomState(1)
    img = rng.randn(1, 3, IMAGE, IMAGE).astype(np.float32)
    qf = torch.randn(3, EMBED)
    qf = qf / qf.norm(dim=-1, keepdim=True)
    with torch.no_grad():
        feats = vit(torch.from_numpy(img))  # [1, P, EMBED]
        ref_probs, ref_pred = _oracle_postpipeline(feats, qf, (IMAGE, IMAGE))

    cls = tmp_path / "cls.txt"
    cls.write_text("a\nb\nc")
    import jax

    from rs_ov.core.params import init_text_params

    params = {
        "visual": vision_params_from_state_dict(sd, prefix=""),
        "text": init_text_params(jax.random.PRNGKey(0), TINY.text),
        "logit_scale": jnp.asarray(0.0),
    }
    seg = SegmentorEx(clip_type="CLIP", vit_type="ViT-B/16", model_type="GEM",
                      name_path=str(cls), clip_config=TINY, params=params,
                      query_features=qf.numpy(), param_dtype=jnp.float32,
                      gem_depth=depth, ignore_residual=False,
                      slide_stride=IMAGE, slide_crop=IMAGE,
                      prob_thd=0.1, logit_scale=50.0)
    result = seg.predict(img, [{"ori_shape": (IMAGE, IMAGE)}])[0]
    np.testing.assert_allclose(np.asarray(result["seg_logits"]), ref_probs,
                               atol=1e-3, rtol=1e-2)
    agree = (np.asarray(result["pred_sem_seg"]) == ref_pred).mean()
    assert agree > 0.99


def test_blip_segmentor_path_parity(tmp_path):
    from test_blip import _TorchBlipViT
    from rs_ov.nn.bert import BertConfig
    from rs_ov.nn.blip import BlipConfig
    from rs_ov.nn.blip_vit import BlipVisionConfig

    torch.manual_seed(2)
    oracle = _TorchBlipViT(img_size=64, patch=16, dim=32, depth=3, heads=2)
    oracle.eval()
    vision_proj = torch.nn.Linear(32, 16)

    rng = np.random.RandomState(3)
    img = rng.randn(1, 3, 64, 64).astype(np.float32)
    qf = torch.randn(2, 16)
    qf = qf / qf.norm(dim=-1, keepdim=True)
    with torch.no_grad():
        # reference segmentor.py:289-292: resize (identity at 64), encode with
        # ignore_residual, vision_proj of tokens[:, 1:]
        feats = oracle(torch.from_numpy(img), ignore_residual=True)
        feats = vision_proj(feats[:, 1:, :])
        ref_probs, ref_pred = _oracle_postpipeline(feats, qf, (64, 64),
                                                   prob_thd=0.0)

    sd = oracle.state_dict()
    params = {
        "visual": {
            "patch_embed": {"w": jnp.asarray(sd["proj.weight"].numpy()),
                            "b": jnp.asarray(sd["proj.bias"].numpy())},
            "cls_token": jnp.asarray(sd["cls_token"].numpy().reshape(-1)),
            "pos_embed": jnp.asarray(sd["pos_embed"].numpy()[0]),
            "blocks": [],
            "norm": {"scale": jnp.asarray(sd["norm.weight"].numpy()),
                     "bias": jnp.asarray(sd["norm.bias"].numpy())},
        },
        "vision_proj": {"w": jnp.asarray(vision_proj.weight.detach().numpy()),
                        "b": jnp.asarray(vision_proj.bias.detach().numpy())},
        "text": None,  # bypassed via query_features
        "text_proj": None,
    }
    for i in range(3):
        params["visual"]["blocks"].append({
            "norm1": {"scale": jnp.asarray(sd[f"blocks.{i}.norm1.weight"].numpy()),
                      "bias": jnp.asarray(sd[f"blocks.{i}.norm1.bias"].numpy())},
            "attn": {
                "in_proj_w": jnp.asarray(sd[f"blocks.{i}.attn.qkv.weight"].numpy()),
                "in_proj_b": jnp.asarray(sd[f"blocks.{i}.attn.qkv.bias"].numpy()),
                "out_proj_w": jnp.asarray(sd[f"blocks.{i}.attn.proj.weight"].numpy()),
                "out_proj_b": jnp.asarray(sd[f"blocks.{i}.attn.proj.bias"].numpy()),
            },
            "norm2": {"scale": jnp.asarray(sd[f"blocks.{i}.norm2.weight"].numpy()),
                      "bias": jnp.asarray(sd[f"blocks.{i}.norm2.bias"].numpy())},
            "mlp": {
                "c_fc_w": jnp.asarray(sd[f"blocks.{i}.mlp.0.weight"].numpy()),
                "c_fc_b": jnp.asarray(sd[f"blocks.{i}.mlp.0.bias"].numpy()),
                "c_proj_w": jnp.asarray(sd[f"blocks.{i}.mlp.2.weight"].numpy()),
                "c_proj_b": jnp.asarray(sd[f"blocks.{i}.mlp.2.bias"].numpy()),
            },
        })

    cfg = BlipConfig(vision=BlipVisionConfig(image_size=64, patch_size=16,
                                             width=32, layers=3, heads=2),
                     text=BertConfig(vocab_size=30, hidden_size=16, num_layers=1,
                                     num_heads=2, intermediate_size=32),
                     embed_dim=16)
    cls = tmp_path / "cls.txt"
    cls.write_text("a\nb")
    seg = SegmentorEx(clip_type="BLIP", vit_type="ViT-B/16", model_type="BLIP",
                      name_path=str(cls), clip_config=cfg, params=params,
                      query_features=qf.numpy(), param_dtype=jnp.float32,
                      slide_stride=64, slide_crop=64, prob_thd=0.0,
                      logit_scale=50.0)
    result = seg.predict(img, [{"ori_shape": (64, 64)}])[0]
    np.testing.assert_allclose(np.asarray(result["seg_logits"]), ref_probs,
                               atol=1e-3, rtol=1e-2)
    agree = (np.asarray(result["pred_sem_seg"]) == ref_pred).mean()
    assert agree > 0.99
