"""Native timm-tower families (nn/timm_tower.py) vs transformers oracles.

ConvNeXt is checked against ConvNextModel and SigLIP-ViT against
SiglipVisionModel (both random-weight, weight-mapped — the same oracle
pattern as tests/test_parity_vit.py). The EVA family is numerically
oracle-tested in tests/test_eva_oracle.py (independent torch float64
implementation); the invariant checks here (rope norm preservation +
relative-offset dependence, SwiGLU math, named construction) are kept as
fast smoke coverage. Reference adapter semantics: open_clip/timm_model.py:29-162.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from rs_ov.nn import timm_tower as tt


def _t2j(t):
    return jnp.asarray(t.detach().numpy())


# ---------------------------------------------------------------------------
# ConvNeXt vs transformers ConvNextModel
# ---------------------------------------------------------------------------

def _map_hf_convnext(hf):
    sd = {k: v for k, v in hf.state_dict().items()}

    def ln(pre):
        return {"scale": _t2j(sd[pre + ".weight"]), "bias": _t2j(sd[pre + ".bias"])}

    def conv_hwio(pre):
        return _t2j(sd[pre + ".weight"]).transpose(2, 3, 1, 0)

    cfg = hf.config
    params = {
        "stem_conv_w": conv_hwio("embeddings.patch_embeddings"),
        "stem_conv_b": _t2j(sd["embeddings.patch_embeddings.bias"]),
        "stem_norm": ln("embeddings.layernorm"),
        "head_norm": ln("layernorm"),
        "stages": [],
    }
    for i in range(len(cfg.depths)):
        st = {"blocks": []}
        if i > 0:
            pre = f"encoder.stages.{i}.downsampling_layer"
            st["downsample"] = {"norm": ln(pre + ".0"),
                                "conv_w": conv_hwio(pre + ".1"),
                                "conv_b": _t2j(sd[pre + ".1.bias"])}
        for j in range(cfg.depths[i]):
            pre = f"encoder.stages.{i}.layers.{j}"
            st["blocks"].append({
                "conv_dw_w": conv_hwio(pre + ".dwconv"),
                "conv_dw_b": _t2j(sd[pre + ".dwconv.bias"]),
                "norm": ln(pre + ".layernorm"),
                "fc1_w": _t2j(sd[pre + ".pwconv1.weight"]),
                "fc1_b": _t2j(sd[pre + ".pwconv1.bias"]),
                "fc2_w": _t2j(sd[pre + ".pwconv2.weight"]),
                "fc2_b": _t2j(sd[pre + ".pwconv2.bias"]),
                "gamma": _t2j(sd[pre + ".layer_scale_parameter"]),
            })
        params["stages"].append(st)
    return params


def test_convnext_matches_transformers():
    from transformers import ConvNextConfig, ConvNextModel

    cfg = ConvNextConfig(depths=[2, 2, 3, 2], hidden_sizes=[16, 24, 32, 40],
                         image_size=64, layer_norm_eps=1e-6, drop_path_rate=0.0)
    torch.manual_seed(0)
    hf = ConvNextModel(cfg).eval()
    # randomize the layer-scale gammas away from the 1e-6 init so the MLP
    # branch actually contributes
    with torch.no_grad():
        for m in hf.modules():
            if hasattr(m, "layer_scale_parameter") and m.layer_scale_parameter is not None:
                m.layer_scale_parameter.copy_(torch.randn_like(m.layer_scale_parameter) * 0.3)
    params = _map_hf_convnext(hf)

    rng = np.random.RandomState(1)
    img = rng.randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(img)).pooler_output.numpy()
    got = np.asarray(tt.convnext_forward(params, jnp.asarray(img)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_convnext_named_archs_match_timm_dims():
    # spot-check the arch table against timm's published convnext dims
    a = tt.timm_arch("convnext_base")
    assert a.depths == (3, 3, 27, 3) and a.dims == (128, 256, 512, 1024)
    a = tt.timm_arch("convnext_xxlarge")
    assert a.depths == (3, 4, 30, 3) and a.dims == (384, 768, 1536, 3072)


# ---------------------------------------------------------------------------
# SigLIP ViT vs transformers SiglipVisionModel
# ---------------------------------------------------------------------------

def _map_hf_siglip(hf):
    sd = {k: v for k, v in hf.state_dict().items()}

    def ln(pre):
        return {"scale": _t2j(sd[pre + ".weight"]), "bias": _t2j(sd[pre + ".bias"])}

    w = hf.config.hidden_size
    blocks = []
    for i in range(hf.config.num_hidden_layers):
        pre = f"vision_model.encoder.layers.{i}"
        blocks.append({
            "ln_1": ln(pre + ".layer_norm1"),
            "ln_2": ln(pre + ".layer_norm2"),
            "attn": {
                "in_proj_w": jnp.concatenate([
                    _t2j(sd[pre + ".self_attn.q_proj.weight"]),
                    _t2j(sd[pre + ".self_attn.k_proj.weight"]),
                    _t2j(sd[pre + ".self_attn.v_proj.weight"])], axis=0),
                "in_proj_b": jnp.concatenate([
                    _t2j(sd[pre + ".self_attn.q_proj.bias"]),
                    _t2j(sd[pre + ".self_attn.k_proj.bias"]),
                    _t2j(sd[pre + ".self_attn.v_proj.bias"])], axis=0),
                "out_proj_w": _t2j(sd[pre + ".self_attn.out_proj.weight"]),
                "out_proj_b": _t2j(sd[pre + ".self_attn.out_proj.bias"]),
            },
            "mlp": {"c_fc_w": _t2j(sd[pre + ".mlp.fc1.weight"]),
                    "c_fc_b": _t2j(sd[pre + ".mlp.fc1.bias"]),
                    "c_proj_w": _t2j(sd[pre + ".mlp.fc2.weight"]),
                    "c_proj_b": _t2j(sd[pre + ".mlp.fc2.bias"])},
        })
    head_in_w = _t2j(sd["vision_model.head.attention.in_proj_weight"])
    head_in_b = _t2j(sd["vision_model.head.attention.in_proj_bias"])
    return {
        "patch_embed_w": _t2j(sd["vision_model.embeddings.patch_embedding.weight"]),
        "patch_embed_b": _t2j(sd["vision_model.embeddings.patch_embedding.bias"]),
        "pos_embed": _t2j(sd["vision_model.embeddings.position_embedding.weight"]),
        "blocks": blocks,
        "norm": ln("vision_model.post_layernorm"),
        "attn_pool": {
            "latent": _t2j(sd["vision_model.head.probe"])[0],
            "q_w": head_in_w[:w], "q_b": head_in_b[:w],
            "kv_w": head_in_w[w:], "kv_b": head_in_b[w:],
            "proj_w": _t2j(sd["vision_model.head.attention.out_proj.weight"]),
            "proj_b": _t2j(sd["vision_model.head.attention.out_proj.bias"]),
            "norm": ln("vision_model.head.layernorm"),
            "mlp": {"c_fc_w": _t2j(sd["vision_model.head.mlp.fc1.weight"]),
                    "c_fc_b": _t2j(sd["vision_model.head.mlp.fc1.bias"]),
                    "c_proj_w": _t2j(sd["vision_model.head.mlp.fc2.weight"]),
                    "c_proj_b": _t2j(sd["vision_model.head.mlp.fc2.bias"])},
        },
    }


def test_siglip_vit_matches_transformers():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    cfg = SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                             num_hidden_layers=2, num_attention_heads=2,
                             image_size=32, patch_size=16)
    torch.manual_seed(0)
    hf = SiglipVisionModel(cfg).eval()
    params = _map_hf_siglip(hf)
    arch = tt.SigLipVitArch(patch=16, width=32, depth=2, heads=2)

    rng = np.random.RandomState(2)
    img = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(img)).pooler_output.numpy()
    got = np.asarray(tt.siglip_vit_forward(params, jnp.asarray(img), arch))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


# ---------------------------------------------------------------------------
# EVA invariants (no oracle in-image)
# ---------------------------------------------------------------------------

def test_rope_preserves_norm_and_relative_offsets():
    sin, cos = tt._rope_tables(8, 1, 6, None)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 1, 6, 8).astype(np.float32))
    y = tt._apply_rope(x, jnp.asarray(sin)[None, None], jnp.asarray(cos)[None, None])
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1),
                               np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5)
    # relative property: <rope(q,i), rope(k,j)> depends only on i-j (1-D grid)
    q = jnp.asarray(rng.randn(8).astype(np.float32))
    k = jnp.asarray(rng.randn(8).astype(np.float32))

    def dot(i, j):
        qi = tt._apply_rope(q[None, None, None], jnp.asarray(sin[i])[None, None, None],
                            jnp.asarray(cos[i])[None, None, None])
        kj = tt._apply_rope(k[None, None, None], jnp.asarray(sin[j])[None, None, None],
                            jnp.asarray(cos[j])[None, None, None])
        return float(jnp.sum(qi * kj))

    assert abs(dot(1, 3) - dot(2, 4)) < 1e-5
    assert abs(dot(4, 1) - dot(5, 2)) < 1e-5
    assert abs(dot(1, 3) - dot(3, 1)) > 1e-4  # direction-sensitive


def test_eva_swiglu_and_shapes():
    arch = tt.EvaArch(patch=8, width=16, depth=2, heads=2, mlp_hidden=24,
                      swiglu=True, rope=True, scale_mlp=True,
                      scale_attn_inner=True, fused_qkv=False,
                      ref_feat_hw=(16, 16))
    params = tt.init_eva_params(jax.random.PRNGKey(0), arch, image_size=16,
                                embed_dim=12)
    img = jnp.asarray(np.random.RandomState(4).randn(2, 3, 16, 16), jnp.float32)
    out = tt.eva_forward(params, img, arch, embed_dim=12)
    assert out.shape == (2, 12)
    # SwiGLU math: silu(fc1g x) * (fc1x x) -> ln -> fc2
    blk = params["blocks"][0]["mlp"]
    x = jnp.asarray(np.random.RandomState(5).randn(3, 16), jnp.float32)
    got = tt._eva_mlp(blk, x, arch, 1e-6)
    from rs_ov.nn.layers import layer_norm, linear
    h = jax.nn.silu(linear(x, blk["fc1g_w"], blk["fc1g_b"])) \
        * linear(x, blk["fc1x_w"], blk["fc1x_b"])
    want = linear(layer_norm(h, blk["mlp_norm"], 1e-6), blk["fc2_w"], blk["fc2_b"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_eva_post_norm_variant_runs():
    arch = tt.EvaArch(patch=8, width=16, depth=2, heads=2, mlp_hidden=32,
                      post_norm=True)
    params = tt.init_eva_params(jax.random.PRNGKey(1), arch, image_size=16,
                                embed_dim=8)
    out = tt.eva_forward(params, jnp.ones((1, 3, 16, 16), jnp.float32), arch,
                         embed_dim=8)
    assert out.shape == (1, 8)


# ---------------------------------------------------------------------------
# factory integration: named construction + head semantics
# ---------------------------------------------------------------------------

def test_named_timm_configs_construct_and_encode():
    from rs_ov import factory

    img = jnp.asarray(np.random.RandomState(6).randn(1, 3, 224, 224), jnp.float32)
    m = factory.create_model("convnext_tiny")
    f = m.encode_image(img, normalize=True)
    assert f.shape == (1, m.cfg.embed_dim)
    np.testing.assert_allclose(float(jnp.linalg.norm(f[0])), 1.0, rtol=1e-5)
    t = m.encode_text(jnp.zeros((1, 77), jnp.int32))
    assert t.shape == (1, m.cfg.embed_dim)
    with pytest.raises(NotImplementedError):
        m.encode_image(img, model_type="ClearCLIP")


def test_siglip_named_config_logit_bias_and_dims():
    from rs_ov import factory

    m = factory.create_model("ViT-B-16-SigLIP")
    assert "logit_bias" in m.params and float(m.params["logit_bias"]) == -10.0
    img = jnp.asarray(np.random.RandomState(7).randn(1, 3, 224, 224), jnp.float32)
    assert m.encode_image(img).shape == (1, 768)


def test_head_proj_semantics():
    # proj='mlp' (convnext_large_d): trunk dims[-1] -> 2*embed -> embed
    from rs_ov.core.config import get_model_config
    vcfg = get_model_config("convnext_large_d").vision
    assert vcfg.timm_proj == "mlp"
    params = tt.init_timm_tower_params(jax.random.PRNGKey(2), vcfg, 768)
    assert "mlp" in params["head"]
    assert params["head"]["mlp"]["c_fc_w"].shape == (1536, 1536)
    assert params["head"]["mlp"]["c_proj_w"].shape == (768, 1536)
    # proj='linear' (convnext_base_w: embed 640 on a convnext_base trunk)
    vcfg = get_model_config("convnext_base_w").vision
    params = tt.init_timm_tower_params(jax.random.PRNGKey(3), vcfg, 640)
    assert params["head"]["proj_w"].shape == (640, 1024)
    assert "proj_b" not in params["head"]  # reference proj_bias=False default


def test_force_image_size_on_native_towers():
    """pos-embed resampling: SigLIP/EVA towers accept a non-native grid
    (force_image_size / odd-resolution inputs)."""
    from rs_ov.factory import create_model

    m = create_model("ViT-B-16-SigLIP", force_image_size=256)
    img = jnp.asarray(np.random.RandomState(0).randn(1, 3, 256, 256),
                      jnp.float32)
    assert m.encode_image(img).shape == (1, 768)
    # runtime interpolation also covers weights built at another size
    arch = tt.SigLipVitArch(patch=16, width=32, depth=1, heads=2)
    p = tt.init_siglip_vit_params(jax.random.PRNGKey(0), arch, image_size=32)
    out = tt.siglip_vit_forward(p, jnp.ones((1, 3, 64, 64), jnp.float32), arch)
    assert out.shape == (1, 32)
    earch = tt.EvaArch(patch=8, width=16, depth=1, heads=2, mlp_hidden=24,
                       rope=True, fused_qkv=True)
    ep = tt.init_eva_params(jax.random.PRNGKey(1), earch, image_size=16,
                            embed_dim=8)
    out = tt.eva_forward(ep, jnp.ones((1, 3, 32, 32), jnp.float32), earch,
                         embed_dim=8)
    assert out.shape == (1, 8)


def test_preprocess_style_by_family():
    from rs_ov.factory import preprocess_style

    mean, std, interp, mode = preprocess_style("ViT-B-16-SigLIP")
    assert mean == (0.5, 0.5, 0.5) and mode == "squash"
    mean, std, interp, mode = preprocess_style("ViT-L-14-CLIPA")
    assert interp == "bilinear" and mode == "squash"
    mean, _, _, mode = preprocess_style("ViT-B-16")
    assert abs(mean[0] - 0.48145466) < 1e-8 and mode == "shortest"
    # registry tag wins over the family fallback
    mean, _, _, mode = preprocess_style("ViT-B-16-SigLIP", "webli")
    assert mean == (0.5, 0.5, 0.5) and mode == "squash"
