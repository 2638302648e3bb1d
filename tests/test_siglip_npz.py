"""big_vision SigLIP .npz -> native MAP-head towers (no fake-CLS path).

Synthesizes an npz with big_vision's exact naming (params/img/... with a
MAPHead_0, params/txt/... with an Encoder_0 stack and head dense) from our
own init trees, loads it back through create_model, and checks the forward
outputs are identical. Reference loader being replaced:
open_clip/big_vision.py:9-136.
"""

import jax
import jax.numpy as jnp
import numpy as np

from rs_ov.nn import timm_tower as tt


def _flax_attn(blk_attn, width, heads, out, pre):
    """torch-layout fused qkv -> flax query/key/value/out kernels."""
    w = np.asarray(blk_attn["in_proj_w"])
    b = np.asarray(blk_attn["in_proj_b"])
    hd = width // heads
    for i, name in enumerate(("query", "key", "value")):
        out[pre + f"{name}/kernel"] = w[i * width:(i + 1) * width].T.reshape(
            width, heads, hd)
        out[pre + f"{name}/bias"] = b[i * width:(i + 1) * width].reshape(heads, hd)
    out[pre + "out/kernel"] = np.asarray(blk_attn["out_proj_w"]).T.reshape(
        heads, hd, width)
    out[pre + "out/bias"] = np.asarray(blk_attn["out_proj_b"])


def _export_blocks(blocks, width, heads, out, stack):
    for i, blk in enumerate(blocks):
        pre = f"{stack}/encoderblock_{i}/"
        out[pre + "LayerNorm_0/scale"] = np.asarray(blk["ln_1"]["scale"])
        out[pre + "LayerNorm_0/bias"] = np.asarray(blk["ln_1"]["bias"])
        out[pre + "LayerNorm_1/scale"] = np.asarray(blk["ln_2"]["scale"])
        out[pre + "LayerNorm_1/bias"] = np.asarray(blk["ln_2"]["bias"])
        _flax_attn(blk["attn"], width, heads,
                   out, pre + "MultiHeadDotProductAttention_1/")
        out[pre + "MlpBlock_3/Dense_0/kernel"] = np.asarray(blk["mlp"]["c_fc_w"]).T
        out[pre + "MlpBlock_3/Dense_0/bias"] = np.asarray(blk["mlp"]["c_fc_b"])
        out[pre + "MlpBlock_3/Dense_1/kernel"] = np.asarray(blk["mlp"]["c_proj_w"]).T
        out[pre + "MlpBlock_3/Dense_1/bias"] = np.asarray(blk["mlp"]["c_proj_b"])


def test_siglip_npz_roundtrip(tmp_path, monkeypatch):
    arch = tt.SigLipVitArch(patch=16, width=32, depth=2, heads=2)
    monkeypatch.setitem(tt.TIMM_ARCHS, "vit_test_siglip", arch)
    trunk = tt.init_siglip_vit_params(jax.random.PRNGKey(0), arch, image_size=32)

    out = {}
    p = "params/img/"
    out[p + "embedding/kernel"] = np.asarray(trunk["patch_embed_w"]).transpose(2, 3, 1, 0)
    out[p + "embedding/bias"] = np.asarray(trunk["patch_embed_b"])
    out[p + "Transformer/posembed_input/pos_embedding"] = np.asarray(trunk["pos_embed"])[None]
    _export_blocks(trunk["blocks"], 32, 2, out, p + "Transformer")
    out[p + "Transformer/encoder_norm/scale"] = np.asarray(trunk["norm"]["scale"])
    out[p + "Transformer/encoder_norm/bias"] = np.asarray(trunk["norm"]["bias"])
    ap = trunk["attn_pool"]
    m = p + "MAPHead_0/"
    out[m + "probe"] = np.asarray(ap["latent"])[None]
    hd = 32 // 2
    qw = np.asarray(ap["q_w"])
    out[m + "MultiHeadDotProductAttention_0/query/kernel"] = qw.T.reshape(32, 2, hd)
    out[m + "MultiHeadDotProductAttention_0/query/bias"] = np.asarray(ap["q_b"]).reshape(2, hd)
    kv = np.asarray(ap["kv_w"])
    kvb = np.asarray(ap["kv_b"])
    out[m + "MultiHeadDotProductAttention_0/key/kernel"] = kv[:32].T.reshape(32, 2, hd)
    out[m + "MultiHeadDotProductAttention_0/key/bias"] = kvb[:32].reshape(2, hd)
    out[m + "MultiHeadDotProductAttention_0/value/kernel"] = kv[32:].T.reshape(32, 2, hd)
    out[m + "MultiHeadDotProductAttention_0/value/bias"] = kvb[32:].reshape(2, hd)
    out[m + "MultiHeadDotProductAttention_0/out/kernel"] = \
        np.asarray(ap["proj_w"]).T.reshape(2, hd, 32)
    out[m + "MultiHeadDotProductAttention_0/out/bias"] = np.asarray(ap["proj_b"])
    out[m + "LayerNorm_0/scale"] = np.asarray(ap["norm"]["scale"])
    out[m + "LayerNorm_0/bias"] = np.asarray(ap["norm"]["bias"])
    out[m + "MlpBlock_0/Dense_0/kernel"] = np.asarray(ap["mlp"]["c_fc_w"]).T
    out[m + "MlpBlock_0/Dense_0/bias"] = np.asarray(ap["mlp"]["c_fc_b"])
    out[m + "MlpBlock_0/Dense_1/kernel"] = np.asarray(ap["mlp"]["c_proj_w"]).T
    out[m + "MlpBlock_0/Dense_1/bias"] = np.asarray(ap["mlp"]["c_proj_b"])

    # text tower under Encoder_0 with a head dense (big_vision text_transformer)
    from rs_ov.core.config import TextConfig
    from rs_ov.core.params import init_text_params

    tcfg = TextConfig(context_length=8, vocab_size=64, width=32, heads=2,
                      layers=2, output_dim=32, pool_type="last",
                      no_causal_mask=True, proj_bias=True)
    text = init_text_params(jax.random.PRNGKey(1), tcfg)
    t = "params/txt/"
    out[t + "Embed_0/embedding"] = np.asarray(text["token_embedding"])
    out[t + "pos_embedding"] = np.asarray(text["positional_embedding"])[None]
    _export_blocks(text["blocks"], 32, 2, out, t + "Encoder_0")
    out[t + "Encoder_0/encoder_norm/scale"] = np.asarray(text["ln_final"]["scale"])
    out[t + "Encoder_0/encoder_norm/bias"] = np.asarray(text["ln_final"]["bias"])
    out[t + "head/kernel"] = np.asarray(text["text_projection"])
    out[t + "head/bias"] = np.asarray(text["text_projection_b"])
    out["params/t"] = np.asarray(1.0, np.float32)
    out["params/b"] = np.asarray(-9.0, np.float32)

    path = str(tmp_path / "siglip.npz")
    np.savez(path, **out)

    from rs_ov.core.checkpoint import siglip_params_from_big_vision_npz

    loaded = siglip_params_from_big_vision_npz(path)
    img = jnp.asarray(np.random.RandomState(2).randn(1, 3, 32, 32), jnp.float32)
    got = tt.siglip_vit_forward(loaded["visual"]["trunk"], img, arch)
    want = tt.siglip_vit_forward(trunk, img, arch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    from rs_ov.text.encoder import text_forward

    ids = jnp.asarray(np.random.RandomState(3).randint(1, 64, (2, 8)), jnp.int32)
    got_t = text_forward(loaded["text"], ids, tcfg)
    want_t = text_forward(text, ids, tcfg)
    np.testing.assert_allclose(np.asarray(got_t), np.asarray(want_t), atol=1e-6)
    assert float(loaded["logit_scale"]) == 1.0
    assert float(loaded["logit_bias"]) == -9.0
