"""CoCa parity vs the reference's own torch modules (transformer.py pieces)
plus assembly/generation behavior tests."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ref_shim import load_reference_transformer

from rs_ov.nn.coca import (CoCaConfig, MultimodalConfig, attentional_pool,
                           coca_encode_text, coca_forward, coca_generate,
                           init_coca_params, multimodal_decoder)
from rs_ov.core.config import TextConfig, VisionConfig


def _ln(mod):
    return {"scale": jnp.asarray(mod.weight.detach().numpy()),
            "bias": jnp.asarray(mod.bias.detach().numpy())}


def _blk(blk):
    return {
        "ln_1": _ln(blk.ln_1), "ln_2": _ln(blk.ln_2),
        "attn": {
            "in_proj_w": jnp.asarray(blk.attn.in_proj_weight.detach().numpy()),
            "in_proj_b": jnp.asarray(blk.attn.in_proj_bias.detach().numpy()),
            "out_proj_w": jnp.asarray(blk.attn.out_proj.weight.detach().numpy()),
            "out_proj_b": jnp.asarray(blk.attn.out_proj.bias.detach().numpy()),
        },
        "mlp": {
            "c_fc_w": jnp.asarray(blk.mlp.c_fc.weight.detach().numpy()),
            "c_fc_b": jnp.asarray(blk.mlp.c_fc.bias.detach().numpy()),
            "c_proj_w": jnp.asarray(blk.mlp.c_proj.weight.detach().numpy()),
            "c_proj_b": jnp.asarray(blk.mlp.c_proj.bias.detach().numpy()),
        },
    }


SMALL = CoCaConfig(
    embed_dim=16,
    vision=VisionConfig(image_size=32, patch_size=16, width=24, layers=2,
                        output_dim=16, head_width=12),
    text=TextConfig(context_length=12, vocab_size=64, width=16, heads=2,
                    layers=2, output_dim=16, pool_type="last"),
    multimodal=MultimodalConfig(context_length=12, vocab_size=64, width=16,
                                heads=2, layers=2),
    attn_pooler_queries=8, attn_pooler_heads=2,
)


def test_attentional_pooler_parity():
    tmod = load_reference_transformer()
    torch.manual_seed(0)
    pooler = tmod.AttentionalPooler(d_model=16, context_dim=24, n_head=2,
                                    n_queries=8)
    pooler.eval()
    p = {
        "query": jnp.asarray(pooler.query.detach().numpy()),
        "ln_q": _ln(pooler.ln_q), "ln_k": _ln(pooler.ln_k),
        "q_proj_w": jnp.asarray(pooler.attn.q_proj_weight.detach().numpy()),
        "k_proj_w": jnp.asarray(pooler.attn.k_proj_weight.detach().numpy()),
        "v_proj_w": jnp.asarray(pooler.attn.v_proj_weight.detach().numpy()),
        "in_proj_b": jnp.asarray(pooler.attn.in_proj_bias.detach().numpy()),
        "out_proj_w": jnp.asarray(pooler.attn.out_proj.weight.detach().numpy()),
        "out_proj_b": jnp.asarray(pooler.attn.out_proj.bias.detach().numpy()),
    }
    x = np.random.RandomState(1).randn(3, 10, 24).astype(np.float32)
    with torch.no_grad():
        ref = pooler(torch.from_numpy(x)).numpy()
    got = np.asarray(attentional_pool(p, jnp.asarray(x), heads=2))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-4)


def _ref_text_tower():
    tmod = load_reference_transformer()
    torch.manual_seed(1)
    return tmod.TextTransformer(context_length=12, vocab_size=64, width=16,
                                heads=2, layers=2, output_dim=16,
                                embed_cls=True, output_tokens=True,
                                no_causal_mask=False).eval()


def _text_params(tt):
    return {
        "token_embedding": jnp.asarray(tt.token_embedding.weight.detach().numpy()),
        "positional_embedding": jnp.asarray(tt.positional_embedding.detach().numpy()),
        "cls_emb": jnp.asarray(tt.cls_emb.detach().numpy()),
        "blocks": [_blk(b) for b in tt.transformer.resblocks],
        "ln_final": _ln(tt.ln_final),
        "text_projection": jnp.asarray(tt.text_projection.detach().numpy()),
    }


def test_embed_cls_text_tower_parity():
    """embed_cls text tower incl. the pad-aware cls mask (cls row only)."""
    tt = _ref_text_tower()
    params = {"text": _text_params(tt)}
    texts = np.zeros((3, 12), np.int64)
    rng = np.random.RandomState(2)
    for i, n in enumerate((12, 7, 3)):  # one full row, two padded rows
        texts[i, :n] = rng.randint(1, 63, size=n)
    with torch.no_grad():
        ref_latent, ref_tokens = tt(torch.from_numpy(texts))
    got_latent, got_tokens = coca_encode_text(params, jnp.asarray(texts.astype(np.int32)),
                                              SMALL, normalize=False)
    np.testing.assert_allclose(np.asarray(got_latent), ref_latent.numpy(),
                               atol=3e-5, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(got_tokens), ref_tokens.numpy(),
                               atol=3e-5, rtol=2e-4)


def test_multimodal_decoder_parity():
    tmod = load_reference_transformer()
    torch.manual_seed(2)
    dec = tmod.MultimodalTransformer(width=16, layers=2, heads=2,
                                     context_length=12, output_dim=64).eval()
    with torch.no_grad():
        dec.text_projection.normal_(std=0.1)
    blocks, cross = [], []
    for rb, cb in zip(dec.resblocks, dec.cross_attn):
        blocks.append(_blk(rb))
        c = _blk(cb)
        c["ln_1_kv"] = _ln(cb.ln_1_kv)
        cross.append(c)
    params = {"multimodal": {
        "blocks": blocks, "cross_blocks": cross, "ln_final": _ln(dec.ln_final),
        "text_projection": jnp.asarray(dec.text_projection.detach().numpy()),
    }}
    rng = np.random.RandomState(3)
    img = rng.randn(2, 7, 16).astype(np.float32)
    txt = rng.randn(2, 9, 16).astype(np.float32)
    with torch.no_grad():
        ref = dec(torch.from_numpy(img), torch.from_numpy(txt)).numpy()
    got = np.asarray(multimodal_decoder(params, jnp.asarray(img),
                                        jnp.asarray(txt), SMALL))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=2e-4)


def test_coca_forward_contract_and_loss():
    """Assembly: output dict contract (coca_model.py:157-186) feeds the CoCa
    loss; shapes and label slicing line up."""
    import jax

    from rs_ov.train.losses import coca_loss

    params = init_coca_params(jax.random.PRNGKey(0), SMALL)
    rng = np.random.RandomState(4)
    images = jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32))
    texts = np.zeros((2, 12), np.int32)
    texts[:, :6] = rng.randint(1, 63, size=(2, 6))
    out = coca_forward(params, images, jnp.asarray(texts), SMALL)
    assert out["image_features"].shape == (2, 16)
    assert out["text_features"].shape == (2, 16)
    assert out["logits"].shape == (2, 12, 64)
    assert out["labels"].shape == (2, 12)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(
        out["image_features"]), axis=-1), 1.0, atol=1e-5)
    total = coca_loss(out["image_features"], out["text_features"],
                      out["logits"], out["labels"], out["logit_scale"],
                      caption_weight=2.0, clip_weight=1.0)
    assert np.isfinite(float(total if not isinstance(total, tuple) else total[0]))

    # image-only call returns the encode dict
    d = coca_forward(params, images, None, SMALL)
    assert set(d) == {"image_features", "image_embs"}


@pytest.mark.parametrize("gtype,kw", [("top_k", {"top_k": 3}),
                                      ("top_p", {"top_p": 0.5}),
                                      ("beam_search", {"num_beams": 2})])
def test_coca_generate(gtype, kw):
    import jax

    params = init_coca_params(jax.random.PRNGKey(0), SMALL)
    rng = np.random.RandomState(5)
    images = jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32))
    out = coca_generate(params, images, SMALL, seq_len=8, min_seq_len=2,
                        generation_type=gtype, sot_token_id=1,
                        eos_token_id=2, **kw)
    assert out.shape[0] == 2 and out.shape[1] <= 8
    assert (out[:, 0] == 1).all()
    assert out.dtype == np.int32


def test_coca_generate_bad_type():
    import jax

    params = init_coca_params(jax.random.PRNGKey(0), SMALL)
    with pytest.raises(ValueError, match="generation_type"):
        coca_generate(params, jnp.zeros((1, 3, 32, 32)), SMALL,
                      generation_type="nope")


def test_coca_state_dict_loader():
    """coca_params_from_state_dict maps reference CoCa naming (visual.* w/
    attn_pool, text.* w/ cls_emb, text_decoder.*) onto the rs_ov pytree;
    loaded text tower matches the torch oracle."""
    from rs_ov.core.checkpoint import coca_params_from_state_dict

    tmod = load_reference_transformer()
    torch.manual_seed(3)
    vit = tmod.VisionTransformer(image_size=32, patch_size=16, width=24,
                                 layers=2, heads=2, mlp_ratio=4.0,
                                 output_dim=16, attentional_pool=True,
                                 attn_pooler_queries=8, attn_pooler_heads=2)
    tt = _ref_text_tower()
    dec = tmod.MultimodalTransformer(width=16, layers=2, heads=2,
                                     context_length=12, output_dim=64)
    with torch.no_grad():
        dec.text_projection.normal_(std=0.1)
    sd = {}
    for mod, prefix in ((vit, "visual."), (tt, "text."), (dec, "text_decoder.")):
        for k, v in mod.state_dict().items():
            sd[prefix + k] = v.numpy()
    sd["logit_scale"] = np.asarray(2.0, np.float32)
    params = coca_params_from_state_dict(sd)

    assert params["visual"]["attn_pool"]["query"].shape == (8, 16)
    assert params["text"]["cls_emb"].shape == (16,)
    assert len(params["multimodal"]["cross_blocks"]) == 2
    assert "ln_1_kv" in params["multimodal"]["cross_blocks"][0]

    texts = np.zeros((2, 12), np.int64)
    texts[:, :5] = np.random.RandomState(6).randint(1, 63, size=(2, 5))
    with torch.no_grad():
        ref_latent, _ = tt.eval()(torch.from_numpy(texts))
    got_latent, _ = coca_encode_text(params, jnp.asarray(texts.astype(np.int32)),
                                     SMALL, normalize=False)
    np.testing.assert_allclose(np.asarray(got_latent), ref_latent.numpy(),
                               atol=3e-5, rtol=2e-4)
