"""HF text-tower adapter vs transformers oracles (reference hf_model.py).

Golden parity: a tiny random-weight RobertaModel / BertModel run via
transformers (torch CPU) against rs_ov.nn.hf_text on the same state dict —
covering the RoBERTa pad-offset position ids, the mean/cls poolers, the
tanh pooler head, the proj heads and the output_tokens CLS-exclusion quirk
(reference hf_model.py:156-170).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from rs_ov.nn.hf_text import (  # noqa: E402
    HFTextConfig, hf_text_config, hf_text_encode, hf_text_params_from_state_dict,
    init_hf_text_params)

H, L, HEADS, INTER, V, P = 32, 2, 2, 64, 120, 40


def _ids(pad_id, rng):
    ids = rng.randint(4, V, size=(3, 10)).astype(np.int64)
    ids[0, 7:] = pad_id  # trailing padding on one row
    ids[1, 5:] = pad_id
    return ids


def test_roberta_parity_mean_pooler():
    from transformers import RobertaConfig, RobertaModel

    torch.manual_seed(0)
    hf_cfg = RobertaConfig(vocab_size=V, hidden_size=H, num_hidden_layers=L,
                           num_attention_heads=HEADS, intermediate_size=INTER,
                           max_position_embeddings=P, pad_token_id=1,
                           type_vocab_size=1)
    model = RobertaModel(hf_cfg, add_pooling_layer=False).eval()

    cfg = HFTextConfig(model_type="roberta", vocab_size=V, hidden_size=H,
                       num_layers=L, num_heads=HEADS, intermediate_size=INTER,
                       max_position_embeddings=P, layer_norm_eps=1e-5,
                       pad_token_id=1, output_dim=H, pooler_type="mean_pooler")
    params = hf_text_params_from_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}, cfg)

    rng = np.random.RandomState(3)
    ids = _ids(1, rng)
    with torch.no_grad():
        t_ids = torch.from_numpy(ids)
        mask = (t_ids != 1).long()
        out = model(input_ids=t_ids, attention_mask=mask).last_hidden_state
        want = ((out * mask.unsqueeze(-1)).sum(1)
                / mask.sum(-1, keepdim=True)).numpy()

    got = np.asarray(hf_text_encode(params, jnp.asarray(ids.astype(np.int32)),
                                    cfg))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)

    # output_tokens: mean pooler keeps every position
    _, tokens = hf_text_encode(params, jnp.asarray(ids.astype(np.int32)), cfg,
                               output_tokens=True)
    np.testing.assert_allclose(np.asarray(tokens), out.numpy(),
                               atol=5e-4, rtol=1e-3)


def test_bert_parity_cls_pooler_and_proj():
    from transformers import BertConfig as HFBertConfig, BertModel

    torch.manual_seed(1)
    hf_cfg = HFBertConfig(vocab_size=V, hidden_size=H, num_hidden_layers=L,
                          num_attention_heads=HEADS, intermediate_size=INTER,
                          max_position_embeddings=P, pad_token_id=0)
    model = BertModel(hf_cfg, add_pooling_layer=True).eval()

    cfg = HFTextConfig(model_type="bert", vocab_size=V, hidden_size=H,
                       num_layers=L, num_heads=HEADS, intermediate_size=INTER,
                       max_position_embeddings=P, layer_norm_eps=1e-12,
                       pad_token_id=0, output_dim=H, pooler_type="cls_pooler")
    params = hf_text_params_from_state_dict(
        {k: v.numpy() for k, v in model.state_dict().items()}, cfg)
    assert params["pooler"] is not None  # tanh pooler head loaded

    rng = np.random.RandomState(5)
    ids = _ids(0, rng)
    with torch.no_grad():
        t_ids = torch.from_numpy(ids)
        mask = (t_ids != 0).long()
        out = model(input_ids=t_ids, attention_mask=mask)
        want = out.pooler_output.numpy()

    got = np.asarray(hf_text_encode(params, jnp.asarray(ids.astype(np.int32)),
                                    cfg))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)

    # output_tokens drops the CLS position for cls_pooler (reference :163-168)
    _, tokens = hf_text_encode(params, jnp.asarray(ids.astype(np.int32)), cfg,
                               output_tokens=True)
    np.testing.assert_allclose(np.asarray(tokens),
                               out.last_hidden_state.numpy()[:, 1:],
                               atol=5e-4, rtol=1e-3)


def test_proj_heads_and_registry():
    import jax

    cfg = hf_text_config("roberta-base", output_dim=512, proj_type="linear")
    assert cfg.pooler_type == "mean_pooler" and cfg.pad_token_id == 1

    tiny = HFTextConfig(model_type="roberta", vocab_size=50, hidden_size=16,
                        num_layers=1, num_heads=2, intermediate_size=32,
                        max_position_embeddings=24, output_dim=8,
                        pooler_type="mean_pooler", proj_type="mlp")
    params = init_hf_text_params(jax.random.PRNGKey(0), tiny)
    ids = jnp.asarray(np.random.RandomState(0).randint(2, 50, size=(2, 6)),
                      jnp.int32)
    out = hf_text_encode(params, ids, tiny)
    assert out.shape == (2, 8)

    with pytest.raises(NotImplementedError, match="mt5"):
        hf_text_config("mt5-base", output_dim=512)


def test_coca_roberta_builds_and_encodes():
    """coca_roberta-ViT-B-32 (the one reference config with an HF text tower)
    constructs from the factory and runs encode_text / forward through the
    rs_ov.nn.hf_text dispatch (reference coca_model.py:98-103 +
    model.py:182-190)."""
    from rs_ov.factory import create_model

    model = create_model("coca_roberta-ViT-B-32")
    ids = np.random.RandomState(0).randint(4, 1000, size=(2, 12))
    ids[:, -2:] = 1  # roberta pad id
    feats = np.asarray(model.encode_text(jnp.asarray(ids, jnp.int32)))
    assert feats.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-3)

    imgs = np.random.RandomState(1).randn(2, 3, 224, 224).astype(np.float32)
    # encode surface only: the reference's own coca_roberta caption forward
    # is broken upstream (512-d image_embs vs a 768-wide decoder cross-attn,
    # coca_model.py:92-123 + transformer.py:768-770) — we reproduce the
    # working contrastive surface
    out = model(jnp.asarray(imgs))
    assert out["image_features"].shape == (2, 512)
