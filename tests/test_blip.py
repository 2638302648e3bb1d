"""BLIP family parity: BERT text tower vs transformers, BLIP-ViT vs a torch
oracle of the reference math, WordPiece vs transformers' BertTokenizer,
pipeline smoke."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from rs_ov.nn.bert import BertConfig, bert_encode
from rs_ov.nn.blip import (BlipConfig, blip_encode_image, blip_params_from_state_dict,
                           init_blip_params)
from rs_ov.nn.blip_vit import BlipVisionConfig, blip_vit_forward


def test_bert_matches_transformers():
    from transformers import BertConfig as HFConfig, BertModel

    hf_cfg = HFConfig(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=64,
                      max_position_embeddings=40)
    torch.manual_seed(0)
    model = BertModel(hf_cfg, add_pooling_layer=False)
    model.eval()

    sd = {f"text_encoder.{k}": v.detach().numpy()
          for k, v in model.state_dict().items()}
    # reuse the BLIP mapping for the text tower
    sd["visual_encoder.patch_embed.proj.weight"] = np.zeros((8, 3, 4, 4), np.float32)
    sd["visual_encoder.patch_embed.proj.bias"] = np.zeros((8,), np.float32)
    sd["visual_encoder.cls_token"] = np.zeros((1, 1, 8), np.float32)
    sd["visual_encoder.pos_embed"] = np.zeros((1, 5, 8), np.float32)
    sd["visual_encoder.norm.weight"] = np.ones((8,), np.float32)
    sd["visual_encoder.norm.bias"] = np.zeros((8,), np.float32)
    sd["vision_proj.weight"] = np.zeros((4, 8), np.float32)
    sd["vision_proj.bias"] = np.zeros((4,), np.float32)
    sd["text_proj.weight"] = np.zeros((4, 32), np.float32)
    sd["text_proj.bias"] = np.zeros((4,), np.float32)
    params = blip_params_from_state_dict(sd)

    cfg = BertConfig(vocab_size=120, hidden_size=32, num_layers=2, num_heads=2,
                     intermediate_size=64, max_position_embeddings=40)
    rng = np.random.RandomState(0)
    ids = rng.randint(1, 119, size=(3, 12)).astype(np.int64)
    mask = np.ones((3, 12), np.int64)
    mask[0, 8:] = 0
    mask[2, 5:] = 0
    with torch.no_grad():
        ref = model(torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    got = np.asarray(bert_encode(params["text"], jnp.asarray(ids.astype(np.int32)),
                                 jnp.asarray(mask.astype(np.int32)), cfg))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-4)


class _TorchBlipAttention(nn.Module):
    """Oracle of reference BLIP/models/vit.py:43-104 (Attention + forward_qq)."""

    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def _attend(self, x, qq):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads,
                                  C // self.num_heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        key = q if qq else k
        attn = (q @ key.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)

    def forward(self, x):
        return self._attend(x, qq=False)

    def forward_qq(self, x):
        return self._attend(x, qq=True)


class _TorchBlipBlock(nn.Module):
    """Oracle of reference BLIP/models/vit.py:107-132."""

    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = _TorchBlipAttention(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        hidden = int(dim * mlp_ratio)
        self.mlp = nn.Sequential(nn.Linear(dim, hidden), nn.GELU(),
                                 nn.Linear(hidden, dim))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))

    def forward_attn(self, x):
        return self.attn.forward_qq(self.norm1(x))


class _TorchBlipViT(nn.Module):
    """Oracle of reference BLIP/models/vit.py:135-224."""

    def __init__(self, img_size=32, patch=16, dim=32, depth=3, heads=2):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, patch, patch)
        g = (img_size // patch) ** 2
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, g + 1, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [_TorchBlipBlock(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x, ignore_residual=False):
        B = x.shape[0]
        x = self.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed[:, : x.size(1), :]
        for i, blk in enumerate(self.blocks):
            if i == len(self.blocks) - 1 and ignore_residual:
                x = blk.forward_attn(x)
            else:
                x = blk(x)
        return self.norm(x)


def build_tiny_blip_vit(depth=3):
    """(torch oracle, rs_ov params, BlipVisionConfig) with shared seeded
    weights — used by test_blip_vit_parity and tools/parity_check.py."""
    torch.manual_seed(1)
    oracle = _TorchBlipViT(depth=depth)
    oracle.eval()
    sd = oracle.state_dict()
    params = {
        "patch_embed": {"w": jnp.asarray(sd["proj.weight"].numpy()),
                        "b": jnp.asarray(sd["proj.bias"].numpy())},
        "cls_token": jnp.asarray(sd["cls_token"].numpy().reshape(-1)),
        "pos_embed": jnp.asarray(sd["pos_embed"].numpy()[0]),
        "blocks": [],
        "norm": {"scale": jnp.asarray(sd["norm.weight"].numpy()),
                 "bias": jnp.asarray(sd["norm.bias"].numpy())},
    }
    for i in range(depth):
        params["blocks"].append({
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
    cfg = BlipVisionConfig(image_size=32, patch_size=16, width=32, layers=depth,
                           heads=2)
    return oracle, params, cfg


@pytest.mark.parametrize("ignore_residual", [False, True])
def test_blip_vit_parity(ignore_residual):
    oracle, params, cfg = build_tiny_blip_vit()
    img = np.random.RandomState(2).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(img), ignore_residual=ignore_residual).numpy()
    got = np.asarray(blip_vit_forward(params, jnp.asarray(img), cfg,
                                      ignore_residual=ignore_residual))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


@pytest.fixture
def tiny_vocab(tmp_path):
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "a", "photo", "of", "the", "build", "##ing", "road", "tree",
             "water", "satellite", "##s", "bad", "good", "low", "##ly", ",",
             ".", "!", "?", "'", "s"]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(words) + "\n")
    return str(p)


def test_wordpiece_matches_transformers(tiny_vocab):
    from transformers import BertTokenizer

    from rs_ov.text.wordpiece import WordPieceTokenizer

    hf = BertTokenizer(tiny_vocab, do_lower_case=True)
    mine = WordPieceTokenizer(tiny_vocab)
    samples = ["a photo of the building.", "Roads, trees & water!",
               "badly lowly builds", "a photo of a tree's roots."]
    for s in samples:
        expect = hf(s, padding="max_length", truncation=True, max_length=12)
        got = mine(s, max_length=12)
        assert got["input_ids"][0].tolist() == expect["input_ids"], s
        assert got["attention_mask"][0].tolist() == expect["attention_mask"], s


def test_blip_pipeline_smoke(tiny_vocab, tmp_path):
    from rs_ov.pipeline.segmentor import SegmentorEx

    cls = tmp_path / "cls.txt"
    cls.write_text("background\nbuilding")
    cfg = BlipConfig(vision=BlipVisionConfig(image_size=64, patch_size=16,
                                             width=32, layers=2, heads=2),
                     text=BertConfig(vocab_size=26, hidden_size=16, num_layers=1,
                                     num_heads=2, intermediate_size=32,
                                     max_position_embeddings=40),
                     embed_dim=16)
    seg = SegmentorEx(clip_type="BLIP", vit_type="ViT-B/16", model_type="BLIP",
                      name_path=str(cls), clip_config=cfg,
                      blip_vocab_path=tiny_vocab, param_dtype=jnp.float32,
                      slide_stride=32, slide_crop=64,
                      global_debias_factor=0.0)
    img = np.random.RandomState(0).randn(1, 3, 96, 96).astype(np.float32)
    result = seg.predict(img, [{"ori_shape": (96, 96)}])[0]
    assert np.asarray(result["pred_sem_seg"]).shape == (1, 96, 96)


def test_blip_itm_and_multimodal_surface():
    """BLIP_ITM forward (reference blip_itm.py:41-67): 'itm' -> [B, 2]
    match logits via the multimodal CLS, 'itc' -> [B, B] cosine matrix that
    must equal the manual proj+normalize composition."""
    import jax

    from rs_ov.nn.blip import (blip_encode_text, blip_itm_score,
                               blip_multimodal_features, init_blip_params)
    from rs_ov.train.blip_retrieval import init_blip_retrieval_state

    cfg = BlipConfig(
        vision=BlipVisionConfig(image_size=32, patch_size=16, width=32,
                                layers=2, heads=2),
        text=BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                        num_heads=2, intermediate_size=64,
                        max_position_embeddings=16),
        embed_dim=16)
    params = init_blip_retrieval_state(jax.random.PRNGKey(0), cfg,
                                       queue_size=8)["params"]
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 3, 32, 32), jnp.float32)
    ids = jnp.asarray(rng.randint(4, 60, (2, 7)), jnp.int32)
    mask = jnp.ones((2, 7), jnp.int32)

    itm = blip_itm_score(params, images, ids, mask, cfg, match_head="itm")
    assert itm.shape == (2, 2) and np.isfinite(np.asarray(itm)).all()

    itc = np.asarray(blip_itm_score(params, images, ids, mask, cfg,
                                    match_head="itc"))
    from rs_ov.nn.blip_vit import blip_vit_forward
    from rs_ov.nn.layers import linear
    emb = blip_vit_forward(params["visual"], images, cfg.vision)
    imf = np.asarray(linear(emb[:, 0, :], params["vision_proj"]["w"],
                            params["vision_proj"]["b"]))
    imf = imf / np.linalg.norm(imf, axis=-1, keepdims=True)
    txf = np.asarray(blip_encode_text(params, ids, mask, cfg))
    np.testing.assert_allclose(itc, imf @ txf.T, atol=1e-5)

    mm = blip_multimodal_features(params, images, ids, mask, cfg)
    assert mm.shape == (2, 7, 32)

    with pytest.raises(ValueError, match="match_head"):
        blip_itm_score(params, images, ids, mask, cfg, match_head="x")
