"""HuggingFace-style text towers (RoBERTa / BERT family), TPU-native.

Re-implements the reference's HF transformer text-tower adapter
(reference open_clip/hf_model.py:96-193 ``HFTextEncoder`` + the pooler
registry :36-93 and arch table hf_configs.py) without torch/transformers at
runtime: the encoder is the same functional BERT stack the BLIP path uses
(rs_ov.nn.bert), parameterised per architecture (LayerNorm eps, position-id
scheme), plus the reference's pooler registry and projection heads, and an
HF-state-dict -> pytree name mapping.

Architectures covered: ``roberta`` / ``xlm-roberta`` (pad-offset position
ids, mean pooler default) and ``bert`` (cls pooler default, tanh pooler
head). The reference's encoder-decoder rows (mt5, m2m_100) bind to
transformers T5 stacks and stay out of scope — construction raises with the
same clarity the reference reserves for missing transformers.

Poolers (reference hf_model.py:45-93): ``mean_pooler`` masked mean;
``max_pooler`` masked max — NOTE the reference's MaxPooler fills the *valid*
positions with -inf (``masked_fill(attention_mask.unsqueeze(-1), -inf)``,
hf_model.py:58), an evident bug no config exercises; we implement the
intended semantics (mask out padding) and document the deviation here;
``cls_pooler`` HF pooler_output (tanh dense) when the checkpoint carries one,
else the raw CLS hidden state; ``cls_last_hidden_state_pooler`` raw CLS.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from rs_ov.nn.bert import BertConfig, bert_encode
from rs_ov.nn.layers import gelu, linear

__all__ = [
    "HFTextConfig", "hf_text_config", "hf_text_encode",
    "init_hf_text_params", "hf_text_params_from_state_dict",
]

# reference hf_configs.py arch_dict — default pooler + pad id per family
_ARCH = {
    "roberta": dict(pooler="mean_pooler", pad_token_id=1, layer_norm_eps=1e-5),
    "xlm-roberta": dict(pooler="mean_pooler", pad_token_id=1,
                        layer_norm_eps=1e-5),
    "bert": dict(pooler="cls_pooler", pad_token_id=0, layer_norm_eps=1e-12),
}


@dataclasses.dataclass(frozen=True)
class HFTextConfig:
    model_type: str = "roberta"
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    output_dim: int = 512
    pooler_type: str = "mean_pooler"
    proj_type: Optional[str] = None  # None | 'linear' | 'mlp'

    @property
    def bert(self) -> BertConfig:
        return BertConfig(vocab_size=self.vocab_size,
                          hidden_size=self.hidden_size,
                          num_layers=self.num_layers,
                          num_heads=self.num_heads,
                          intermediate_size=self.intermediate_size,
                          max_position_embeddings=self.max_position_embeddings,
                          layer_norm_eps=self.layer_norm_eps)


def hf_text_config(model_name: str, output_dim: int,
                   proj_type: Optional[str] = None) -> HFTextConfig:
    """Config for the HF names the reference's model_configs reach
    (reference hf_model.py resolves these via AutoConfig; zero-egress here,
    so the well-known architectures are tabulated)."""
    known = {
        "roberta-base": dict(model_type="roberta"),
        "roberta-large": dict(model_type="roberta", hidden_size=1024,
                              num_layers=24, num_heads=16,
                              intermediate_size=4096),
        "xlm-roberta-base": dict(model_type="xlm-roberta", vocab_size=250002),
        "xlm-roberta-large": dict(model_type="xlm-roberta", vocab_size=250002,
                                  hidden_size=1024, num_layers=24,
                                  num_heads=16, intermediate_size=4096),
        "bert-base-uncased": dict(model_type="bert", vocab_size=30522,
                                  max_position_embeddings=512),
    }
    if model_name not in known:
        raise NotImplementedError(
            f"HF text tower '{model_name}' is not tabulated (known: "
            f"{sorted(known)}; encoder-decoder archs like mt5/m2m_100 bind "
            "to transformers stacks and are out of the TPU-native scope).")
    kw = dict(known[model_name])
    arch = _ARCH[kw["model_type"]]
    kw.setdefault("pad_token_id", arch["pad_token_id"])
    kw.setdefault("layer_norm_eps", arch["layer_norm_eps"])
    return HFTextConfig(output_dim=output_dim,
                        pooler_type=arch["pooler"],
                        proj_type=proj_type, **kw)


def _position_ids(input_ids: jnp.ndarray, cfg: HFTextConfig) -> Optional[jnp.ndarray]:
    """RoBERTa's create_position_ids_from_input_ids: positions count only
    non-pad tokens, offset past padding_idx; BERT uses plain 0..L-1."""
    if cfg.model_type in ("roberta", "xlm-roberta"):
        mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
        return jnp.cumsum(mask, axis=1) * mask + cfg.pad_token_id
    return None


def _pool(hidden: jnp.ndarray, mask: jnp.ndarray, p: dict,
          cfg: HFTextConfig) -> jnp.ndarray:
    m = mask.astype(jnp.float32)[..., None]
    if cfg.pooler_type == "mean_pooler":
        h32 = hidden.astype(jnp.float32)
        return ((h32 * m).sum(axis=1)
                / jnp.maximum(m.sum(axis=1), 1e-9)).astype(hidden.dtype)
    if cfg.pooler_type == "max_pooler":
        # intended semantics (pads masked out); the reference's masked_fill
        # polarity bug is documented in the module docstring
        neg = jnp.where(m > 0, hidden.astype(jnp.float32), -jnp.inf)
        return jnp.max(neg, axis=1).astype(hidden.dtype)
    if cfg.pooler_type == "cls_pooler":
        if p.get("pooler") is not None:
            return jnp.tanh(linear(hidden[:, 0], p["pooler"]["w"],
                                   p["pooler"]["b"]))
        return hidden[:, 0]
    if cfg.pooler_type == "cls_last_hidden_state_pooler":
        return hidden[:, 0]
    raise ValueError(f"Unknown pooler '{cfg.pooler_type}' "
                     "(reference hf_model.py _POOLERS)")


def _project(pooled: jnp.ndarray, p: dict, cfg: HFTextConfig) -> jnp.ndarray:
    if p.get("proj") is None:
        return pooled
    if cfg.proj_type == "linear":
        return linear(pooled, p["proj"]["w"])
    # mlp: Linear -> GELU -> Linear, both bias-free (reference :148-154)
    return linear(gelu(linear(pooled, p["proj"]["w0"])), p["proj"]["w1"])


def hf_text_encode(p: dict, input_ids: jnp.ndarray, cfg: HFTextConfig,
                   output_tokens: bool = False):
    """ids [B, L] -> projected [B, output_dim] (reference HFTextEncoder
    .forward :156-170: attention mask from pad_token_id, pool, project;
    with output_tokens, also the token features — minus the CLS position
    when the pooler is cls_pooler, matching the reference's type check)."""
    mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
    hidden = bert_encode(p["transformer"], input_ids, mask, cfg.bert,
                         position_ids=_position_ids(input_ids, cfg))
    projected = _project(_pool(hidden, mask, p, cfg), p, cfg)
    if not output_tokens:
        return projected
    tokens = hidden[:, 1:] if cfg.pooler_type == "cls_pooler" else hidden
    return projected, tokens


def init_hf_text_params(key, cfg: HFTextConfig, dtype=jnp.float32) -> dict:
    from rs_ov.nn.blip import _bert_layer, _ln

    h = cfg.hidden_size
    keys = jax.random.split(key, cfg.num_layers + 5)

    def lin(k, o, i):
        return (jax.random.normal(k, (o, i)) * 0.02).astype(dtype)

    params = {
        "transformer": {
            "embeddings": {
                "word": lin(keys[0], cfg.vocab_size, h),
                "position": lin(keys[1], cfg.max_position_embeddings, h),
                "token_type": jnp.zeros((2, h), dtype),
                "ln": _ln(h, dtype),
            },
            "layers": [_bert_layer(keys[2 + i], h, cfg.intermediate_size, dtype)
                       for i in range(cfg.num_layers)],
        },
        "pooler": None,
        "proj": None,
    }
    if cfg.pooler_type == "cls_pooler":
        params["pooler"] = {"w": lin(keys[-3], h, h),
                            "b": jnp.zeros((h,), dtype)}
    if cfg.proj_type == "linear":
        params["proj"] = {"w": lin(keys[-2], cfg.output_dim, h)}
    elif cfg.proj_type == "mlp":
        mid = (h + cfg.output_dim) // 2
        params["proj"] = {"w0": lin(keys[-2], mid, h),
                          "w1": lin(keys[-1], cfg.output_dim, mid)}
    elif cfg.proj_type is None and h != cfg.output_dim:
        raise ValueError(
            f"hidden_size {h} != output_dim {cfg.output_dim} requires "
            "proj_type 'linear' or 'mlp' (reference hf_model.py:144-154)")
    return params


def hf_text_params_from_state_dict(sd: dict, cfg: Optional[HFTextConfig] = None,
                                   prefix: str = "") -> dict:
    """Map an HF transformers state dict onto the pytree. ``prefix`` is the
    HFTextEncoder module path inside a larger checkpoint (e.g. 'text.' for
    CoCa, whose tower lives at text.transformer.* / text.proj.* — reference
    hf_model.py:121-154); bare encoder dicts (a saved RobertaModel/BertModel,
    optionally nested under transformers' base_model_prefix 'roberta.'/
    'bert.') are detected too."""
    import numpy as np

    def a(name):
        return jnp.asarray(np.asarray(sd[name]))

    def ln(stem):
        return {"scale": a(f"{stem}.weight"), "bias": a(f"{stem}.bias")}

    tp = None
    for enc in (f"{prefix}transformer.", prefix):
        for base in ("", "roberta.", "bert.", "xlm-roberta."):
            if f"{enc}{base}embeddings.word_embeddings.weight" in sd:
                tp = f"{enc}{base}"
                break
        if tp is not None:
            break
    if tp is None:
        raise KeyError(
            f"No HF text encoder found under prefix '{prefix}' "
            "(looked for [transformer.][roberta.|bert.]embeddings.*)")

    emb = {
        "word": a(f"{tp}embeddings.word_embeddings.weight"),
        "position": a(f"{tp}embeddings.position_embeddings.weight"),
        "ln": ln(f"{tp}embeddings.LayerNorm"),
    }
    if f"{tp}embeddings.token_type_embeddings.weight" in sd:
        emb["token_type"] = a(f"{tp}embeddings.token_type_embeddings.weight")

    layers = []
    i = 0
    while f"{tp}encoder.layer.{i}.attention.self.query.weight" in sd:
        pre = f"{tp}encoder.layer.{i}"
        layers.append({
            "q_w": a(f"{pre}.attention.self.query.weight"),
            "q_b": a(f"{pre}.attention.self.query.bias"),
            "k_w": a(f"{pre}.attention.self.key.weight"),
            "k_b": a(f"{pre}.attention.self.key.bias"),
            "v_w": a(f"{pre}.attention.self.value.weight"),
            "v_b": a(f"{pre}.attention.self.value.bias"),
            "attn_out_w": a(f"{pre}.attention.output.dense.weight"),
            "attn_out_b": a(f"{pre}.attention.output.dense.bias"),
            "attn_ln": ln(f"{pre}.attention.output.LayerNorm"),
            "inter_w": a(f"{pre}.intermediate.dense.weight"),
            "inter_b": a(f"{pre}.intermediate.dense.bias"),
            "out_w": a(f"{pre}.output.dense.weight"),
            "out_b": a(f"{pre}.output.dense.bias"),
            "out_ln": ln(f"{pre}.output.LayerNorm"),
        })
        i += 1
    if cfg is not None and i != cfg.num_layers:
        raise ValueError(f"state dict has {i} encoder layers, config expects "
                         f"{cfg.num_layers}")

    params = {"transformer": {"embeddings": emb, "layers": layers},
              "pooler": None, "proj": None}
    if f"{tp}pooler.dense.weight" in sd:
        params["pooler"] = {"w": a(f"{tp}pooler.dense.weight"),
                            "b": a(f"{tp}pooler.dense.bias")}
    if f"{prefix}proj.weight" in sd:  # reference nn.Linear(d, out, bias=False)
        params["proj"] = {"w": a(f"{prefix}proj.weight")}
    elif f"{prefix}proj.0.weight" in sd:  # mlp Sequential
        params["proj"] = {"w0": a(f"{prefix}proj.0.weight"),
                          "w1": a(f"{prefix}proj.2.weight")}
    return params
