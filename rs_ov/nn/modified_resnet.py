"""CLIP's ModifiedResNet vision tower (attention-pooled anti-aliased ResNet).

Functional re-implementation of reference open_clip/modified_resnet.py:
3-conv stem with avgpool, Bottleneck blocks whose strided convs are replaced
by stride-1 conv + avgpool (anti-aliasing), and a QKV attention pool head.
Selectable via model configs in the reference; unused by the RS eval path but
part of the model-zoo capability surface. BatchNorms run in eval mode
(affine transform with running statistics).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from rs_ov.nn.layers import linear

__all__ = ["ModifiedResNetConfig", "modified_resnet_forward",
           "resnet_params_from_state_dict"]


@dataclasses.dataclass(frozen=True)
class ModifiedResNetConfig:
    layers: tuple[int, int, int, int] = (3, 4, 6, 3)
    output_dim: int = 1024
    heads: int = 32
    image_size: int = 224
    width: int = 64


def _conv(x, w, stride=1, padding=0):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW")).astype(x.dtype)


def _bn(x, p, eps=1e-5):
    scale = (p["scale"] / jnp.sqrt(p["var"] + eps)).astype(jnp.float32)
    bias = (p["bias"] - p["mean"] * scale).astype(jnp.float32)
    return (x.astype(jnp.float32) * scale[None, :, None, None]
            + bias[None, :, None, None]).astype(x.dtype)


def _avgpool(x, k):
    if k <= 1:
        return x
    b, c, h, w = x.shape
    return x.reshape(b, c, h // k, k, w // k, k).mean(axis=(3, 5))


def _bottleneck(x, p, stride):
    out = jax.nn.relu(_bn(_conv(x, p["conv1_w"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2_w"], padding=1), p["bn2"]))
    out = _avgpool(out, stride)
    out = _bn(_conv(out, p["conv3_w"]), p["bn3"])
    if "down_conv_w" in p:
        identity = _bn(_conv(_avgpool(x, stride), p["down_conv_w"]), p["down_bn"])
    else:
        identity = x
    return jax.nn.relu(out + identity)


def _attention_pool(x, p, heads):
    """QKV attention pool (reference modified_resnet.py:58-94): mean token
    prepended, per-token pos embed, separate q/k/v projections."""
    b, c, h, w = x.shape
    tokens = x.reshape(b, c, h * w).transpose(0, 2, 1)  # [B, HW, C]
    mean = tokens.mean(axis=1, keepdims=True)
    tokens = jnp.concatenate([mean, tokens], axis=1)  # [B, HW+1, C]
    tokens = tokens + p["positional_embedding"].astype(tokens.dtype)[None]

    q = linear(tokens[:, :1], p["q_w"], p["q_b"])  # only the mean-token query
    k = linear(tokens, p["k_w"], p["k_b"])
    v = linear(tokens, p["v_w"], p["v_b"])
    hd = c // heads

    def split(t):
        return t.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    attn = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                      k.astype(jnp.float32)) * hd ** -0.5
    attn = jax.nn.softmax(attn, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v.astype(jnp.float32))
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, 1, c).astype(x.dtype)
    return linear(ctx[:, 0], p["c_w"], p["c_b"])


def modified_resnet_forward(p: dict, images: jnp.ndarray,
                            cfg: ModifiedResNetConfig) -> jnp.ndarray:
    """[B, 3, S, S] -> pooled embedding [B, output_dim]."""
    x = images
    for i in (1, 2, 3):
        stride = 2 if i == 1 else 1
        x = jax.nn.relu(_bn(_conv(x, p[f"stem_conv{i}_w"], stride=stride,
                                  padding=1), p[f"stem_bn{i}"]))
    x = _avgpool(x, 2)
    for li, blocks in enumerate(p["layers"]):
        for bi, blk in enumerate(blocks):
            stride = (2 if li > 0 else 1) if bi == 0 else 1
            x = _bottleneck(x, blk, stride)
    return _attention_pool(x, p["attnpool"], cfg.heads)


def resnet_params_from_state_dict(sd, prefix: str = "", dtype=jnp.float32) -> dict:
    """Map a torch ModifiedResNet state dict to the rs_ov pytree."""
    def a(name):
        return jnp.asarray(sd[f"{prefix}{name}"], dtype)

    def bn(name):
        return {"scale": a(f"{name}.weight"), "bias": a(f"{name}.bias"),
                "mean": a(f"{name}.running_mean"), "var": a(f"{name}.running_var")}

    params = {f"stem_conv{i}_w": a(f"conv{i}.weight") for i in (1, 2, 3)}
    params.update({f"stem_bn{i}": bn(f"bn{i}") for i in (1, 2, 3)})
    layers = []
    for li in range(1, 5):
        blocks = []
        bi = 0
        while f"{prefix}layer{li}.{bi}.conv1.weight" in sd:
            pre = f"layer{li}.{bi}"
            blk = {
                "conv1_w": a(f"{pre}.conv1.weight"), "bn1": bn(f"{pre}.bn1"),
                "conv2_w": a(f"{pre}.conv2.weight"), "bn2": bn(f"{pre}.bn2"),
                "conv3_w": a(f"{pre}.conv3.weight"), "bn3": bn(f"{pre}.bn3"),
            }
            if f"{prefix}{pre}.downsample.0.weight" in sd:
                blk["down_conv_w"] = a(f"{pre}.downsample.0.weight")
                blk["down_bn"] = bn(f"{pre}.downsample.1")
            blocks.append(blk)
            bi += 1
        layers.append(blocks)
    params["layers"] = layers
    params["attnpool"] = {
        "positional_embedding": a("attnpool.positional_embedding"),
        "q_w": a("attnpool.q_proj.weight"), "q_b": a("attnpool.q_proj.bias"),
        "k_w": a("attnpool.k_proj.weight"), "k_b": a("attnpool.k_proj.bias"),
        "v_w": a("attnpool.v_proj.weight"), "v_b": a("attnpool.v_proj.bias"),
        "c_w": a("attnpool.c_proj.weight"), "c_b": a("attnpool.c_proj.bias"),
    }
    return params
