"""TPU-native vision towers for the timm-named arch configs.

The reference wraps `timm` models as CLIP vision towers through a thin
adapter (reference open_clip/timm_model.py:29-162): a trunk built by
``timm.create_model`` plus a pool/proj head whose semantics depend on the
(timm_pool, timm_proj) pair carried in the arch JSON. 25 of the 60 arch
configs use such towers. Here each family is re-implemented natively:

- **ConvNeXt** (convnext_tiny/small/base/large/xlarge/xxlarge): 4-stage
  depthwise-7x7 + pointwise-MLP CNN. NHWC layout end-to-end so the
  depthwise and dense convs tile straight onto the MXU/VPU; LayerNorm is
  channels-last (no permutes anywhere).
- **SigLIP ViT** (vit_{base,large}_patch16_siglip_*): CLS-less ViT with a
  learned MAP (attention-pool-latent) head, tanh-approx GELU and eps=1e-6
  LayerNorms (big_vision lineage).
- **EVA / EVA02** (eva_giant, eva02_{base,large,enormous}_clip): ViT with
  per-block options used by the EVA02 family: separate q/k/v projections
  (k without bias), 2-D axial rotary embeddings on the patch tokens,
  SwiGLU MLP with an inner LayerNorm (scale_mlp), attention inner
  LayerNorm (scale_attn_inner), and post-norm blocks (EVA02-E).

Head semantics reproduced from reference timm_model.py:58-109:
  pool ''/'avg' -> global average (ConvNeXt: trunk keeps its own avg-pool +
  head-norm, reference timm_model.py:86-90); pool 'map' -> MAP head inside
  the trunk; pool 'token' -> CLS. proj 'linear' -> Linear(prev, embed,
  bias=proj_bias); 'mlp' -> Mlp(prev, 2*embed, embed); 'none' -> identity;
  proj None with non-custom pool -> the trunk's own classifier head acts as
  the projection (reference timm_model.py:62-73 — the EVA configs).

EVA block-flag values follow timm's ``eva.py`` model registry for the five
eva names the reference configs use. No timm package exists in this image
(torch-cpu only); the ConvNeXt and SigLIP families are parity-tested against
``transformers``' ConvNextModel / SiglipVisionModel oracles, and the EVA
family against an independent from-scratch torch float64 oracle
(tests/test_eva_oracle.py: complex-number rotary, conv2d patchify) covering
every flag combination — exact-parity against real EVA checkpoints runs
through tools/parity_check.py the day weights exist.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from rs_ov.nn.attention import standard_attention
from rs_ov.nn.layers import gelu, layer_norm, linear, mlp

__all__ = [
    "TIMM_ARCHS", "timm_arch", "init_timm_tower_params", "timm_tower_forward",
]


def gelu_tanh(x):
    """tanh-approximated GELU (big_vision / HF 'gelu_pytorch_tanh')."""
    return jax.nn.gelu(x, approximate=True)


# ---------------------------------------------------------------------------
# Arch tables
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ConvNeXtArch:
    depths: tuple[int, ...]
    dims: tuple[int, ...]
    family: str = "convnext"


@dataclasses.dataclass(frozen=True)
class SigLipVitArch:
    patch: int
    width: int
    depth: int
    heads: int
    family: str = "siglip_vit"


@dataclasses.dataclass(frozen=True)
class EvaArch:
    patch: int
    width: int
    depth: int
    heads: int
    mlp_hidden: int
    swiglu: bool = False
    rope: bool = False
    scale_mlp: bool = False          # LayerNorm inside the (Swi)GLU MLP
    scale_attn_inner: bool = False   # LayerNorm on attn output pre-proj
    fused_qkv: bool = True
    post_norm: bool = False          # EVA02-E: norm AFTER each sublayer
    ref_feat_hw: tuple[int, int] | None = None  # rope ref_feat_shape
    family: str = "eva"


TIMM_ARCHS: dict[str, object] = {
    # ConvNeXt (timm convnext.py defaults)
    "convnext_tiny": ConvNeXtArch((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ConvNeXtArch((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ConvNeXtArch((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ConvNeXtArch((3, 3, 27, 3), (192, 384, 768, 1536)),
    "convnext_xlarge": ConvNeXtArch((3, 3, 27, 3), (256, 512, 1024, 2048)),
    "convnext_xxlarge": ConvNeXtArch((3, 4, 30, 3), (384, 768, 1536, 3072)),
    # SigLIP ViT (timm vision_transformer.py *_siglip registrations)
    "vit_base_patch16_siglip_224": SigLipVitArch(16, 768, 12, 12),
    "vit_base_patch16_siglip_256": SigLipVitArch(16, 768, 12, 12),
    "vit_base_patch16_siglip_384": SigLipVitArch(16, 768, 12, 12),
    "vit_base_patch16_siglip_512": SigLipVitArch(16, 768, 12, 12),
    "vit_large_patch16_siglip_256": SigLipVitArch(16, 1024, 24, 16),
    "vit_large_patch16_siglip_384": SigLipVitArch(16, 1024, 24, 16),
    # EVA / EVA02 (timm eva.py registrations for the CLIP variants)
    "eva_giant_patch14_224": EvaArch(14, 1408, 40, 16, 6144),
    "eva02_base_patch16_clip_224": EvaArch(
        16, 768, 12, 12, int(768 * 8 / 3), swiglu=True, rope=True,
        scale_mlp=True, scale_attn_inner=True, fused_qkv=False,
        ref_feat_hw=(16, 16)),
    "eva02_large_patch14_clip_224": EvaArch(
        14, 1024, 24, 16, int(1024 * 8 / 3), swiglu=True, rope=True,
        scale_mlp=True, scale_attn_inner=True, fused_qkv=False,
        ref_feat_hw=(16, 16)),
    "eva02_large_patch14_clip_336": EvaArch(
        14, 1024, 24, 16, int(1024 * 8 / 3), swiglu=True, rope=True,
        scale_mlp=True, scale_attn_inner=True, fused_qkv=False,
        ref_feat_hw=(16, 16)),
    "eva02_enormous_patch14_clip_224": EvaArch(
        14, 1792, 64, 16, 15360, post_norm=True),
}


def timm_arch(name: str):
    try:
        return TIMM_ARCHS[name]
    except KeyError:
        raise NotImplementedError(
            f"timm tower '{name}' has no native rs_ov implementation "
            f"(known: {sorted(TIMM_ARCHS)})") from None


# ---------------------------------------------------------------------------
# ConvNeXt
# ---------------------------------------------------------------------------

def _conv_nhwc(x, w, b=None, stride=1, groups=1):
    """x [B,H,W,Cin], w [kh,kw,Cin/groups,Cout] (HWIO). fp32 accumulation."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def _convnext_block(x, p, eps):
    """dwconv7x7 -> LN -> fc1 -> GELU -> fc2 -> gamma -> residual. NHWC."""
    c = x.shape[-1]
    y = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    y = _conv_nhwc(y, p["conv_dw_w"], p["conv_dw_b"], groups=c)
    y = layer_norm(y, p["norm"], eps)
    y = linear(y, p["fc1_w"], p["fc1_b"])
    y = gelu(y)
    y = linear(y, p["fc2_w"], p["fc2_b"])
    y = y * p["gamma"].astype(y.dtype)
    return x + y


def convnext_forward(p: dict, images: jnp.ndarray, eps: float = 1e-6):
    """images [B,3,H,W] -> pooled features [B, dims[-1]].

    timm trunk semantics with the classifier removed (reference
    timm_model.py:86-90): stem -> 4 stages -> global avg pool -> head norm.
    """
    x = images.transpose(0, 2, 3, 1)  # NHWC
    x = _conv_nhwc(x, p["stem_conv_w"], p["stem_conv_b"], stride=4)
    x = layer_norm(x, p["stem_norm"], eps)
    for stage in p["stages"]:
        if "downsample" in stage:
            x = layer_norm(x, stage["downsample"]["norm"], eps)
            x = _conv_nhwc(x, stage["downsample"]["conv_w"],
                           stage["downsample"]["conv_b"], stride=2)
        for blk in stage["blocks"]:
            x = _convnext_block(x, blk, eps)
    pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)
    return layer_norm(pooled, p["head_norm"], eps)


def init_convnext_params(key, arch: ConvNeXtArch, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 4 + sum(arch.depths) * 4))

    def nrm(shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale
                ).astype(dtype)

    def ln(c):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    dims = arch.dims
    params = {
        "stem_conv_w": nrm((4, 4, 3, dims[0])),
        "stem_conv_b": jnp.zeros((dims[0],), dtype),
        "stem_norm": ln(dims[0]),
        "head_norm": ln(dims[-1]),
        "stages": [],
    }
    for i, (depth, dim) in enumerate(zip(arch.depths, dims)):
        stage = {"blocks": []}
        if i > 0:
            stage["downsample"] = {
                "norm": ln(dims[i - 1]),
                "conv_w": nrm((2, 2, dims[i - 1], dim)),
                "conv_b": jnp.zeros((dim,), dtype),
            }
        for _ in range(depth):
            stage["blocks"].append({
                "conv_dw_w": nrm((7, 7, 1, dim)),
                "conv_dw_b": jnp.zeros((dim,), dtype),
                "norm": ln(dim),
                "fc1_w": nrm((4 * dim, dim)),
                "fc1_b": jnp.zeros((4 * dim,), dtype),
                "fc2_w": nrm((dim, 4 * dim)),
                "fc2_b": jnp.zeros((dim,), dtype),
                "gamma": jnp.full((dim,), 1e-6, dtype),
            })
        params["stages"].append(stage)
    return params


# ---------------------------------------------------------------------------
# SigLIP ViT (CLS-less + MAP attention-pool head)
# ---------------------------------------------------------------------------

def _interp_pos_embed(pos: jnp.ndarray, n_tokens: int, grid_hw) -> jnp.ndarray:
    """Bicubic-resample a [N0, C] grid pos-embed table to a new grid when the
    input resolution differs from the table's (timm resample_abs_pos_embed
    semantics; force_image_size / odd-resolution checkpoints)."""
    n0 = pos.shape[0]
    if n0 == n_tokens:
        return pos
    g0 = int(round(n0 ** 0.5))
    grid = pos.reshape(g0, g0, -1).astype(jnp.float32)
    grid = jax.image.resize(grid, (grid_hw[0], grid_hw[1], pos.shape[-1]),
                            method="bicubic")
    return grid.reshape(n_tokens, -1).astype(pos.dtype)


def _siglip_block(blk, x, heads, eps):
    y, _ = standard_attention(blk["attn"], layer_norm(x, blk["ln_1"], eps), heads)
    x = x + y
    return x + mlp(layer_norm(x, blk["ln_2"], eps), blk["mlp"], act=gelu_tanh)


def _map_pool(p, x, heads, eps):
    """timm AttentionPoolLatent / HF SiglipMultiheadAttentionPoolingHead:
    learned probe attends over the tokens, then a residual MLP; token 0 out."""
    b = x.shape[0]
    q = linear(jnp.broadcast_to(p["latent"][None], (b,) + p["latent"].shape),
               p["q_w"], p["q_b"])
    kv = linear(x, p["kv_w"], p["kv_b"])
    k, v = jnp.split(kv, 2, axis=-1)
    hd = q.shape[-1] // heads

    def split(t):
        return t.reshape(b, t.shape[1], heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    attn = jax.nn.softmax(
        jnp.einsum("bhqd,bhkd->bhqk", qh * hd ** -0.5, kh,
                   preferred_element_type=jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(vh.dtype), vh,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, -1, heads * hd)
    out = linear(out, p["proj_w"], p["proj_b"])
    out = out + mlp(layer_norm(out, p["norm"], eps), p["mlp"], act=gelu_tanh)
    return out[:, 0]


def siglip_vit_forward(p: dict, images: jnp.ndarray, arch: SigLipVitArch,
                       eps: float = 1e-6):
    """images [B,3,H,W] -> MAP-pooled features [B, width]."""
    b, _, h, w = images.shape
    ph = arch.patch
    # patchify conv as extract+matmul (see nn/vit.py:_patchify)
    x = images.reshape(b, 3, h // ph, ph, w // ph, ph)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, (h // ph) * (w // ph), -1)
    kernel = p["patch_embed_w"].reshape(arch.width, -1).T.astype(x.dtype)
    x = (jnp.einsum("bnf,fw->bnw", x, kernel,
                    preferred_element_type=jnp.float32)
         + p["patch_embed_b"].astype(jnp.float32)).astype(images.dtype)
    x = x + _interp_pos_embed(p["pos_embed"], x.shape[1],
                              (h // ph, w // ph)).astype(x.dtype)
    for blk in p["blocks"]:
        x = _siglip_block(blk, x, arch.heads, eps)
    x = layer_norm(x, p["norm"], eps)
    return _map_pool(p["attn_pool"], x, arch.heads, eps)


def init_siglip_vit_params(key, arch: SigLipVitArch, image_size: int,
                           dtype=jnp.float32) -> dict:
    n = (image_size // arch.patch) ** 2
    w = arch.width
    keys = iter(jax.random.split(key, 16 + arch.depth * 8))

    def nrm(shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale
                ).astype(dtype)

    def ln(c=w):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    def block():
        return {
            "ln_1": ln(), "ln_2": ln(),
            "attn": {"in_proj_w": nrm((3 * w, w)),
                     "in_proj_b": jnp.zeros((3 * w,), dtype),
                     "out_proj_w": nrm((w, w)),
                     "out_proj_b": jnp.zeros((w,), dtype)},
            "mlp": {"c_fc_w": nrm((4 * w, w)), "c_fc_b": jnp.zeros((4 * w,), dtype),
                    "c_proj_w": nrm((w, 4 * w)), "c_proj_b": jnp.zeros((w,), dtype)},
        }

    return {
        "patch_embed_w": nrm((w, 3, arch.patch, arch.patch)),
        "patch_embed_b": jnp.zeros((w,), dtype),
        "pos_embed": nrm((n, w)),
        "blocks": [block() for _ in range(arch.depth)],
        "norm": ln(),
        "attn_pool": {
            "latent": nrm((1, w)),
            "q_w": nrm((w, w)), "q_b": jnp.zeros((w,), dtype),
            "kv_w": nrm((2 * w, w)), "kv_b": jnp.zeros((2 * w,), dtype),
            "proj_w": nrm((w, w)), "proj_b": jnp.zeros((w,), dtype),
            "norm": ln(),
            "mlp": {"c_fc_w": nrm((4 * w, w)), "c_fc_b": jnp.zeros((4 * w,), dtype),
                    "c_proj_w": nrm((w, 4 * w)), "c_proj_b": jnp.zeros((w,), dtype)},
        },
    }


# ---------------------------------------------------------------------------
# EVA / EVA02
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _rope_tables(head_dim: int, grid_h: int, grid_w: int,
                 ref_hw: tuple[int, int] | None) -> tuple[np.ndarray, np.ndarray]:
    """2-D axial rotary tables [N, head_dim] (sin, cos), theta=10000.

    Per-axis frequency bands cover head_dim//4 pairs; y-angles then x-angles
    are concatenated and each angle drives one (even, odd) lane pair —
    timm's RotaryEmbeddingCat layout with in_pixels=False, rescaled to
    ref_feat_shape when the arch pins one (EVA02 clip uses (16, 16))."""
    nb = head_dim // 4
    inv = 1.0 / (10000.0 ** (np.arange(nb, dtype=np.float64) / nb))
    ty = np.arange(grid_h, dtype=np.float64)
    tx = np.arange(grid_w, dtype=np.float64)
    if ref_hw is not None:
        ty = ty / max(grid_h, 1) * ref_hw[0]
        tx = tx / max(grid_w, 1) * ref_hw[1]
    ay = np.outer(ty, inv)  # [H, nb]
    ax = np.outer(tx, inv)  # [W, nb]
    ang = np.concatenate([
        np.broadcast_to(ay[:, None, :], (grid_h, grid_w, nb)),
        np.broadcast_to(ax[None, :, :], (grid_h, grid_w, nb)),
    ], axis=-1).reshape(grid_h * grid_w, 2 * nb)
    ang = np.repeat(ang, 2, axis=-1)  # pair duplication -> [N, head_dim]
    return np.sin(ang).astype(np.float32), np.cos(ang).astype(np.float32)


def _apply_rope(x, sin, cos):
    """x [B,H,N,hd]; rotate (even, odd) lane pairs."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    rot = jnp.stack([-x2, x1], axis=-1).reshape(x.shape)
    return x * cos.astype(x.dtype) + rot * sin.astype(x.dtype)


def _eva_attention(p, x, arch: EvaArch, grid_hw, eps):
    b, n, w = x.shape
    heads, hd = arch.heads, w // arch.heads

    def split(t):
        return t.reshape(b, n, heads, hd).transpose(0, 2, 1, 3)

    if arch.fused_qkv:
        qkv = linear(x, p["in_proj_w"], p["in_proj_b"])
        q, k, v = (split(t) for t in jnp.split(qkv, 3, axis=-1))
    else:
        q = split(linear(x, p["q_w"], p["q_b"]))
        k = split(linear(x, p["k_w"], None))  # timm eva: k_proj has no bias
        v = split(linear(x, p["v_w"], p["v_b"]))
    if arch.rope:
        sin, cos = _rope_tables(hd, grid_hw[0], grid_hw[1], arch.ref_feat_hw)
        sin = jnp.asarray(sin)[None, None]
        cos = jnp.asarray(cos)[None, None]
        # CLS (token 0) is excluded from rotary position (timm eva.py)
        q = jnp.concatenate([q[:, :, :1], _apply_rope(q[:, :, 1:], sin, cos)], 2)
        k = jnp.concatenate([k[:, :, :1], _apply_rope(k[:, :, 1:], sin, cos)], 2)
    attn = jax.nn.softmax(
        jnp.einsum("bhqd,bhkd->bhqk", q * hd ** -0.5, k,
                   preferred_element_type=jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, n, w)
    if arch.scale_attn_inner:
        out = layer_norm(out, p["inner_norm"], eps)
    return linear(out, p["out_proj_w"], p["out_proj_b"])


def _eva_mlp(p, x, arch: EvaArch, eps):
    if arch.swiglu:
        h = jax.nn.silu(linear(x, p["fc1g_w"], p["fc1g_b"])) \
            * linear(x, p["fc1x_w"], p["fc1x_b"])
    else:
        h = gelu(linear(x, p["fc1_w"], p["fc1_b"]))
    if arch.scale_mlp:
        h = layer_norm(h, p["mlp_norm"], eps)
    return linear(h, p["fc2_w"], p["fc2_b"])


def eva_forward(p: dict, images: jnp.ndarray, arch: EvaArch, embed_dim: int,
                eps: float = 1e-6):
    """images [B,3,H,W] -> projected CLS features [B, embed_dim].

    pool='token' + proj=None towers: the trunk's own classifier head is the
    CLIP projection (reference timm_model.py:62-73)."""
    b, _, h, w = images.shape
    ph = arch.patch
    grid_hw = (h // ph, w // ph)
    x = images.reshape(b, 3, grid_hw[0], ph, grid_hw[1], ph)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, grid_hw[0] * grid_hw[1], -1)
    kernel = p["patch_embed_w"].reshape(arch.width, -1).T.astype(x.dtype)
    x = (jnp.einsum("bnf,fw->bnw", x, kernel,
                    preferred_element_type=jnp.float32)
         + p["patch_embed_b"].astype(jnp.float32)).astype(images.dtype)
    cls = jnp.broadcast_to(p["cls_token"].astype(x.dtype)[None, None],
                           (b, 1, arch.width))
    x = jnp.concatenate([cls, x], axis=1)
    pos = p["pos_embed"]
    pos = jnp.concatenate(
        [pos[:1], _interp_pos_embed(pos[1:], x.shape[1] - 1, grid_hw)], axis=0)
    x = x + pos.astype(x.dtype)
    for blk in p["blocks"]:
        if arch.post_norm:
            x = x + layer_norm(_eva_attention(blk, x, arch, grid_hw, eps),
                               blk["ln_1"], eps)
            x = x + layer_norm(_eva_mlp(blk["mlp"], x, arch, eps),
                               blk["ln_2"], eps)
        else:
            x = x + _eva_attention(blk, layer_norm(x, blk["ln_1"], eps),
                                   arch, grid_hw, eps)
            x = x + _eva_mlp(blk["mlp"], layer_norm(x, blk["ln_2"], eps),
                             arch, eps)
    x = layer_norm(x, p["norm"], eps)
    return linear(x[:, 0], p["head_w"], p["head_b"])


def init_eva_params(key, arch: EvaArch, image_size: int, embed_dim: int,
                    dtype=jnp.float32) -> dict:
    n = (image_size // arch.patch) ** 2
    w = arch.width
    keys = iter(jax.random.split(key, 16 + arch.depth * 12))

    def nrm(shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32) * scale
                ).astype(dtype)

    def ln(c=w):
        return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}

    def block():
        blk = {"ln_1": ln(), "ln_2": ln()}
        if arch.fused_qkv:
            blk.update({"in_proj_w": nrm((3 * w, w)),
                        "in_proj_b": jnp.zeros((3 * w,), dtype)})
        else:
            blk.update({"q_w": nrm((w, w)), "q_b": jnp.zeros((w,), dtype),
                        "k_w": nrm((w, w)),
                        "v_w": nrm((w, w)), "v_b": jnp.zeros((w,), dtype)})
        if arch.scale_attn_inner:
            blk["inner_norm"] = ln()
        blk.update({"out_proj_w": nrm((w, w)),
                    "out_proj_b": jnp.zeros((w,), dtype)})
        m = {"fc2_w": nrm((w, arch.mlp_hidden)), "fc2_b": jnp.zeros((w,), dtype)}
        if arch.swiglu:
            m.update({"fc1g_w": nrm((arch.mlp_hidden, w)),
                      "fc1g_b": jnp.zeros((arch.mlp_hidden,), dtype),
                      "fc1x_w": nrm((arch.mlp_hidden, w)),
                      "fc1x_b": jnp.zeros((arch.mlp_hidden,), dtype)})
        else:
            m.update({"fc1_w": nrm((arch.mlp_hidden, w)),
                      "fc1_b": jnp.zeros((arch.mlp_hidden,), dtype)})
        if arch.scale_mlp:
            m["mlp_norm"] = ln(arch.mlp_hidden)
        blk["mlp"] = m
        return blk

    return {
        "patch_embed_w": nrm((w, 3, arch.patch, arch.patch)),
        "patch_embed_b": jnp.zeros((w,), dtype),
        "cls_token": jnp.zeros((w,), dtype),
        "pos_embed": nrm((n + 1, w)),
        "blocks": [block() for _ in range(arch.depth)],
        "norm": ln(),
        "head_w": nrm((embed_dim, w)),
        "head_b": jnp.zeros((embed_dim,), dtype),
    }


# ---------------------------------------------------------------------------
# Adapter head + unified entry points (reference timm_model.py:92-109, :150)
# ---------------------------------------------------------------------------

def _apply_head(feats, head: dict | None):
    if head is None:
        return feats
    if "mlp" in head:  # proj='mlp': Mlp(prev, 2*embed, embed)
        return mlp(feats, head["mlp"], act=gelu)
    return linear(feats, head["proj_w"], head.get("proj_b"))


def init_timm_tower_params(key, vcfg, embed_dim: int, dtype=jnp.float32) -> dict:
    """vcfg: core.config.VisionConfig with timm_model_name set."""
    arch = timm_arch(vcfg.timm_model_name)
    k_trunk, k_head = jax.random.split(key)

    def nrm(k, shape, scale=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    if arch.family == "convnext":
        trunk = init_convnext_params(k_trunk, arch, dtype)
        prev = arch.dims[-1]
    elif arch.family == "siglip_vit":
        trunk = init_siglip_vit_params(k_trunk, arch, vcfg.image_size, dtype)
        prev = arch.width
    else:
        trunk = init_eva_params(k_trunk, arch, vcfg.image_size, embed_dim, dtype)
        prev = embed_dim
    params = {"trunk": trunk}
    proj = vcfg.timm_proj
    if proj == "linear":
        params["head"] = {"proj_w": nrm(k_head, (embed_dim, prev))}
        # reference timm_model.py:105 proj_bias defaults to False
    elif proj == "mlp":
        k1, k2 = jax.random.split(k_head)
        params["head"] = {"mlp": {
            "c_fc_w": nrm(k1, (2 * embed_dim, prev)),
            "c_fc_b": jnp.zeros((2 * embed_dim,), dtype),
            "c_proj_w": nrm(k2, (embed_dim, 2 * embed_dim)),
            "c_proj_b": jnp.zeros((embed_dim,), dtype),
        }}
    return params


def timm_tower_forward(params: dict, images: jnp.ndarray, vcfg,
                       embed_dim: int) -> jnp.ndarray:
    """[B,3,H,W] -> [B, embed_dim]: trunk + (pool, proj) head dispatch."""
    arch = timm_arch(vcfg.timm_model_name)
    if arch.family == "convnext":
        feats = convnext_forward(params["trunk"], images)
    elif arch.family == "siglip_vit":
        feats = siglip_vit_forward(params["trunk"], images, arch)
    else:
        feats = eva_forward(params["trunk"], images, arch, embed_dim)
    return _apply_head(feats, params.get("head"))
