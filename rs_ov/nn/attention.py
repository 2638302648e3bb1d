"""Attention: standard multi-head + the self-self "decontamination" mode registry.

This re-implements, TPU-first, the behaviour of the reference's modified
attention stack:
  * standard block attention with optional head-averaged weight output
    (torch nn.MultiheadAttention need_weights=True semantics,
    reference open_clip/transformer.py:218-254)
  * ``custom_attn`` — the attention-mode registry applied in the last block(s)
    (reference open_clip/transformer.py:822-940): vanilla | MaskCLIP | SCLIP |
    SegEarth | SFP | Experimental | ClearCLIP | NACLIP | NOnly | GAV,
    each optionally enhanced by a cached mid-layer similarity map
    (reference similarity_enhancement.py:78-124 — raw cosine added with NO
    softmax on the map).

All softmaxes run in float32; batched matmuls request fp32 accumulation so the
MXU path is bf16-in/fp32-accumulate. Everything is shaped [B, H, L, hd] — no
torch-style [L, B, D] flips.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from rs_ov.nn.layers import linear

__all__ = ["standard_attention", "custom_attn", "ATTENTION_MODES", "qkv_projection"]

ATTENTION_MODES = (
    "vanilla", "MaskCLIP", "SCLIP", "SegEarth", "SFP",
    "Experimental", "ClearCLIP", "NACLIP", "NOnly", "GAV",
)


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, l, d = x.shape
    return x.reshape(b, l, heads, d // heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, l, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * hd)


def qkv_projection(p: dict, x: jnp.ndarray, heads: int):
    """Project [B, L, D] -> three [B, H, L, hd] tensors using fused in_proj."""
    qkv = linear(x, p["in_proj_w"], p["in_proj_b"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return _split_heads(q, heads), _split_heads(k, heads), _split_heads(v, heads)


def _bmm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched matmul with fp32 accumulation, result fp32."""
    return jnp.einsum("...ij,...jk->...ik", a, b, preferred_element_type=jnp.float32)


def _softmax32(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softmax(x.astype(jnp.float32), axis=-1)


def standard_attention(p: dict, x: jnp.ndarray, heads: int,
                       mask: jnp.ndarray | None = None,
                       need_weights: bool = False):
    """Vanilla softmax(qk^T/sqrt(d)) v with out-projection.

    Returns (out, weights) where weights is the HEAD-AVERAGED post-softmax map
    [B, L, L] (matching torch's need_weights=True default) or None.
    """
    q, k, v = qkv_projection(p, x, heads)
    scale = (x.shape[-1] // heads) ** -0.5
    attn = _bmm(q * scale, k.transpose(0, 1, 3, 2))
    if mask is not None:
        attn = attn + mask.astype(attn.dtype)
    attn = _softmax32(attn)
    # operand dtype follows the params (the param_dtype precision knob):
    # bf16 weights -> bf16 operands with fp32 accumulation; the fp32
    # strict-parity mode keeps every operand fp32. A real-checkpoint
    # bf16-vs-fp32 mIoU A/B is part of tools/parity_check.py's scope.
    out = _bmm(attn.astype(v.dtype), v).astype(x.dtype)
    out = _merge_heads(out)
    out = linear(out, p["out_proj_w"], p["out_proj_b"])
    if need_weights:
        return out, jnp.mean(attn, axis=1)  # [B, L, L], fp32
    return out, None


# ---------------------------------------------------------------------------
# NACLIP-family Gaussian neighbourhood bias
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _gaussian_addition(grid_h: int, grid_w: int, std: float) -> np.ndarray:
    """(N, N) locality bias with a zero CLS row/col, N = grid_h*grid_w + 1.

    Equivalent to the reference's conv-constructed matrix
    (reference open_clip/transformer.py:797-820): entry for patches
    (i,j) -> (k,l) is the Gaussian window evaluated at the offset (i-k, j-l).
    """
    wh, ww = grid_h * 2 - 1, grid_w * 2 - 1
    constant = 1.0 / (std * math.sqrt(2.0))

    def axis_vals(dim):
        start = -(dim - 1) / 2.0
        return np.linspace(start * constant, (start + (dim - 1)) * constant, dim)

    ky = axis_vals(wh)
    kx = axis_vals(ww)
    win = np.exp(-(ky[:, None] ** 2 + kx[None, :] ** 2))

    rows = np.arange(grid_h * grid_w)
    ri, ci = rows // grid_w, rows % grid_w
    dy = ri[:, None] - ri[None, :] + (grid_h - 1)
    dx = ci[:, None] - ci[None, :] + (grid_w - 1)
    out = win[dy, dx]

    n = grid_h * grid_w + 1
    full = np.zeros((n, n), dtype=np.float32)
    full[1:, 1:] = out
    return full


def _pad_sim_map_for_cls(sim_map: jnp.ndarray) -> jnp.ndarray:
    """[B, P, P] patch similarity -> [B, P+1, P+1] with zero CLS row/col."""
    return jnp.pad(sim_map, ((0, 0), (1, 0), (1, 0)))


def _use_fused_kernel(mode: str) -> bool:
    """Opt-in Pallas routing (RS_OV_FUSED_ATTN=1). Measured on v5e: at the
    pipeline's tiny L=197 XLA's batched bmms beat the per-(batch, head)
    kernel grid 4.6x (32ms vs 148ms / 16 tiles) — the kernel exists for
    long-sequence regimes, so the default stays XLA."""
    import os

    if os.environ.get("RS_OV_FUSED_ATTN", "0") != "1":
        return False
    if jax.default_backend() == "cpu":
        return False
    from rs_ov.kernels.selfself_attention import SUPPORTED_MODES

    return mode in SUPPORTED_MODES


def custom_attn(p: dict, x: jnp.ndarray, *, mode: str, heads: int,
                sim_map: jnp.ndarray | None = None,
                similarity_weight: float = 1.0,
                gaussian_std: float = 1.0,
                grid_hw: tuple[int, int] | None = None) -> jnp.ndarray:
    """Self-self attention mode registry over [B, L, D] (CLS at index 0).

    ``sim_map``: optional [B, L-1, L-1] fp32 mid-layer cosine-similarity map;
    added (raw, un-softmaxed) to pre-softmax logits — or, for 'Experimental',
    to the post-softmax weights which are then softmaxed AGAIN (the reference's
    deliberate double-softmax, transformer.py:896-902).
    """
    b, l, d = x.shape
    head_dim = d // heads
    scale = head_dim ** -0.5
    q, k, v = qkv_projection(p, x, heads)

    if _use_fused_kernel(mode):
        from rs_ov.kernels.selfself_attention import fused_selfself_attention

        sim_padded = None
        if sim_map is not None:
            sim_padded = _pad_sim_map_for_cls(sim_map.astype(jnp.float32))
        ctx = fused_selfself_attention(q, k, v, sim_padded, mode=mode,
                                       sim_weight=float(similarity_weight))
        out = _merge_heads(ctx)
        return linear(out, p["out_proj_w"], p["out_proj_b"])

    # operands keep the compute dtype (bf16 on TPU — the docstring contract:
    # bf16-in/fp32-accumulate via _bmm's preferred_element_type; a full-fp32
    # MXU matmul is several times slower, and the reference runs these
    # products in fp16). On the fp32/CPU path these are no-op aliases.
    q32, k32, v32 = q, k, v

    sim = None
    if sim_map is not None:
        sim = (_pad_sim_map_for_cls(sim_map.astype(jnp.float32))[:, None, :, :]
               * similarity_weight)

    def enhance(logits):
        return logits if sim is None else logits + sim

    if mode == "vanilla":
        attn = _softmax32(enhance(_bmm(q32, k32.transpose(0, 1, 3, 2)) * scale))
    elif mode == "MaskCLIP":
        attn = jnp.broadcast_to(jnp.eye(l, dtype=jnp.float32)[None, None], (b, heads, l, l))
    elif mode == "SCLIP":
        qq = enhance(_bmm(q32, q32.transpose(0, 1, 3, 2)) * scale)
        kk = enhance(_bmm(k32, k32.transpose(0, 1, 3, 2)) * scale)
        attn = _softmax32(qq) + _softmax32(kk)
    elif mode == "SegEarth":
        qq = enhance(_bmm(q32, q32.transpose(0, 1, 3, 2)) * scale)
        kk = enhance(_bmm(k32, k32.transpose(0, 1, 3, 2)) * scale)
        vv = enhance(_bmm(v32, v32.transpose(0, 1, 3, 2)) * scale)
        attn = _softmax32(qq) + _softmax32(kk) + _softmax32(vv)
    elif mode == "SFP":
        qq = _bmm(q32, q32.transpose(0, 1, 3, 2)) * scale
        kk = _bmm(k32, k32.transpose(0, 1, 3, 2)) * scale
        attn = _softmax32(enhance(0.5 * (qq + kk)))
    elif mode == "Experimental":
        qq = _bmm(q32, q32.transpose(0, 1, 3, 2)) * scale
        kk = _bmm(k32, k32.transpose(0, 1, 3, 2)) * scale
        attn = _softmax32(kk + qq)
        # similarity is added to the POST-softmax weights, then softmaxed again
        attn = _softmax32(enhance(attn))
    elif mode == "ClearCLIP":
        attn = _softmax32(enhance(_bmm(q32, q32.transpose(0, 1, 3, 2)) * scale))
    elif mode in ("NACLIP", "NOnly", "GAV"):
        if grid_hw is None:
            g = int(math.sqrt(l - 1))
            grid_hw = (g, g)
        omega = jnp.asarray(_gaussian_addition(grid_hw[0], grid_hw[1], gaussian_std))
        omega = jnp.broadcast_to(omega[None, None], (b, heads, l, l))
        if mode == "NACLIP":
            logits = _bmm(k32, k32.transpose(0, 1, 3, 2)) * scale
        else:
            qn = jnp.linalg.norm(q32.astype(jnp.float32), axis=-1)  # [B, H, L]
            kn = jnp.linalg.norm(k32.astype(jnp.float32), axis=-1)
            norm_outer = qn[:, :, :, None] * kn[:, :, None, :]
            omega = omega * scale * norm_outer
            if mode == "NOnly":
                logits = jnp.zeros((b, heads, l, l), jnp.float32)
            else:  # GAV
                logits = _bmm(q32, k32.transpose(0, 1, 3, 2)) * scale
        attn = _softmax32(logits + omega)
    else:
        raise ValueError(f"Unknown attention mode '{mode}'. Known: {ATTENTION_MODES}")

    out = _bmm(attn.astype(v32.dtype), v32).astype(x.dtype)
    out = _merge_heads(out)
    return linear(out, p["out_proj_w"], p["out_proj_b"])
