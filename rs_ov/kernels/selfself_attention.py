"""Pallas TPU kernel: fused self-self attention (the decontamination core).

One program per (batch x head) computes the whole mode pipeline in VMEM —
score matmuls on the MXU, fp32 softmaxes on the VPU, value aggregation —
without materialising [B, H, L, L] score tensors in HBM. At the pipeline's
L = 197 (224^2 tile, patch 16) everything fits VMEM with room to spare.

Modes mirror rs_ov.nn.attention.custom_attn (reference open_clip/
transformer.py:858-908): ClearCLIP (qq), SCLIP (qq+kk), SegEarth (qq+kk+vv),
SFP (softmax of the mean), Experimental (double softmax), vanilla (qk); the
optional mid-layer similarity map is added exactly where the reference adds
it (pre-softmax, or post-first-softmax for Experimental).

Returns the pre-out-projection context [B, H, L, hd]; the caller applies the
output projection (a plain matmul XLA fuses with downstream work).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_selfself_attention", "SUPPORTED_MODES"]

SUPPORTED_MODES = ("vanilla", "ClearCLIP", "SCLIP", "SegEarth", "SFP", "Experimental")


def _softmax(x):
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _kernel(q_ref, k_ref, v_ref, sim_ref, out_ref, *, mode: str, scale: float,
            sim_weight: float, has_sim: bool):
    q = q_ref[0].astype(jnp.float32)  # [L, hd]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    sim = sim_ref[0].astype(jnp.float32) * sim_weight if has_sim else None

    def score(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    def enhance(logits):
        return logits if sim is None else logits + sim

    if mode == "vanilla":
        attn = _softmax(enhance(score(q, k)))
    elif mode == "ClearCLIP":
        attn = _softmax(enhance(score(q, q)))
    elif mode == "SCLIP":
        attn = _softmax(enhance(score(q, q))) + _softmax(enhance(score(k, k)))
    elif mode == "SegEarth":
        attn = (_softmax(enhance(score(q, q))) + _softmax(enhance(score(k, k)))
                + _softmax(enhance(score(v, v))))
    elif mode == "SFP":
        attn = _softmax(enhance(0.5 * (score(q, q) + score(k, k))))
    elif mode == "Experimental":
        attn = _softmax(score(k, k) + score(q, q))
        attn = _softmax(enhance(attn))
    else:
        raise ValueError(mode)

    out = jax.lax.dot_general(
        attn, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("mode", "sim_weight", "interpret"))
def fused_selfself_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                             sim_map: jnp.ndarray | None = None, *,
                             mode: str = "Experimental",
                             sim_weight: float = 1.0,
                             interpret: bool = False) -> jnp.ndarray:
    """q, k, v: [B, H, L, hd]; sim_map: optional fp32 [B, L, L] (CLS-padded).

    Returns attn @ v as [B, H, L, hd] (fp32 accumulated, cast to q.dtype).
    """
    b, h, l, hd = q.shape
    scale = hd ** -0.5
    bh = b * h
    qf = q.reshape(bh, l, hd)
    kf = k.reshape(bh, l, hd)
    vf = v.reshape(bh, l, hd)

    has_sim = sim_map is not None
    if has_sim:
        sim_full = jnp.repeat(sim_map.astype(jnp.float32), h, axis=0)  # [BH, L, L]
    else:
        sim_full = jnp.zeros((bh, 1, 1), jnp.float32)

    kernel = functools.partial(_kernel, mode=mode, scale=scale,
                               sim_weight=sim_weight, has_sim=has_sim)
    sim_block = (1, l, l) if has_sim else (1, 1, 1)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, l, hd), q.dtype),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, l, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sim_block, lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf, kf, vf, sim_full)
    return out.reshape(b, h, l, hd)
