"""Primitive layers, functional style.

Precision policy (mirrors the reference's fp16-with-fp32-LayerNorm-islands,
reference open_clip/transformer.py:17-23 `LayerNormFp32`): LayerNorm always
computes in float32 and casts back; matmuls request float32 accumulation via
``preferred_element_type`` so bf16 weights keep fp32 accuracy on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["layer_norm", "linear", "gelu", "quick_gelu", "mlp"]


def layer_norm(x: jnp.ndarray, p: dict, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis, computed in fp32 (LayerNormFp32 semantics)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def linear(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None = None) -> jnp.ndarray:
    """y = x @ w.T + b with torch-style (out, in) weights, fp32 accumulation."""
    y = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(x.dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — matches torch nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(1.702 x) — OpenAI CLIP activation (reference transformer.py:35-38)."""
    return x * jax.nn.sigmoid(1.702 * x)


def mlp(x: jnp.ndarray, p: dict, act=gelu) -> jnp.ndarray:
    """Transformer MLP: c_fc -> act -> c_proj."""
    h = linear(x, p["c_fc_w"], p["c_fc_b"])
    h = act(h)
    return linear(h, p["c_proj_w"], p["c_proj_b"])
