"""Alternate feature upsamplers from the SimFeatUp registry.

  * LayeredResizeConv (reference upsamplers.py:178-199): four 2x stages of
    bilinear-resize + conv over [features ; resized guidance] with a residual.
  * IFA (reference upsamplers.py:55-82): implicit-feature upsampling — 2x
    nearest upsample + sin/cos positional encodings of the coordinate offset
    through a 1x1-conv MLP with BatchNorm+LeakyReLU.

carafe / sapa wrap external CUDA packages with their own trained weights;
they are intentionally not ported (registry raises with that rationale).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rs_ov.utils.resize import resize_bilinear

__all__ = ["resize_conv_forward", "init_resize_conv_params",
           "ifa_forward", "init_ifa_params"]


def _conv2d_same(x, w, b):
    k = w.shape[-1]
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w.astype(jnp.float32), (1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return (y + b.astype(jnp.float32)[None, :, None, None]).astype(x.dtype)


# ---------------------------------------------------------------------------
# LayeredResizeConv
# ---------------------------------------------------------------------------

def resize_conv_forward(p: dict, source: jnp.ndarray,
                        guidance: jnp.ndarray) -> jnp.ndarray:
    x = source
    for i, stage in enumerate(p["convs"]):
        _, _, h, w = x.shape
        big = resize_bilinear(x, (h * 2, w * 2))
        small_guidance = resize_bilinear(guidance, (h * 2, w * 2))
        out = _conv2d_same(jnp.concatenate([big, small_guidance], axis=1),
                           stage["w"], stage["b"])
        if i < 3:
            out = jax.nn.relu(out)
        x = big + out
    return x


def init_resize_conv_params(key, dim: int, kernel: int = 1, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 4)
    s = (dim + 3) ** -0.5
    return {"convs": [
        {"w": (jax.random.normal(k, (dim, dim + 3, kernel, kernel)) * s).astype(dtype),
         "b": jnp.zeros((dim,), dtype)}
        for k in keys
    ]}


# ---------------------------------------------------------------------------
# IFA
# ---------------------------------------------------------------------------

def _implicit_feats(coord_diff: jnp.ndarray, n_freqs: int = 20) -> jnp.ndarray:
    """SimpleImplicitFeaturizer (reference upsamplers.py:28-52): the sin/cos
    encodings are of the featurizer's OWN [-1,1] meshgrid (the input only
    contributes its shape and is concatenated raw at the end)."""
    b, c, h, w = coord_diff.shape
    # the sin/cos arguments are STATIC (grid x freqs, freqs up to e^10):
    # evaluate them once in float64 numpy — at such phases fp32 sin is
    # ULP-chaotic, so this is strictly more accurate than the reference
    gy = np.linspace(-1.0, 1.0, h)
    gx = np.linspace(-1.0, 1.0, w)
    yy, xx = np.meshgrid(gy, gx, indexing="ij")
    grid = np.stack([yy, xx])[None]  # [1, 2, H, W]
    freqs = np.exp(np.linspace(-2.0, 10.0, n_freqs)).reshape(1, n_freqs, 1, 1, 1)
    feats = (grid[:, None] * freqs).reshape(1, n_freqs * 2, h, w)
    enc = np.concatenate([np.sin(feats), np.cos(feats)], axis=1).astype(np.float32)
    enc = jnp.broadcast_to(jnp.asarray(enc, coord_diff.dtype),
                           (b, 4 * n_freqs, h, w))
    return jnp.concatenate([enc, coord_diff], axis=1)


def _bn2d(x, p, eps=1e-5):
    scale = (p["scale"] / jnp.sqrt(p["var"] + eps)).astype(jnp.float32)
    bias = (p["bias"] - p["mean"] * scale).astype(jnp.float32)
    return (x.astype(jnp.float32) * scale[None, :, None, None]
            + bias[None, :, None, None]).astype(x.dtype)


def ifa_forward(p: dict, source: jnp.ndarray, guidance: jnp.ndarray,
                n_freqs: int = 20) -> jnp.ndarray:
    """One 2x IFA step (reference upsamplers.py:69-82). NOTE the reference's
    IFA.forward only ever doubles the resolution — it is not stacked."""
    del guidance
    b, c, h, w = source.shape
    up = jnp.repeat(jnp.repeat(source, 2, axis=2), 2, axis=3)  # nearest 2x

    lr = jnp.linspace(0.0, float(h), h)
    hr = jnp.linspace(0.0, float(h), 2 * h)
    lr_yy, lr_xx = jnp.meshgrid(lr, lr, indexing="ij")
    hr_yy, hr_xx = jnp.meshgrid(hr, hr, indexing="ij")
    lr_coords = jnp.stack([lr_yy, lr_xx])[None]  # [1, 2, h, w]
    hr_coords = jnp.stack([hr_yy, hr_xx])[None]
    up_lr = jnp.repeat(jnp.repeat(lr_coords, 2, axis=2), 2, axis=3)
    diff = (up_lr - hr_coords).astype(source.dtype)
    feats = jnp.broadcast_to(_implicit_feats(diff, n_freqs),
                             (b, 4 * n_freqs + 2, 2 * h, 2 * w))

    x = jnp.concatenate([up, feats.astype(up.dtype)], axis=1)
    x = _conv2d_same(x, p["w0"], p["b0"])
    x = _bn2d(x, p["bn"])
    x = jnp.where(x >= 0, x, 0.01 * x)  # LeakyReLU default slope
    return _conv2d_same(x, p["w1"], p["b1"])


def init_ifa_params(key, dim: int, n_freqs: int = 20, dtype=jnp.float32) -> dict:
    k0, k1 = jax.random.split(key)
    cin = dim + 4 * n_freqs + 2
    return {
        "w0": (jax.random.normal(k0, (dim, cin, 1, 1)) * cin ** -0.5).astype(dtype),
        "b0": jnp.zeros((dim,), dtype),
        "bn": {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype),
               "mean": jnp.zeros((dim,), dtype), "var": jnp.ones((dim,), dtype)},
        "w1": (jax.random.normal(k1, (dim, dim, 1, 1)) * dim ** -0.5).astype(dtype),
        "b1": jnp.zeros((dim,), dtype),
    }
