"""Alternate feature upsamplers from the SimFeatUp registry.

  * LayeredResizeConv (reference upsamplers.py:178-199): four 2x stages of
    bilinear-resize + conv over [features ; resized guidance] with a residual.
  * IFA (reference upsamplers.py:55-82): implicit-feature upsampling — 2x
    nearest upsample + sin/cos positional encodings of the coordinate offset
    through a 1x1-conv MLP with BatchNorm+LeakyReLU.

  * CARAFE (reference upsamplers.py:160-175 wraps mmcv.ops.CARAFEPack, a CUDA
    op): content-aware reassembly — a channel compressor + content encoder
    predict per-position k_up x k_up kernels, pixel-shuffled to the upsampled
    grid, softmax-normalised, then applied as a spatially-varying conv over
    the SOURCE grid. Implemented to the mmcv spec in pure XLA (the
    reassembly reuses the adaptive-conv shift-accumulate pattern).

  * SAPA (reference upsamplers.py:85-156 wraps the external `sapa` CUDA
    package's `sim`/`atn` ops): similarity-aware point affiliation — per
    upsampled pixel, attention logits are dot products between a query
    projected from the (pooled) guidance and key projections of the K x K
    low-res neighbourhood around its source cell; the softmaxed kernel
    reassembles the raw source values. Implemented in pure XLA with the
    same shift-accumulate pattern as CARAFE (out-of-bounds neighbours
    contribute zero logits / zero values — F.unfold zero-pad semantics).
    No public SAPA checkpoint ships with the reference, so this path is
    random-init/training only, like the reference's.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rs_ov.utils.resize import adaptive_avg_pool2d, resize_bilinear

__all__ = ["resize_conv_forward", "init_resize_conv_params",
           "ifa_forward", "init_ifa_params",
           "carafe_forward", "init_carafe_params",
           "sapa_forward", "init_sapa_params"]


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
# CARAFE (content-aware reassembly of features)
# ---------------------------------------------------------------------------

def carafe_reassemble(x: jnp.ndarray, masks: jnp.ndarray, scale: int,
                      up_kernel: int) -> jnp.ndarray:
    """The CARAFE op: out[b,c,i,j] = sum_{p,q} masks[b,(p,q),i,j] *
    x[b,c, i//scale + p - r, j//scale + q - r], r = up_kernel//2.

    x: [B, C, H, W]; masks: [B, k^2, H*scale, W*scale] (softmaxed).
    """
    b, c, h, w = x.shape
    r = up_kernel // 2
    xp = jnp.pad(x, ((0, 0), (0, 0), (r, r), (r, r)))
    # nearest-upsample each shifted source plane, multiply by its mask plane
    out = jnp.zeros((b, c, h * scale, w * scale), jnp.float32)
    for p in range(up_kernel):
        for q in range(up_kernel):
            shifted = xp[:, :, p:p + h, q:q + w]
            up = jnp.repeat(jnp.repeat(shifted, scale, axis=2), scale, axis=3)
            m = masks[:, p * up_kernel + q][:, None].astype(jnp.float32)
            out = out + m * up.astype(jnp.float32)
    return out.astype(x.dtype)


def carafe_forward(p: dict, source: jnp.ndarray, guidance: jnp.ndarray,
                   scale: int = 2, up_kernel: int = 3) -> jnp.ndarray:
    """4 stacked CARAFEPack 2x stages (reference upsamplers.py:160-175);
    guidance is unused, like the reference's CarafeUpsampler."""
    del guidance
    x = source
    for stage in p["stages"]:
        compressed = _conv2d_same(x, stage["comp_w"], stage["comp_b"])
        mask = _conv2d_same(compressed, stage["enc_w"], stage["enc_b"])
        b, mc, h, w = mask.shape
        k2 = up_kernel * up_kernel
        # pixel shuffle: [B, k2*s^2, H, W] -> [B, k2, H*s, W*s]
        mask = mask.reshape(b, k2, scale, scale, h, w)
        mask = mask.transpose(0, 1, 4, 2, 5, 3).reshape(b, k2, h * scale, w * scale)
        mask = jax.nn.softmax(mask.astype(jnp.float32), axis=1)
        x = carafe_reassemble(x, mask, scale, up_kernel)
    return x


def init_carafe_params(key, dim: int, compressed: int = 64, up_kernel: int = 3,
                       encoder_kernel: int = 3, scale: int = 2,
                       dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 8)
    k2s2 = up_kernel * up_kernel * scale * scale
    stages = []
    for i in range(4):
        kc, ke = keys[2 * i], keys[2 * i + 1]
        stages.append({
            "comp_w": (jax.random.normal(kc, (compressed, dim, 1, 1))
                       * dim ** -0.5).astype(dtype),
            "comp_b": jnp.zeros((compressed,), dtype),
            "enc_w": (jax.random.normal(
                ke, (k2s2, compressed, encoder_kernel, encoder_kernel))
                * (compressed * encoder_kernel ** 2) ** -0.5).astype(dtype),
            "enc_b": jnp.zeros((k2s2,), dtype),
        })
    return {"stages": stages}


# ---------------------------------------------------------------------------
# SAPA (similarity-aware point affiliation)
# ---------------------------------------------------------------------------

def _sapa_window_apply(hr_weights, lr_values, up_kernel: int, scale: int):
    """out[b,i,j,:] = sum_t hr_weights[b,i,j,t] * lr_values[b, i//s+u-r,
    j//s+v-r, :] for t=(u,v); out-of-bounds lr neighbours are zero."""
    b, hl, wl, c = lr_values.shape
    r = up_kernel // 2
    vp = jnp.pad(lr_values, ((0, 0), (r, r), (r, r), (0, 0)))
    out = jnp.zeros(hr_weights.shape[:3] + (c,), jnp.float32)
    for u in range(up_kernel):
        for v in range(up_kernel):
            sh = vp[:, u:u + hl, v:v + wl]
            up = jnp.repeat(jnp.repeat(sh, scale, axis=1), scale, axis=2)
            out = out + (hr_weights[..., u * up_kernel + v, None]
                         .astype(jnp.float32) * up.astype(jnp.float32))
    return out


def sapa_sim(q: jnp.ndarray, k: jnp.ndarray, up_kernel: int,
             scale: int) -> jnp.ndarray:
    """The `sapa.sim` op: q [B, H*s, W*s, E] x k [B, H, W, E] ->
    [B, H*s, W*s, K^2] window dot-product logits."""
    b, hl, wl, e = k.shape
    r = up_kernel // 2
    kp = jnp.pad(k, ((0, 0), (r, r), (r, r), (0, 0)))
    logits = []
    for u in range(up_kernel):
        for v in range(up_kernel):
            sh = kp[:, u:u + hl, v:v + wl]
            up = jnp.repeat(jnp.repeat(sh, scale, axis=1), scale, axis=2)
            logits.append(jnp.sum(q.astype(jnp.float32) * up.astype(jnp.float32),
                                  axis=-1))
    return jnp.stack(logits, axis=-1)


def sapa_atn(attn: jnp.ndarray, v: jnp.ndarray, up_kernel: int,
             scale: int) -> jnp.ndarray:
    """The `sapa.atn` op: attn [B, H*s, W*s, K^2] x v [B, H, W, C] ->
    [B, H*s, W*s, C] reassembled values."""
    return _sapa_window_apply(attn, v, up_kernel, scale)


def _layernorm_last(x: jnp.ndarray, p: dict, eps: float = 1e-5) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    m = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - m), axis=-1, keepdims=True)
    y = (x32 - m) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def sapa_forward(p: dict, source: jnp.ndarray, guidance: jnp.ndarray,
                 up_kernel: int = 5, scale: int = 2) -> jnp.ndarray:
    """4 stacked 2x SAPA stages (reference SAPAUpsampler, upsamplers.py:
    137-156; per-stage math = SAPAModule.forward :103-118): queries from
    the LayerNormed adaptive-pooled guidance, keys from the LayerNormed
    source, values = the raw (un-normalised) source."""
    x = source
    for stage in p["stages"]:
        _, _, h, w = x.shape
        y = adaptive_avg_pool2d(guidance, (h * 2, w * 2))
        y_n = _layernorm_last(y.transpose(0, 2, 3, 1), stage["norm_y"])
        x_nhwc = x.transpose(0, 2, 3, 1)
        x_n = _layernorm_last(x_nhwc, stage["norm_x"])
        q = (y_n.astype(jnp.float32) @ stage["q_w"].astype(jnp.float32).T
             + stage["q_b"].astype(jnp.float32))
        k = (x_n.astype(jnp.float32) @ stage["k_w"].astype(jnp.float32).T
             + stage["k_b"].astype(jnp.float32))
        attn = jax.nn.softmax(sapa_sim(q, k, up_kernel, scale), axis=-1)
        out = sapa_atn(attn, x_nhwc, up_kernel, scale)
        x = out.transpose(0, 3, 1, 2).astype(source.dtype)
    return x


def init_sapa_params(key, dim: int, guidance_dim: int = 3,
                     embedding_dim: int = 64, dtype=jnp.float32) -> dict:
    """trunc_normal(std=.02) linears, zero bias, unit LayerNorm — the
    reference SAPAModule._init_weights (upsamplers.py:120-135)."""
    stages = []
    for i in range(4):
        kq, kk = jax.random.split(jax.random.fold_in(key, i))
        stages.append({
            "norm_y": {"scale": jnp.ones((guidance_dim,), dtype),
                       "bias": jnp.zeros((guidance_dim,), dtype)},
            "norm_x": {"scale": jnp.ones((dim,), dtype),
                       "bias": jnp.zeros((dim,), dtype)},
            "q_w": (jnp.clip(jax.random.truncated_normal(
                kq, -2.0, 2.0, (embedding_dim, guidance_dim)), -2, 2)
                * 0.02).astype(dtype),
            "q_b": jnp.zeros((embedding_dim,), dtype),
            "k_w": (jnp.clip(jax.random.truncated_normal(
                kk, -2.0, 2.0, (embedding_dim, dim)), -2, 2) * 0.02).astype(dtype),
            "k_b": jnp.zeros((embedding_dim,), dtype),
        })
    return {"stages": stages}


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
