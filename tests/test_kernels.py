"""Pallas kernels vs their XLA reference formulations (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rs_ov.kernels.adaptive_conv import adaptive_conv_pallas
from rs_ov.kernels.selfself_attention import SUPPORTED_MODES, fused_selfself_attention
from rs_ov.nn.attention import custom_attn
from rs_ov.upsample.jbu import adaptive_conv


def test_adaptive_conv_kernel_matches_xla():
    rng = np.random.RandomState(0)
    b, c, h, w, d = 2, 16, 16, 16, 5
    inp = rng.randn(b, c, h + d - 1, w + d - 1).astype(np.float32)
    filt = rng.rand(b, h, w, d, d).astype(np.float32)
    ref = np.asarray(adaptive_conv(jnp.asarray(inp), jnp.asarray(filt)))
    got = np.asarray(adaptive_conv_pallas(jnp.asarray(inp), jnp.asarray(filt),
                                          interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("mode", SUPPORTED_MODES)
@pytest.mark.parametrize("with_sim", [False, True])
def test_fused_attention_matches_custom_attn(mode, with_sim):
    rng = np.random.RandomState(1)
    b, heads, l, hd = 2, 2, 17, 8
    d = heads * hd
    x = rng.randn(b, l, d).astype(np.float32)
    p = {
        "in_proj_w": jnp.asarray(rng.randn(3 * d, d).astype(np.float32) * 0.1),
        "in_proj_b": jnp.asarray(rng.randn(3 * d).astype(np.float32) * 0.1),
        "out_proj_w": jnp.asarray(np.eye(d, dtype=np.float32)),
        "out_proj_b": jnp.asarray(np.zeros(d, np.float32)),
    }
    sim = rng.randn(b, l - 1, l - 1).astype(np.float32) * 0.5 if with_sim else None

    ref = custom_attn(p, jnp.asarray(x), mode=mode, heads=heads,
                      sim_map=None if sim is None else jnp.asarray(sim))

    from rs_ov.nn.attention import _pad_sim_map_for_cls, qkv_projection

    q, k, v = qkv_projection(p, jnp.asarray(x), heads)
    sim_padded = None
    if sim is not None:
        sim_padded = _pad_sim_map_for_cls(jnp.asarray(sim))
    ctx = fused_selfself_attention(q, k, v, sim_padded, mode=mode,
                                   interpret=True)
    got = ctx.transpose(0, 2, 1, 3).reshape(b, l, d)  # out_proj is identity
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_adaptive_conv_cl_matches_xla():
    """Experimental channels-last variant (interpret mode)."""
    from rs_ov.kernels.adaptive_conv import adaptive_conv_pallas_cl

    rng = np.random.RandomState(2)
    b, c, h, w, d = 1, 128, 12, 16, 5
    inp = rng.randn(b, c, h + d - 1, w + d - 1).astype(np.float32)
    filt = rng.rand(b, h, w, d, d).astype(np.float32)
    ref = np.asarray(adaptive_conv(jnp.asarray(inp), jnp.asarray(filt)))
    filt_t = jnp.asarray(filt.reshape(b, h, w, d * d).transpose(0, 3, 1, 2))
    got = np.asarray(adaptive_conv_pallas_cl(jnp.asarray(inp), filt_t, d,
                                             interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)

def test_adaptive_conv_v2_rowstream_matches_xla():
    """v2 tap-row streaming path (dynamic-rotate windows, grid accumulation)."""
    from rs_ov.kernels.adaptive_conv_v2 import adaptive_conv_pallas_v2

    rng = np.random.RandomState(3)
    b, c, h, w, d = 2, 16, 16, 16, 5
    inp = rng.randn(b, c, h + d - 1, w + d - 1).astype(np.float32)
    filt = rng.rand(b, h, w, d, d).astype(np.float32)
    ref = np.asarray(adaptive_conv(jnp.asarray(inp), jnp.asarray(filt)))
    filt_t = jnp.asarray(filt.reshape(b, h, w, d * d).transpose(0, 3, 1, 2))
    got = np.asarray(adaptive_conv_pallas_v2(jnp.asarray(inp), filt_t, d,
                                             interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_adaptive_conv_v3_banded_mxu_matches_xla():
    """v3 banded-matrix MXU path (strided-roll band construction, halo via
    dual input refs). bf16 matmul => bf16-level tolerance."""
    from rs_ov.kernels.adaptive_conv_v3 import adaptive_conv_pallas_v3

    rng = np.random.RandomState(5)
    b, c, h, w, d = 2, 16, 21, 19, 5  # non-multiple-of-16 H, rectangular
    inp = rng.randn(b, c, h + d - 1, w + d - 1).astype(np.float32)
    filt = rng.rand(b, h, w, d, d).astype(np.float32)
    ref = np.asarray(adaptive_conv(jnp.asarray(inp), jnp.asarray(filt)))
    filt_t = jnp.asarray(filt.reshape(b, h, w, d * d).transpose(0, 3, 1, 2))
    got = np.asarray(adaptive_conv_pallas_v3(jnp.asarray(inp), filt_t, d,
                                             interpret=True))
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got / scale, ref / scale, atol=8e-3)


def test_adaptive_conv_v4_wchunked_matches_xla():
    """v4 W-chunked banded MXU path (K=128 windows, dual-ref halo)."""
    from rs_ov.kernels.adaptive_conv_v4 import adaptive_conv_pallas_v4

    rng = np.random.RandomState(6)
    b, c, h, w, d = 2, 16, 21, 19, 5
    inp = rng.randn(b, c, h + d - 1, w + d - 1).astype(np.float32)
    filt = rng.rand(b, h, w, d, d).astype(np.float32)
    ref = np.asarray(adaptive_conv(jnp.asarray(inp), jnp.asarray(filt)))
    filt_t = jnp.asarray(filt.reshape(b, h, w, d * d).transpose(0, 3, 1, 2))
    got = np.asarray(adaptive_conv_pallas_v4(jnp.asarray(inp), filt_t, d,
                                             interpret=True))
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got / scale, ref / scale, atol=8e-3)


def test_adaptive_conv_v5_concat_k_matches_xla():
    """v5 concat-K banded MXU path (one matmul per output row, halo via dual
    input refs + flat VMEM K-buffer). bf16 matmul => bf16-level tolerance."""
    from rs_ov.kernels.adaptive_conv_v5 import adaptive_conv_pallas_v5

    rng = np.random.RandomState(7)
    b, c, h, w, d = 2, 16, 21, 19, 5  # non-multiple-of-16 H, rectangular
    inp = rng.randn(b, c, h + d - 1, w + d - 1).astype(np.float32)
    filt = rng.rand(b, h, w, d, d).astype(np.float32)
    ref = np.asarray(adaptive_conv(jnp.asarray(inp), jnp.asarray(filt)))
    filt_t = jnp.asarray(filt.reshape(b, h, w, d * d).transpose(0, 3, 1, 2))
    got = np.asarray(adaptive_conv_pallas_v5(jnp.asarray(inp), filt_t, d,
                                             interpret=True))
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got / scale, ref / scale, atol=8e-3)


def test_jbu_epilogue_fused_matches_xla_composition():
    """Fused combined-kernel epilogue (softmax + spatial + normalise + fixup
    convs + v5 adaptive conv in one kernel) vs the exact XLA op chain it
    replaces. Bit-exact in interpret mode up to the rational-erf GELU
    (|erf err| <= 1.5e-7)."""
    from rs_ov.kernels.jbu_epilogue import jbu_epilogue_pallas
    from rs_ov.upsample.jbu import _spatial_kernel

    rng = np.random.RandomState(11)
    b, c, h, w, d, g = 1, 8, 21, 19, 5, 3
    dd = d * d
    logits = jnp.asarray(rng.randn(b, dd, h, w).astype(np.float32))
    guidance = jnp.asarray(rng.randn(b, g, h, w), jnp.bfloat16)
    inp = jnp.asarray(rng.randn(b, c, h + d - 1, w + d - 1), jnp.bfloat16)
    w0 = jnp.asarray(rng.randn(dd, dd + g) * 0.2, jnp.bfloat16)
    b0 = jnp.asarray(rng.randn(dd) * 0.1, jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(dd, dd) * 0.2, jnp.bfloat16)
    b1 = jnp.asarray(rng.randn(dd) * 0.1, jnp.bfloat16)
    sigma = jnp.asarray(0.7, jnp.float32)
    pos_temp = jnp.asarray(1.3, jnp.float32)
    spatial = _spatial_kernel(d, sigma)

    rk = jax.nn.softmax(logits * pos_temp, axis=1)
    combined = rk * spatial
    combined = combined / jnp.clip(jnp.sum(combined, axis=1, keepdims=True),
                                   1e-7, None)
    fixup_in = jnp.concatenate([combined.astype(guidance.dtype), guidance], axis=1)
    x32 = fixup_in.astype(jnp.float32)
    mid = jax.nn.gelu(
        jnp.einsum("oc,bchw->bohw", w0.astype(jnp.float32), x32)
        + b0.astype(jnp.float32)[None, :, None, None], approximate=False)
    fix = (jnp.einsum("oc,bchw->bohw", w1.astype(jnp.float32), mid)
           + b1.astype(jnp.float32)[None, :, None, None])
    combined = (combined + 0.1 * fix).astype(inp.dtype)
    filt = combined.transpose(0, 2, 3, 1).reshape(b, h, w, d, d)
    ref = np.asarray(adaptive_conv(inp, filt), np.float32)

    got = np.asarray(jbu_epilogue_pallas(
        inp, logits.transpose(0, 2, 3, 1), guidance.transpose(0, 2, 3, 1),
        spatial.reshape(-1), pos_temp, w0, b0, w1, b1, d,
        interpret=True), np.float32)
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-5)

    # nhwc=True (channel-last in AND out) is the same computation
    got_nhwc = np.asarray(jbu_epilogue_pallas(
        inp.transpose(0, 2, 3, 1), logits.transpose(0, 2, 3, 1),
        guidance.transpose(0, 2, 3, 1), spatial.reshape(-1), pos_temp,
        w0, b0, w1, b1, d, interpret=True, nhwc=True), np.float32)
    np.testing.assert_array_equal(got_nhwc.transpose(0, 3, 1, 2), got)

    # classify variant == nhwc features -> final fixup -> L2 norm -> bf16
    # cosine matmul (the segmentor tail it fuses)
    from rs_ov.kernels.jbu_epilogue import jbu_epilogue_classify_pallas
    from rs_ov.upsample.jbu import _final_fixup_nhwc

    fw = jnp.asarray(rng.randn(c, c) * 0.2, jnp.bfloat16)
    fb = jnp.asarray(rng.randn(c) * 0.1, jnp.bfloat16)
    qf = jnp.asarray(rng.randn(3, c).astype(np.float32))
    qf = qf / jnp.linalg.norm(qf, axis=-1, keepdims=True)
    feats = _final_fixup_nhwc(jnp.asarray(got_nhwc, jnp.bfloat16),
                              {"w": fw, "b": fb})
    f32 = feats.astype(jnp.float32)
    f32 = f32 / jnp.maximum(jnp.linalg.norm(f32, axis=-1, keepdims=True), 1e-12)
    want = np.asarray(jnp.einsum("bhwc,qc->bhwq", f32.astype(jnp.bfloat16),
                                 qf.astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32))
    got_cls = np.asarray(jbu_epilogue_classify_pallas(
        inp.transpose(0, 2, 3, 1), logits.transpose(0, 2, 3, 1),
        guidance.transpose(0, 2, 3, 1), spatial.reshape(-1), pos_temp,
        w0, b0, w1, b1, fw, fb, qf, d, interpret=True))
    np.testing.assert_allclose(got_cls, want, atol=2e-2)


def test_jbu_epilogue_fused_range_matches_split():
    """Fully fused stage (range logits computed IN-kernel from the halo'd
    guidance projection) vs the split path: XLA reflect-pad + shifted-reduction
    logits feeding jbu_epilogue_pallas. Same math, so near-bit-exact (fp32
    sum-order in the logits dot differs)."""
    from rs_ov.kernels.jbu_epilogue import (
        jbu_epilogue_classify_pallas, jbu_epilogue_fused_classify_pallas,
        jbu_epilogue_fused_pallas, jbu_epilogue_pallas)
    from rs_ov.upsample.jbu import _spatial_kernel
    from rs_ov.utils.resize import reflect_pad_nhwc

    rng = np.random.RandomState(7)
    b, c, h, w, d, g, k = 1, 8, 12, 11, 5, 3, 4
    r = d // 2
    dd = d * d
    proj = jnp.asarray(rng.randn(b, h, w, k).astype(np.float32))
    guidance = jnp.asarray(rng.randn(b, g, h, w), jnp.bfloat16)
    inp = jnp.asarray(rng.randn(b, h, w, c), jnp.bfloat16)  # NHWC, unpadded
    w0 = jnp.asarray(rng.randn(dd, dd + g) * 0.2, jnp.bfloat16)
    b0 = jnp.asarray(rng.randn(dd) * 0.1, jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(dd, dd) * 0.2, jnp.bfloat16)
    b1 = jnp.asarray(rng.randn(dd) * 0.1, jnp.bfloat16)
    spatial = _spatial_kernel(d, jnp.asarray(0.7, jnp.float32))
    pos_temp = jnp.asarray(1.3, jnp.float32)

    # split-path reference: XLA reflect-pad + shifted-reduction range logits
    proj_cf = proj.transpose(0, 3, 1, 2)
    pp = jnp.pad(proj_cf, ((0, 0), (0, 0), (r, r), (r, r)), mode="reflect")
    logits = jnp.stack(
        [jnp.sum(pp[:, :, u:u + h, v:v + w] * proj_cf, axis=1)
         for u in range(d) for v in range(d)], axis=1)
    inp_padded = reflect_pad_nhwc(inp, r)
    ref = np.asarray(jbu_epilogue_pallas(
        inp_padded, logits.transpose(0, 2, 3, 1), guidance.transpose(0, 2, 3, 1),
        spatial.reshape(-1), pos_temp, w0, b0, w1, b1, d,
        interpret=True, nhwc=True), np.float32)

    got = np.asarray(jbu_epilogue_fused_pallas(
        inp, proj, guidance, spatial.reshape(-1), pos_temp,
        w0, b0, w1, b1, d, interpret=True), np.float32)
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got / scale, ref / scale, atol=1e-5)

    fw = jnp.asarray(rng.randn(c, c) * 0.2, jnp.bfloat16)
    fb = jnp.asarray(rng.randn(c) * 0.1, jnp.bfloat16)
    qf = jnp.asarray(rng.randn(3, c).astype(np.float32))
    qf = qf / jnp.linalg.norm(qf, axis=-1, keepdims=True)
    ref_cls = np.asarray(jbu_epilogue_classify_pallas(
        inp_padded, logits.transpose(0, 2, 3, 1), guidance.transpose(0, 2, 3, 1),
        spatial.reshape(-1), pos_temp, w0, b0, w1, b1, fw, fb, qf, d,
        interpret=True))
    got_cls = np.asarray(jbu_epilogue_fused_classify_pallas(
        inp, proj, guidance, spatial.reshape(-1), pos_temp,
        w0, b0, w1, b1, fw, fb, qf, d, interpret=True))
    np.testing.assert_allclose(got_cls, ref_cls, atol=2e-2)


def test_range_logits_kernel_matches_xla():
    """JBU range-kernel logits (local self-correlation) vs the shifted
    channel-reduction reference formulation."""
    from rs_ov.kernels.range_logits import range_logits_pallas

    rng = np.random.RandomState(4)
    b, k, h, w, d = 2, 8, 12, 16, 5
    padded = rng.randn(b, k, h + d - 1, w + d - 1).astype(np.float32)
    proj = rng.randn(b, k, h, w).astype(np.float32)
    ref = np.stack([np.sum(padded[:, :, u:u + h, v:v + w] * proj, axis=1)
                    for u in range(d) for v in range(d)], axis=1)
    got = np.asarray(range_logits_pallas(jnp.asarray(padded), jnp.asarray(proj),
                                         d, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
