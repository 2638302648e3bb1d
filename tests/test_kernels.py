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
