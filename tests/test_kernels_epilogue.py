"""JBU epilogue / range-logits Pallas kernels vs XLA compositions.

Split from test_kernels.py: these interpret-mode runs are the heaviest
CPU compiles in the suite, and XLA:CPU on this image becomes fragile when
too many large Pallas programs accumulate in one process (see
tools/run_slow_tests.py) — giving them their own module gives them their
own process in the slow tier.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rs_ov.upsample.jbu import adaptive_conv


def test_jbu_epilogue_fused_matches_xla_composition():
    """Fused combined-kernel epilogue (softmax + spatial + normalise + fixup
    convs + v5 adaptive conv in one kernel) vs the exact XLA op chain it
    replaces. Bit-exact in interpret mode up to the rational-erf GELU
    (|erf err| <= 1.5e-7)."""
    from rs_ov.kernels.jbu_epilogue import jbu_epilogue_pallas
    from rs_ov.upsample.jbu import _spatial_kernel

    rng = np.random.RandomState(11)
    # small grid: interpret mode is a python-level grid walk on CPU; 12x11
    # still spans reflect-padded borders at r=2 plus interior columns
    b, c, h, w, d, g = 1, 8, 12, 11, 5, 3
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


def test_jbu_epilogue_rows_variants_match():
    """rows=R (R output rows per MXU issue, VERDICT r3 #4) is bit-identical
    to rows=1: the stacked band's zero stripes contribute exact fp32 zeros.

    Interpret-mode compiles here are minutes apiece, so only R=2 runs on
    CPU; R in {2,4,8} was verified bit-identical on the real TPU
    (benchmarks/jbu_rows_ab.json)."""
    from rs_ov.kernels.jbu_epilogue import (jbu_epilogue_classify_pallas,
                                            jbu_epilogue_pallas)
    from rs_ov.upsample.jbu import _spatial_kernel

    rng = np.random.RandomState(13)
    b, c, h, w, d, g = 1, 8, 12, 11, 5, 3
    dd = d * d
    logits = jnp.asarray(rng.randn(b, h, w, dd).astype(np.float32))
    guidance = jnp.asarray(rng.randn(b, h, w, g), jnp.bfloat16)
    inp = jnp.asarray(rng.randn(b, h + d - 1, w + d - 1, c), jnp.bfloat16)
    w0 = jnp.asarray(rng.randn(dd, dd + g) * 0.2, jnp.bfloat16)
    b0 = jnp.asarray(rng.randn(dd) * 0.1, jnp.bfloat16)
    w1 = jnp.asarray(rng.randn(dd, dd) * 0.2, jnp.bfloat16)
    b1 = jnp.asarray(rng.randn(dd) * 0.1, jnp.bfloat16)
    spatial = _spatial_kernel(d, jnp.asarray(0.7, jnp.float32)).reshape(-1)
    pos_temp = jnp.asarray(1.3, jnp.float32)
    fw = jnp.asarray(rng.randn(c, c) * 0.2, jnp.bfloat16)
    fb = jnp.asarray(rng.randn(c) * 0.1, jnp.bfloat16)
    qf = jnp.asarray(rng.randn(3, c).astype(np.float32))
    qf = qf / jnp.linalg.norm(qf, axis=-1, keepdims=True)

    base = np.asarray(jbu_epilogue_pallas(
        inp, logits, guidance, spatial, pos_temp, w0, b0, w1, b1, d,
        interpret=True, nhwc=True), np.float32)
    base_cls = np.asarray(jbu_epilogue_classify_pallas(
        inp, logits, guidance, spatial, pos_temp, w0, b0, w1, b1,
        fw, fb, qf, d, interpret=True))
    for r in (2,):
        got = np.asarray(jbu_epilogue_pallas(
            inp, logits, guidance, spatial, pos_temp, w0, b0, w1, b1, d,
            interpret=True, nhwc=True, rows=r), np.float32)
        np.testing.assert_array_equal(got, base)
        got_cls = np.asarray(jbu_epilogue_classify_pallas(
            inp, logits, guidance, spatial, pos_temp, w0, b0, w1, b1,
            fw, fb, qf, d, interpret=True, rows=r))
        np.testing.assert_array_equal(got_cls, base_cls)
