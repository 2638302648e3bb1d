"""SimFeatUp / Joint Bilateral Upsampling, TPU-native.

Re-implements the reference's learned-range JBU feature upsampler
(reference simfeatup_dev/upsamplers.py:202-325):

  * ``JBULearnedRange``: range kernel = softmax over a (2r+1)^2 unfolded
    window of a 1x1-conv projection of the guidance image (:230-238), times a
    Gaussian spatial kernel with learned sigma (:240-251), plus a fixup-conv
    residual (:264); the source is bicubic-upsampled then convolved with the
    per-pixel kernel — the reference calls an external CUDA op
    (``featup.adaptive_conv_cuda.AdaptiveConv``, :274) whose exact math is
    ``adaptive_conv_py_simple`` (:14-25).
  * ``JBUOne``: ONE shared 2x module applied 4 times (radius 5) — the
    production config (reference configs/base_config.py:22-24).
  * ``JBUStack``: four distinct radius-3 modules.

On TPU the hot path is two Pallas kernels: range logits
(rs_ov.kernels.range_logits) and the fused epilogue
(rs_ov.kernels.jbu_epilogue: tap softmax x spatial kernel, normalise,
fixup convs, and the adaptive conv as concat-K banded MXU matmuls — the
kernel lineage is documented in benchmarks/run_adaptive_v3_experiment.py).
bf16 runs take the fused path (RS_OV_JBU_FUSED=0 reverts to the split
kernels); fp32 runs use the v2 VPU rowstream kernel; CPU uses a fori_loop
of shifted multiply-adds. A channel-last (NHWC) variant of the whole stack
serves the production [T, HW, C] token layout with no boundary transposes.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from rs_ov.utils.resize import adaptive_avg_pool2d, reflect_pad_2d, resize_bicubic, resize_bilinear

__all__ = [
    "adaptive_conv",
    "unfold",
    "jbu_one_forward",
    "jbu_stack_forward",
    "bilinear_upsample",
    "init_jbu_one_params",
    "init_jbu_stack_params",
    "get_upsampler",
]


def unfold(x: jnp.ndarray, kernel: int) -> jnp.ndarray:
    """torch nn.Unfold(kernel) on [B, C, H, W] -> [B, C, k*k, H-k+1, W-k+1].

    Expressed as k^2 static slices (XLA folds these into one fused gather-free
    loop); channel-major / window-minor ordering matches torch.
    """
    b, c, h, w = x.shape
    oh, ow = h - kernel + 1, w - kernel + 1
    slices = [
        x[:, :, u:u + oh, v:v + ow]
        for u in range(kernel)
        for v in range(kernel)
    ]
    return jnp.stack(slices, axis=2)  # [B, C, k*k, oh, ow]


def adaptive_conv(inp: jnp.ndarray, filters: jnp.ndarray) -> jnp.ndarray:
    """Spatially-varying convolution (reference adaptive_conv_py_simple math).

    inp: [B, C, H1, W1]; filters: [B, H2, W2, f, f] with H2 = H1 - f + 1.
    Returns [B, C, H2, W2].

    NOT an unfold+einsum: materialising the f^2 window axis at feature
    resolution is ~12 GB/tile at 224^2x512 (exactly why the reference needs a
    CUDA op, reference upsamplers.py:8-11). On TPU this dispatches to the
    Pallas kernel (rs_ov.kernels.adaptive_conv — input crosses HBM once per
    VMEM tile); elsewhere a sequential fori_loop of shifted multiply-adds
    keeps live memory at O(BCHW) (an unrolled loop makes XLA materialise f^2
    temps and OOM).
    """
    b, h2, w2, f1, f2 = filters.shape
    assert f1 == f2
    if jax.default_backend() not in ("cpu",):
        from rs_ov.kernels.adaptive_conv import adaptive_conv_pallas

        return adaptive_conv_pallas(inp, filters)

    c = inp.shape[1]
    filt = filters.reshape(b, h2, w2, f1 * f2).astype(jnp.float32)

    def body(i, acc):
        u, v = i // f1, i % f1
        patch = jax.lax.dynamic_slice(inp, (0, 0, u, v), (b, c, h2, w2))
        w_i = jax.lax.dynamic_slice_in_dim(filt, i, 1, axis=3)[..., 0]  # [B,H,W]
        return acc + w_i[:, None] * patch.astype(jnp.float32)

    out = jax.lax.fori_loop(0, f1 * f2, body,
                            jnp.zeros((b, c, h2, w2), jnp.float32))
    return out.astype(inp.dtype)


def _conv1x1(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv on [B, C, H, W]; w: [O, C, 1, 1] or [O, C]."""
    w2 = w.reshape(w.shape[0], -1)
    y = jnp.einsum("oc,bchw->bohw", w2.astype(jnp.float32), x.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return (y + b.astype(jnp.float32)[None, :, None, None]).astype(x.dtype)


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _proj2(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """conv1x1 -> GELU -> (Dropout2d inactive) -> conv1x1 (reference :214-226)."""
    return _conv1x1(_gelu(_conv1x1(x, p["w0"], p["b0"])), p["w1"], p["b1"])


def _conv1x1_nhwc(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    w2 = w.reshape(w.shape[0], -1)
    y = jnp.einsum("bhwc,oc->bhwo", x.astype(jnp.float32),
                   w2.astype(jnp.float32), preferred_element_type=jnp.float32)
    return (y + b.astype(jnp.float32)).astype(x.dtype)


def _proj2_nhwc(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """_proj2 on [B, H, W, G] (same fp32 math / dtype round-trips)."""
    return _conv1x1_nhwc(_gelu(_conv1x1_nhwc(x, p["w0"], p["b0"])),
                         p["w1"], p["b1"])


def _spatial_kernel(diameter: int, sigma_spatial: jnp.ndarray) -> jnp.ndarray:
    """exp(-(x^2+y^2) / (2 sigma^2)) over a [-1,1]^2 window (reference :240-251)."""
    dist = np.linspace(-1.0, 1.0, diameter, dtype=np.float32)
    sq = dist[:, None] ** 2 + dist[None, :] ** 2  # note torch meshgrid 'ij'
    sq = jnp.asarray(sq.reshape(1, diameter * diameter, 1, 1))
    sigma = sigma_spatial.astype(jnp.float32)
    return jnp.exp(-sq / (2.0 * sigma ** 2))


def jbu_module_forward(p: dict, source: jnp.ndarray, guidance: jnp.ndarray,
                       radius: int) -> jnp.ndarray:
    """One learned-range JBU step: source [B,C,h,w] -> [B,C,GH,GW] where
    (GH, GW) = guidance spatial shape (reference JBULearnedRange.forward)."""
    diameter = radius * 2 + 1
    gb, _, gh, gw = guidance.shape

    proj = _proj2(guidance, p["range_proj"]).astype(jnp.float32)  # [B, key, GH, GW]
    proj_padded = reflect_pad_2d(proj, radius)
    # range logits: per window offset, <proj(x), proj(x+offset)> — matches
    # reference upsamplers.py:230-238 unfold+einsum math without the
    # [B,key,d^2,GH,GW] materialisation. On TPU a Pallas kernel keeps the
    # projection VMEM-resident (the XLA shifted-reduction stack re-reads it
    # from HBM per tap and pays a 128x-padded concat layout)
    pos_temp = jnp.clip(jnp.exp(p["range_temp"].astype(jnp.float32)), 1e-4, 1e4)
    if jax.default_backend() not in ("cpu",):
        from rs_ov.kernels.range_logits import range_logits_pallas

        logits = range_logits_pallas(proj_padded, proj, diameter)
        if (guidance.dtype == jnp.bfloat16
                and os.environ.get("RS_OV_JBU_FUSED", "1") != "0"):
            # fused epilogue: softmax + spatial + normalise + fixup convs +
            # adaptive conv in ONE kernel — the [B, d^2, H, W] fp32
            # intermediates never leave VMEM (kernels/jbu_epilogue.py)
            from rs_ov.kernels.jbu_epilogue import jbu_epilogue_pallas

            hr_source = resize_bicubic(source, (gh, gw))
            hr_source_padded = reflect_pad_2d(hr_source, radius)
            fx = p["fixup_proj"]
            return jbu_epilogue_pallas(
                hr_source_padded, logits.transpose(0, 2, 3, 1),
                guidance.transpose(0, 2, 3, 1),
                _spatial_kernel(diameter, p["sigma_spatial"]).reshape(-1),
                pos_temp, fx["w0"].reshape(fx["w0"].shape[0], -1), fx["b0"],
                fx["w1"].reshape(fx["w1"].shape[0], -1), fx["b1"], diameter,
                slab=os.environ.get("RS_OV_JBU_SLAB", "1") != "0")
    else:
        logits = jnp.stack(
            [jnp.sum(proj_padded[:, :, u:u + gh, v:v + gw] * proj, axis=1)
             for u in range(diameter) for v in range(diameter)], axis=1)
    range_kernel = jax.nn.softmax(logits * pos_temp, axis=1)  # [B, d*d, GH, GW]

    combined = range_kernel * _spatial_kernel(diameter, p["sigma_spatial"])
    combined = combined / jnp.clip(jnp.sum(combined, axis=1, keepdims=True), 1e-7, None)

    fixup_in = jnp.concatenate([combined.astype(guidance.dtype), guidance], axis=1)
    combined = combined + 0.1 * _proj2(fixup_in, p["fixup_proj"]).astype(jnp.float32)

    hr_source = resize_bicubic(source, (gh, gw))
    hr_source_padded = reflect_pad_2d(hr_source, radius)
    combined = combined.astype(hr_source_padded.dtype)
    if jax.default_backend() not in ("cpu",):
        # combined is ALREADY tap-major [B, d*d, H, W] — feed the Pallas
        # kernel directly, skipping a multi-GB transpose round-trip.
        # bf16 runs take the v5 MXU concat-K banded-matmul kernel (3.4x the
        # v2 VPU kernel at the production 224^2 stage, numerically identical:
        # bf16 products are exact in fp32 either way); fp32 runs keep v2's
        # all-fp32 VPU math.
        if hr_source_padded.dtype == jnp.bfloat16:
            from rs_ov.kernels.adaptive_conv_v5 import adaptive_conv_pallas_v5

            return adaptive_conv_pallas_v5(hr_source_padded, combined, diameter)
        from rs_ov.kernels.adaptive_conv_v2 import adaptive_conv_pallas_v2

        return adaptive_conv_pallas_v2(hr_source_padded, combined, diameter)
    filt = combined.transpose(0, 2, 3, 1).reshape(gb, gh, gw, diameter, diameter)
    return adaptive_conv(hr_source_padded, filt)


def _final_fixup(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """Dropout2d(inactive) -> conv1x1, scaled residual (reference :296-301, :320-325)."""
    return _conv1x1(x, p["w"], p["b"]) * 0.1 + x


# ---------------------------------------------------------------------------
# channel-last (NHWC) path — TPU bf16 production layout.
#
# The decontaminated tokens arrive [T, HW, C] (channel-last already) and the
# classifier consumes [T, HW, C]; running the whole 4-stage JBU channel-last
# means the only layout ops left are the cheap [B,121,H,W] logits transpose
# and the per-stage pooled-guidance transpose (3 channels) — the three
# full-size [B,C,H,W]<->[B,H,W,C] passes per stage disappear.
# ---------------------------------------------------------------------------

def _pallas_interpret() -> bool:
    """Pallas lowers natively only on TPU; RS_OV_PALLAS_INTERPRET=1 runs the
    production NHWC kernel path in interpret mode so it can be exercised
    end-to-end on the CPU test platform (tests/test_parity_jbu_realweights)."""
    return os.environ.get("RS_OV_PALLAS_INTERPRET", "0") == "1"


def jbu_module_forward_nhwc(p: dict, source: jnp.ndarray, guidance_cf: jnp.ndarray,
                            radius: int) -> jnp.ndarray:
    """One JBU step, channel-last: source [B, h, w, C] + guidance [B, 3, GH, GW]
    (channel-first: the range-projection convs and the range-logits kernel run
    channel-first on the tiny 3/32-channel tensors) -> [B, GH, GW, C]."""
    from rs_ov.kernels.jbu_epilogue import jbu_epilogue_pallas
    from rs_ov.kernels.range_logits import range_logits_pallas
    from rs_ov.utils.resize import reflect_pad_nhwc, resize_bicubic_nhwc

    diameter = radius * 2 + 1
    _, _, gh, gw = guidance_cf.shape
    pos_temp = jnp.clip(jnp.exp(p["range_temp"].astype(jnp.float32)), 1e-4, 1e4)
    fx = p["fixup_proj"]

    if os.environ.get("RS_OV_JBU_FUSED_RANGE", "0") == "1":
        # fully fused stage: the range logits are computed IN-kernel from a
        # 2-D halo'd window of the guidance projection — the [B, d^2, H, W]
        # fp32 logits tensor, its HBM round-trip, its pixel-major transpose
        # and both reflect-pad passes all disappear. OPT-IN: measured 0.747x
        # the split path on v5e (the tap dot-products run on the VPU here vs
        # MXU matmuls in the range_logits kernel) — benchmarks/PERF.md
        from rs_ov.kernels.jbu_epilogue import jbu_epilogue_fused_pallas

        proj = _proj2_nhwc(jnp.transpose(guidance_cf, (0, 2, 3, 1)),
                           p["range_proj"]).astype(jnp.float32)
        hr = resize_bicubic_nhwc(source, (gh, gw))
        return jbu_epilogue_fused_pallas(
            hr, proj, guidance_cf,
            _spatial_kernel(diameter, p["sigma_spatial"]).reshape(-1),
            pos_temp, fx["w0"].reshape(fx["w0"].shape[0], -1), fx["b0"],
            fx["w1"].reshape(fx["w1"].shape[0], -1), fx["b1"], diameter,
            interpret=_pallas_interpret())

    proj = _proj2(guidance_cf, p["range_proj"]).astype(jnp.float32)
    proj_padded = reflect_pad_2d(proj, radius)
    logits = range_logits_pallas(proj_padded, proj, diameter,
                                 interpret=_pallas_interpret())

    hr = resize_bicubic_nhwc(source, (gh, gw))
    hr_padded = reflect_pad_nhwc(hr, radius)
    return jbu_epilogue_pallas(
        hr_padded, logits.transpose(0, 2, 3, 1),
        guidance_cf.transpose(0, 2, 3, 1),
        _spatial_kernel(diameter, p["sigma_spatial"]).reshape(-1),
        pos_temp, fx["w0"].reshape(fx["w0"].shape[0], -1), fx["b0"],
        fx["w1"].reshape(fx["w1"].shape[0], -1), fx["b1"], diameter, nhwc=True,
        slab=os.environ.get("RS_OV_JBU_SLAB", "1") != "0",
        rows=int(os.environ.get("RS_OV_JBU_ROWS", "1")),
        interpret=_pallas_interpret())


def jbu_module_forward_nhwc_classify(p: dict, source: jnp.ndarray,
                                     guidance_cf: jnp.ndarray,
                                     final_fixup: dict,
                                     query_features: jnp.ndarray,
                                     radius: int) -> jnp.ndarray:
    """Final JBU stage with the pipeline tail fused into the kernel:
    final-fixup conv + L2 norm + cosine classifier
    (kernels/jbu_epilogue.jbu_epilogue_classify_pallas) -> [B, GH, GW, Q]
    fp32 logits."""
    from rs_ov.kernels.jbu_epilogue import jbu_epilogue_classify_pallas
    from rs_ov.kernels.range_logits import range_logits_pallas
    from rs_ov.utils.resize import reflect_pad_nhwc, resize_bicubic_nhwc

    diameter = radius * 2 + 1
    _, _, gh, gw = guidance_cf.shape
    pos_temp = jnp.clip(jnp.exp(p["range_temp"].astype(jnp.float32)), 1e-4, 1e4)
    fx = p["fixup_proj"]
    c = source.shape[-1]

    if os.environ.get("RS_OV_JBU_FUSED_RANGE", "0") == "1":
        from rs_ov.kernels.jbu_epilogue import jbu_epilogue_fused_classify_pallas

        proj = _proj2_nhwc(jnp.transpose(guidance_cf, (0, 2, 3, 1)),
                           p["range_proj"]).astype(jnp.float32)
        hr = resize_bicubic_nhwc(source, (gh, gw))
        return jbu_epilogue_fused_classify_pallas(
            hr, proj, guidance_cf,
            _spatial_kernel(diameter, p["sigma_spatial"]).reshape(-1),
            pos_temp, fx["w0"].reshape(fx["w0"].shape[0], -1), fx["b0"],
            fx["w1"].reshape(fx["w1"].shape[0], -1), fx["b1"],
            final_fixup["w"].reshape(c, c), final_fixup["b"],
            query_features, diameter, interpret=_pallas_interpret())

    proj = _proj2(guidance_cf, p["range_proj"]).astype(jnp.float32)
    proj_padded = reflect_pad_2d(proj, radius)
    logits = range_logits_pallas(proj_padded, proj, diameter,
                                 interpret=_pallas_interpret())

    hr = resize_bicubic_nhwc(source, (gh, gw))
    hr_padded = reflect_pad_nhwc(hr, radius)
    return jbu_epilogue_classify_pallas(
        hr_padded, logits.transpose(0, 2, 3, 1),
        guidance_cf.transpose(0, 2, 3, 1),
        _spatial_kernel(diameter, p["sigma_spatial"]).reshape(-1),
        pos_temp, fx["w0"].reshape(fx["w0"].shape[0], -1), fx["b0"],
        fx["w1"].reshape(fx["w1"].shape[0], -1), fx["b1"],
        final_fixup["w"].reshape(c, c), final_fixup["b"],
        query_features, diameter,
        slab=os.environ.get("RS_OV_JBU_SLAB", "1") != "0",
        rows=int(os.environ.get("RS_OV_JBU_ROWS", "1")),
        interpret=_pallas_interpret())


def jbu_one_forward_nhwc_classify(p: dict, source: jnp.ndarray,
                                  guidance_cf: jnp.ndarray,
                                  query_features: jnp.ndarray,
                                  radius: int = 5,
                                  stages: int = 4) -> jnp.ndarray:
    """JBUOne channel-last with the classifier fused into the last stage:
    source [B, h, w, C] + guidance [B, 3, GH, GW] + queries [Q, C]
    -> [B, 2^stages h, 2^stages w, Q] fp32 cosine logits.

    stages < 4 is the opt-in fast mode: classify at the reduced grid and let
    the caller's existing bilinear logit resize cover the remaining factor
    (smooth Q-channel logits upsample far cheaper than 512-channel features).
    """
    from rs_ov.utils.resize import adaptive_avg_pool2d as _pool

    x = source
    for _ in range(stages - 1):
        h, w = x.shape[1], x.shape[2]
        small_guidance = _pool(guidance_cf, (h * 2, w * 2))
        x = jbu_module_forward_nhwc(p["up"], x, small_guidance, radius)
    h, w = x.shape[1], x.shape[2]
    small_guidance = _pool(guidance_cf, (h * 2, w * 2))
    return jbu_module_forward_nhwc_classify(
        p["up"], x, small_guidance, p["final_fixup"], query_features, radius)


def jbu_stack_forward_nhwc_classify(p: dict, source: jnp.ndarray,
                                    guidance_cf: jnp.ndarray,
                                    query_features: jnp.ndarray,
                                    radius: int = 3,
                                    stages: int = 4) -> jnp.ndarray:
    """JBUStack channel-last with the fused classifier tail. stages < 4 uses
    the first stages-1 stack modules plus the LAST module (trained for the
    final scale) for the classify stage."""
    from rs_ov.utils.resize import adaptive_avg_pool2d as _pool

    x = source
    for stage in range(stages - 1):
        h, w = x.shape[1], x.shape[2]
        small_guidance = _pool(guidance_cf, (h * 2, w * 2))
        x = jbu_module_forward_nhwc(p["ups"][stage], x, small_guidance, radius)
    h, w = x.shape[1], x.shape[2]
    small_guidance = _pool(guidance_cf, (h * 2, w * 2))
    return jbu_module_forward_nhwc_classify(
        p["ups"][3], x, small_guidance, p["final_fixup"], query_features, radius)


def get_upsampler_nhwc_classify(name: str, stages: int = 4):
    """Channel-last forward with the classifier fused into the final JBU
    stage, else None. forward(params, source [B,h,w,C], guidance_cf
    [B,3,GH,GW], query_features [Q,C]) -> [B,GH,GW,Q] fp32 logits."""
    if name == "jbu_one":
        return lambda p, s, g, qf: jbu_one_forward_nhwc_classify(
            p, s, g, qf, radius=5, stages=stages)
    if name == "jbu_stack":
        return lambda p, s, g, qf: jbu_stack_forward_nhwc_classify(
            p, s, g, qf, radius=3, stages=stages)
    return None


def _final_fixup_nhwc(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """_final_fixup on [B, H, W, C]; bf16 operands / fp32 accumulation (the
    channel-first path's fp32 operands would run the 512x512 channel matmul
    at the MXU's slow fp32 rate)."""
    w2 = p["w"].reshape(p["w"].shape[0], -1)
    y = jnp.einsum("oc,bhwc->bhwo", w2.astype(x.dtype), x,
                   preferred_element_type=jnp.float32)
    y = y + p["b"].astype(jnp.float32)
    return (y * 0.1).astype(x.dtype) + x


def jbu_one_forward_nhwc(p: dict, source: jnp.ndarray, guidance_cf: jnp.ndarray,
                         radius: int = 5, stages: int = 4) -> jnp.ndarray:
    """JBUOne channel-last: source [B, h, w, C], guidance [B, 3, GH, GW]
    -> [B, 2^stages h, 2^stages w, C]."""
    from rs_ov.utils.resize import adaptive_avg_pool2d as _pool

    x = source
    for _ in range(stages):
        h, w = x.shape[1], x.shape[2]
        small_guidance = _pool(guidance_cf, (h * 2, w * 2))
        x = jbu_module_forward_nhwc(p["up"], x, small_guidance, radius)
    return _final_fixup_nhwc(x, p["final_fixup"])


def jbu_stack_forward_nhwc(p: dict, source: jnp.ndarray, guidance_cf: jnp.ndarray,
                           radius: int = 3, stages: int = 4) -> jnp.ndarray:
    """JBUStack channel-last (four distinct radius-3 modules)."""
    from rs_ov.utils.resize import adaptive_avg_pool2d as _pool

    x = source
    for stage in range(stages):
        h, w = x.shape[1], x.shape[2]
        small_guidance = _pool(guidance_cf, (h * 2, w * 2))
        x = jbu_module_forward_nhwc(p["ups"][stage], x, small_guidance, radius)
    return _final_fixup_nhwc(x, p["final_fixup"])


def get_upsampler_nhwc(name: str, stages: int = 4):
    """Channel-last forward for upsamplers that support it, else None.

    forward(params, source [B,h,w,C], guidance_cf [B,3,GH,GW]) -> [B,GH,GW,C].
    Only used on the TPU bf16 path (the Pallas epilogue requires bf16)."""
    if name == "jbu_one":
        return lambda p, s, g: jbu_one_forward_nhwc(p, s, g, radius=5, stages=stages)
    if name == "jbu_stack":
        return lambda p, s, g: jbu_stack_forward_nhwc(p, s, g, radius=3, stages=stages)
    return None


def _staged_upsample(source, guidance, step_fn, stages: int = 4):
    """stages x2 steps, guidance adaptively pooled to each target size."""
    x = source
    for stage in range(stages):
        _, _, h, w = x.shape
        small_guidance = adaptive_avg_pool2d(guidance, (h * 2, w * 2))
        x = step_fn(stage, x, small_guidance)
    return x


def jbu_one_forward(p: dict, source: jnp.ndarray, guidance: jnp.ndarray,
                    radius: int = 5, stages: int = 4) -> jnp.ndarray:
    """JBUOne: one shared module applied 4x (reference :304-325)."""
    out = _staged_upsample(source, guidance,
                           lambda _s, x, g: jbu_module_forward(p["up"], x, g, radius),
                           stages)
    return _final_fixup(out, p["final_fixup"])


def jbu_stack_forward(p: dict, source: jnp.ndarray, guidance: jnp.ndarray,
                      radius: int = 3, stages: int = 4) -> jnp.ndarray:
    """JBUStack: four distinct radius-3 modules (reference :278-301)."""
    out = _staged_upsample(source, guidance,
                           lambda s, x, g: jbu_module_forward(p["ups"][s], x, g, radius),
                           stages)
    return _final_fixup(out, p["final_fixup"])


def bilinear_upsample(_p, source: jnp.ndarray, guidance: jnp.ndarray) -> jnp.ndarray:
    """'bilinear' upsampler: resize features to the guidance size (reference :343-350)."""
    return resize_bilinear(source, (guidance.shape[-2], guidance.shape[-1]))


# ---------------------------------------------------------------------------
# Parameter init (for tests / random-weight runs; checkpoints load via
# rs_ov.core.checkpoint.jbu_params_from_state_dict)
# ---------------------------------------------------------------------------

def _init_proj2(key, cin, cmid, cout, dtype):
    k0, k1 = jax.random.split(key)
    s0 = (cin) ** -0.5
    s1 = (cmid) ** -0.5
    return {
        "w0": (jax.random.normal(k0, (cmid, cin, 1, 1)) * s0).astype(dtype),
        "b0": jnp.zeros((cmid,), dtype),
        "w1": (jax.random.normal(k1, (cout, cmid, 1, 1)) * s1).astype(dtype),
        "b1": jnp.zeros((cout,), dtype),
    }


def _init_jbu_module(key, guidance_dim, key_dim, radius, dtype):
    d2 = (radius * 2 + 1) ** 2
    k0, k1 = jax.random.split(key)
    return {
        "range_temp": jnp.zeros((), dtype),
        "sigma_spatial": jnp.ones((), dtype),
        "range_proj": _init_proj2(k0, guidance_dim, key_dim, key_dim, dtype),
        "fixup_proj": _init_proj2(k1, guidance_dim + d2, d2, d2, dtype),
    }


def init_jbu_one_params(key, feat_dim: int, guidance_dim: int = 3,
                        key_dim: int = 32, radius: int = 5, dtype=jnp.float32) -> dict:
    k0, k1 = jax.random.split(key)
    return {
        "up": _init_jbu_module(k0, guidance_dim, key_dim, radius, dtype),
        "final_fixup": {
            "w": (jax.random.normal(k1, (feat_dim, feat_dim, 1, 1))
                  * feat_dim ** -0.5).astype(dtype),
            "b": jnp.zeros((feat_dim,), dtype),
        },
    }


def init_jbu_stack_params(key, feat_dim: int, guidance_dim: int = 3,
                          key_dim: int = 32, radius: int = 3, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 5)
    return {
        "ups": [_init_jbu_module(keys[i], guidance_dim, key_dim, radius, dtype)
                for i in range(4)],
        "final_fixup": {
            "w": (jax.random.normal(keys[4], (feat_dim, feat_dim, 1, 1))
                  * feat_dim ** -0.5).astype(dtype),
            "b": jnp.zeros((feat_dim,), dtype),
        },
    }


def get_upsampler(name: str, stages: int = 4):
    """Registry (reference get_upsampler :353-369). Returns (forward, init).

    forward(params, source, guidance) -> upsampled features. ``stages`` < 4
    (jbu_one/jbu_stack only) is the opt-in reduced-stage fast mode; the
    output is then guidance_size / 2^(4-stages) and the caller is expected
    to bilinear-resize its (cheap, Q-channel) logits the rest of the way.
    """
    if name == "bilinear":
        return bilinear_upsample, lambda key, dim, dtype=jnp.float32: {}
    if name == "jbu_one":
        return (lambda p, s, g: jbu_one_forward(p, s, g, radius=5, stages=stages),
                lambda key, dim, dtype=jnp.float32: init_jbu_one_params(key, dim, dtype=dtype))
    if name == "jbu_stack":
        return (lambda p, s, g: jbu_stack_forward(p, s, g, radius=3, stages=stages),
                lambda key, dim, dtype=jnp.float32: init_jbu_stack_params(key, dim, dtype=dtype))
    if name == "resize_conv":
        from rs_ov.upsample.alternates import init_resize_conv_params, resize_conv_forward

        return resize_conv_forward, init_resize_conv_params
    if name == "ifa":
        from rs_ov.upsample.alternates import ifa_forward, init_ifa_params

        return ifa_forward, init_ifa_params
    if name == "carafe":
        from rs_ov.upsample.alternates import carafe_forward, init_carafe_params

        return carafe_forward, init_carafe_params
    if name == "sapa":
        from rs_ov.upsample.alternates import init_sapa_params, sapa_forward

        return sapa_forward, init_sapa_params
    raise ValueError(
        f"Unknown upsampler '{name}' (known: bilinear, jbu_one, jbu_stack, "
        f"resize_conv, ifa, carafe, sapa)")
