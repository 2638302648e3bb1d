"""Pallas TPU kernel: fused JBU combined-kernel epilogue + adaptive conv.

Fuses everything between the range logits and the upsampled output of one
JBU stage (reference simfeatup_dev/upsamplers.py:230-274):

    range_kernel = softmax(logits * pos_temp)        # over the d^2 taps
    combined     = range_kernel * spatial_gaussian
    combined    /= max(sum_taps(combined), 1e-7)
    fixup        = conv1x1(gelu(conv1x1([combined, guidance])))
    combined'    = combined + 0.1 * fixup
    out          = adaptive_conv(hr_source, combined')   # v5 concat-K matmuls

In the XLA formulation each of those lines is an HBM round-trip of a
[B, d^2, H, W] fp32 tensor (~48 MB per 224^2 tile-chunk); here the whole
epilogue happens once per VMEM block.  The layout is the trick: taps live on
the LANE axis ([pixels, d^2] with d^2 = 121 <= 128), so the softmax and the
normalisation are lane reductions, the fixup 1x1 convs are [P, 128] @
[128, 128] pixel-block matmuls on the MXU (weights padded once in XLA), and
the adaptive-conv band slab for (output row i, window row u) is the static
slice combined'[i*WT:(i+1)*WT, u*d:(u+1)*d] of the same scratch — no
relayout between the epilogue and the conv.

The adaptive-conv half is identical to kernels/adaptive_conv_v5.py (concat-K
banded matmuls, one MXU issue per output row, dual-ref row halo).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["jbu_epilogue_pallas", "jbu_epilogue_classify_pallas"]

_HT = 16   # output rows per grid step (>= d-1 so the halo spans <= 2 blocks)
_WT = 112  # output cols per grid step (WT + d - 1 <= 128 for d <= 17)


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| <= 1.5e-7 — fp32-exact
    for this use; Mosaic TPU has no erf primitive)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t * jnp.exp(-ax * ax)
    return s * y


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


def _fill_x(x_ref, inpa_ref, inpb_ref, *, ht: int, wt: int, slab: bool):
    """Stage the 2*ht-row input slab for the banded matmuls.

    slab=False: inpa/inpb are pre-stacked 128-wide windows ([1, ht, 1, 128, cp]).
    slab=True: inpa/inpb are full-width row slabs ([1, ht, Wcols, cp]) and the
    128-wide window at column wi*wt is sliced here in VMEM — the XLA
    window-stack pass (and its 128/wt duplicated HBM traffic) disappears."""
    if slab:
        off = pl.program_id(2) * wt
        x_ref[:ht * 128] = inpa_ref[0, :, pl.ds(off, 128), :].reshape(
            ht * 128, -1).astype(jnp.bfloat16)
        x_ref[ht * 128:] = inpb_ref[0, :, pl.ds(off, 128), :].reshape(
            ht * 128, -1).astype(jnp.bfloat16)
    else:
        x_ref[:ht * 128] = inpa_ref[0, :, 0].reshape(ht * 128, -1).astype(jnp.bfloat16)
        x_ref[ht * 128:] = inpb_ref[0, :, 0].reshape(ht * 128, -1).astype(jnp.bfloat16)


def _kernel(logits_ref, guid_ref, spatial_ref, temp_ref, w0_ref, b0_ref,
            w1_ref, b1_ref, inpa_ref, inpb_ref, out_ref,
            comb_ref, x_ref, band_ref, *, diameter: int, ht: int, wt: int,
            dd: int, g: int, slab: bool = False):
    d = diameter
    p = ht * wt

    # ---- combined-kernel epilogue, taps on lanes ----------------------
    logits = logits_ref[0].reshape(p, dd)                  # [P, d*d] fp32
    rk = jax.nn.softmax(logits * temp_ref[0], axis=-1)
    comb = rk * spatial_ref[0, :dd]
    comb = comb / jnp.clip(jnp.sum(comb, axis=-1, keepdims=True), 1e-7, None)

    # fixup projection: [comb, guidance] -> conv1x1 -> gelu -> conv1x1
    # (the XLA path casts combined to the guidance dtype for the concat —
    # reproduce the cast so results match bit-for-bit)
    guid = guid_ref[0].reshape(p, g).astype(jnp.float32)
    x = jnp.concatenate(
        [comb.astype(guid_ref.dtype).astype(jnp.float32), guid], axis=1)
    x = jnp.pad(x, ((0, 0), (0, 128 - dd - g)))            # [P, 128]
    mid = _gelu_exact(
        jax.lax.dot_general(x, w0_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b0_ref[0])
    fix = jax.lax.dot_general(mid, w1_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) + b1_ref[0]
    comb_ref[:] = (comb + 0.1 * fix[:, :dd]).astype(jnp.bfloat16)

    # ---- adaptive conv (v5 concat-K banded matmuls) -------------------
    _fill_x(x_ref, inpa_ref, inpb_ref, ht=ht, wt=wt, slab=slab)
    for i in range(ht):
        for u in range(d):
            slab = comb_ref[i * wt:(i + 1) * wt, u * d:(u + 1) * d]
            slab = jnp.pad(slab.astype(jnp.float32), ((0, 0), (0, 128 - d)))
            m = pltpu.roll(slab, 0, axis=1, stride=1, stride_axis=0)
            band_ref[:, u * 128:(u + 1) * 128] = m.astype(jnp.bfloat16)
        out_ref[0, i, 0] = jax.lax.dot_general(
            band_ref[:], x_ref[i * 128:(i + d) * 128],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _kernel_cls(logits_ref, guid_ref, spatial_ref, temp_ref, w0_ref, b0_ref,
                w1_ref, b1_ref, inpa_ref, inpb_ref, fw_ref, fb_ref, qf_ref,
                out_ref, comb_ref, x_ref, band_ref, *, diameter: int, ht: int,
                wt: int, dd: int, g: int, slab: bool = False):
    """_kernel + the pipeline tail fused per output row: final-fixup conv
    (residual 1x1 over C), L2 normalisation, and the cosine classifier —
    the [P, C] stage-4 features never leave VMEM and the kernel writes
    [P, Q<=128] logits instead (85x less output HBM at C=512, Q=6)."""
    d = diameter
    p = ht * wt

    logits = logits_ref[0].reshape(p, dd)
    rk = jax.nn.softmax(logits * temp_ref[0], axis=-1)
    comb = rk * spatial_ref[0, :dd]
    comb = comb / jnp.clip(jnp.sum(comb, axis=-1, keepdims=True), 1e-7, None)
    guid = guid_ref[0].reshape(p, g).astype(jnp.float32)
    x = jnp.concatenate(
        [comb.astype(guid_ref.dtype).astype(jnp.float32), guid], axis=1)
    x = jnp.pad(x, ((0, 0), (0, 128 - dd - g)))
    mid = _gelu_exact(
        jax.lax.dot_general(x, w0_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b0_ref[0])
    fix = jax.lax.dot_general(mid, w1_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) + b1_ref[0]
    comb_ref[:] = (comb + 0.1 * fix[:, :dd]).astype(jnp.bfloat16)

    _fill_x(x_ref, inpa_ref, inpb_ref, ht=ht, wt=wt, slab=slab)
    for i in range(ht):
        for u in range(d):
            slab = comb_ref[i * wt:(i + 1) * wt, u * d:(u + 1) * d]
            slab = jnp.pad(slab.astype(jnp.float32), ((0, 0), (0, 128 - d)))
            m = pltpu.roll(slab, 0, axis=1, stride=1, stride_axis=0)
            band_ref[:, u * 128:(u + 1) * 128] = m.astype(jnp.bfloat16)
        y = jax.lax.dot_general(
            band_ref[:], x_ref[i * 128:(i + d) * 128],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # [WT, C] fp32
        # final fixup (upsample/jbu._final_fixup_nhwc math, incl. its casts)
        yb = y.astype(jnp.bfloat16)
        fx2 = jax.lax.dot_general(yb, fw_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        res = ((fx2 + fb_ref[0]) * 0.1).astype(jnp.bfloat16) + yb
        # L2 normalise + cosine classifier (segmentor math: fp32 norm,
        # bf16 operands / fp32 accumulation for the query matmul)
        r32 = res.astype(jnp.float32)
        inv = jax.lax.rsqrt(
            jnp.maximum(jnp.sum(r32 * r32, axis=-1, keepdims=True), 1e-24))
        rb = (r32 * inv).astype(jnp.bfloat16)
        out_ref[0, i, 0] = jax.lax.dot_general(
            rb, qf_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("diameter", "interpret", "nhwc", "slab"))
def jbu_epilogue_pallas(inp: jnp.ndarray, logits_t: jnp.ndarray,
                        guid_t: jnp.ndarray, spatial: jnp.ndarray,
                        pos_temp: jnp.ndarray, w0: jnp.ndarray,
                        b0: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                        diameter: int, interpret: bool = False,
                        nhwc: bool = False, slab: bool = True) -> jnp.ndarray:
    """inp: [B, C, H+d-1, W+d-1] (bicubic-upsampled reflect-padded source) —
    or [B, H+d-1, W+d-1, C] with nhwc=True, which also returns [B, H, W, C]
    and skips both boundary transposes (the layout the kernel uses anyway);
    logits_t: [B, H, W, d*d] fp32 range logits (pixel-major);
    guid_t: [B, H, W, G] guidance (pixel-major, G + d*d <= 128);
    spatial: [d*d] fp32; pos_temp: scalar fp32;
    w0: [cmid, d*d+G], b0: [cmid], w1: [d*d, cmid], b1: [d*d] fixup convs
    -> [B, C, H, W] (or [B, H, W, C]) in inp dtype."""
    if nhwc:
        b, hp, wp, c = inp.shape
    else:
        b, c, hp, wp = inp.shape
    _, h, w, dd = logits_t.shape
    g = guid_t.shape[-1]
    d = diameter
    assert dd == d * d and hp == h + d - 1 and wp == w + d - 1
    assert dd + g <= 128 and d <= 17

    ht = _HT
    wt = min(_WT, _pad_to(w, 8))
    hpad = _pad_to(h, ht)
    wpad = _pad_to(w, wt)
    n_hb = hpad // ht
    n_wb = wpad // wt
    cp = _pad_to(c, 128)

    inp_t = jnp.pad(inp if nhwc else inp.transpose(0, 2, 3, 1),
                    ((0, 0), (0, (n_hb + 1) * ht - hp),
                     (0, (n_wb - 1) * wt + 128 - wp), (0, cp - c)))
    wcols = (n_wb - 1) * wt + 128
    if slab:
        # full-width row slabs; the kernel slices its 128-wide column window
        # in VMEM (no stack pass, no 128/wt-duplicated HBM reads)
        inp_win = inp_t
        inp_spec_a = pl.BlockSpec((1, ht, wcols, cp),
                                  lambda bi, hi, wi: (bi, hi, 0, 0),
                                  memory_space=pltpu.VMEM)
        inp_spec_b = pl.BlockSpec((1, ht, wcols, cp),
                                  lambda bi, hi, wi: (bi, hi + 1, 0, 0),
                                  memory_space=pltpu.VMEM)
    else:
        inp_win = jnp.stack(
            [inp_t[:, :, i * wt:i * wt + 128] for i in range(n_wb)], axis=2)
        inp_spec_a = pl.BlockSpec((1, ht, 1, 128, cp),
                                  lambda bi, hi, wi: (bi, hi, wi, 0, 0),
                                  memory_space=pltpu.VMEM)
        inp_spec_b = pl.BlockSpec((1, ht, 1, 128, cp),
                                  lambda bi, hi, wi: (bi, hi + 1, wi, 0, 0),
                                  memory_space=pltpu.VMEM)

    logits_p = jnp.pad(logits_t, ((0, 0), (0, hpad - h), (0, wpad - w), (0, 0)))
    guid_p = jnp.pad(guid_t, ((0, 0), (0, hpad - h), (0, wpad - w), (0, 0)))

    cmid = w0.shape[0]
    # weights once, padded to MXU-friendly [128, 128] operands (transposed:
    # the kernel right-multiplies pixel-row blocks)
    w0t = jnp.zeros((128, 128), jnp.float32).at[:dd + g, :cmid].set(
        w0.reshape(cmid, dd + g).T.astype(jnp.float32))
    w1t = jnp.zeros((128, 128), jnp.float32).at[:cmid, :dd].set(
        w1.reshape(dd, cmid).T.astype(jnp.float32))
    b0p = jnp.zeros((1, 128), jnp.float32).at[0, :cmid].set(
        b0.astype(jnp.float32))
    b1p = jnp.zeros((1, 128), jnp.float32).at[0, :dd].set(
        b1.astype(jnp.float32))
    temp = jnp.reshape(pos_temp.astype(jnp.float32), (1,))
    spatial_p = jnp.pad(spatial.astype(jnp.float32).reshape(1, dd),
                        ((0, 0), (0, 128 - dd)))

    kernel = functools.partial(_kernel, diameter=d, ht=ht, wt=wt, dd=dd, g=g,
                               slab=slab)
    out_t = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hpad, n_wb, wt, cp), inp.dtype),
        grid=(b, n_hb, n_wb),
        in_specs=[
            pl.BlockSpec((1, ht, wt, dd),
                         lambda bi, hi, wi: (bi, hi, wi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, wt, g),
                         lambda bi, hi, wi: (bi, hi, wi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda bi, hi, wi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((128, 128), lambda bi, hi, wi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda bi, hi, wi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda bi, hi, wi: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda bi, hi, wi: (0, 0),
                         memory_space=pltpu.VMEM),
            inp_spec_a,
            inp_spec_b,
        ],
        out_specs=pl.BlockSpec((1, ht, 1, wt, cp),
                               lambda bi, hi, wi: (bi, hi, wi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((ht * wt, dd), jnp.bfloat16),
                        pltpu.VMEM((2 * ht * 128, cp), jnp.bfloat16),
                        pltpu.VMEM((wt, d * 128), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(logits_p, guid_p, spatial_p, temp, w0t, b0p, w1t, b1p, inp_win, inp_win)

    out = out_t.reshape(b, hpad, n_wb * wt, cp)[:, :h, :w, :c]
    return out if nhwc else out.transpose(0, 3, 1, 2)


@functools.partial(jax.jit, static_argnames=("diameter", "interpret", "slab"))
def jbu_epilogue_classify_pallas(inp: jnp.ndarray, logits_t: jnp.ndarray,
                                 guid_t: jnp.ndarray, spatial: jnp.ndarray,
                                 pos_temp: jnp.ndarray, w0: jnp.ndarray,
                                 b0: jnp.ndarray, w1: jnp.ndarray,
                                 b1: jnp.ndarray, fixup_w: jnp.ndarray,
                                 fixup_b: jnp.ndarray, query_features: jnp.ndarray,
                                 diameter: int,
                                 interpret: bool = False,
                                 slab: bool = True) -> jnp.ndarray:
    """jbu_epilogue_pallas(nhwc=True) with the pipeline tail fused: the
    final-fixup residual conv, the L2 normalisation and the cosine
    classifier run per output row in VMEM, and the kernel emits
    [B, H, W, Q] fp32 logits instead of [B, H, W, C] features.

    inp: [B, H+d-1, W+d-1, C] (channel-last); fixup_w: [C, C] (+[C] bias)
    final-fixup conv; query_features: [Q, C] L2-normalised text queries,
    Q <= 128. Other args as jbu_epilogue_pallas."""
    b, hp, wp, c = inp.shape
    _, h, w, dd = logits_t.shape
    g = guid_t.shape[-1]
    q = query_features.shape[0]
    d = diameter
    assert dd == d * d and hp == h + d - 1 and wp == w + d - 1
    assert dd + g <= 128 and d <= 17 and q <= 128

    ht = _HT
    wt = min(_WT, _pad_to(w, 8))
    hpad = _pad_to(h, ht)
    wpad = _pad_to(w, wt)
    n_hb = hpad // ht
    n_wb = wpad // wt
    cp = _pad_to(c, 128)

    inp_t = jnp.pad(inp, ((0, 0), (0, (n_hb + 1) * ht - hp),
                          (0, (n_wb - 1) * wt + 128 - wp), (0, cp - c)))
    wcols = (n_wb - 1) * wt + 128
    if slab:
        inp_win = inp_t
        inp_spec_a = pl.BlockSpec((1, ht, wcols, cp),
                                  lambda bi, hi, wi: (bi, hi, 0, 0),
                                  memory_space=pltpu.VMEM)
        inp_spec_b = pl.BlockSpec((1, ht, wcols, cp),
                                  lambda bi, hi, wi: (bi, hi + 1, 0, 0),
                                  memory_space=pltpu.VMEM)
    else:
        inp_win = jnp.stack(
            [inp_t[:, :, i * wt:i * wt + 128] for i in range(n_wb)], axis=2)
        inp_spec_a = pl.BlockSpec((1, ht, 1, 128, cp),
                                  lambda bi, hi, wi: (bi, hi, wi, 0, 0),
                                  memory_space=pltpu.VMEM)
        inp_spec_b = pl.BlockSpec((1, ht, 1, 128, cp),
                                  lambda bi, hi, wi: (bi, hi + 1, wi, 0, 0),
                                  memory_space=pltpu.VMEM)
    logits_p = jnp.pad(logits_t, ((0, 0), (0, hpad - h), (0, wpad - w), (0, 0)))
    guid_p = jnp.pad(guid_t, ((0, 0), (0, hpad - h), (0, wpad - w), (0, 0)))

    cmid = w0.shape[0]
    w0t = jnp.zeros((128, 128), jnp.float32).at[:dd + g, :cmid].set(
        w0.reshape(cmid, dd + g).T.astype(jnp.float32))
    w1t = jnp.zeros((128, 128), jnp.float32).at[:cmid, :dd].set(
        w1.reshape(dd, cmid).T.astype(jnp.float32))
    b0p = jnp.zeros((1, 128), jnp.float32).at[0, :cmid].set(
        b0.astype(jnp.float32))
    b1p = jnp.zeros((1, 128), jnp.float32).at[0, :dd].set(
        b1.astype(jnp.float32))
    temp = jnp.reshape(pos_temp.astype(jnp.float32), (1,))
    spatial_p = jnp.pad(spatial.astype(jnp.float32).reshape(1, dd),
                        ((0, 0), (0, 128 - dd)))
    # tail operands: fixup conv transposed ("oc,pc->po" => y @ w.T), bf16
    # padded to [cp, cp]; queries transposed [cp, 128] bf16 (zero-padded
    # rows/cols contribute nothing)
    fwt = jnp.zeros((cp, cp), jnp.bfloat16).at[:c, :c].set(
        fixup_w.reshape(c, c).T.astype(jnp.bfloat16))
    fbp = jnp.zeros((1, cp), jnp.float32).at[0, :c].set(
        fixup_b.astype(jnp.float32))
    qft = jnp.zeros((cp, 128), jnp.bfloat16).at[:c, :q].set(
        query_features.T.astype(jnp.bfloat16))

    kernel = functools.partial(_kernel_cls, diameter=d, ht=ht, wt=wt, dd=dd,
                               g=g, slab=slab)
    const = lambda bi, hi, wi: (0, 0)  # noqa: E731
    out_t = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hpad, n_wb, wt, 128), jnp.float32),
        grid=(b, n_hb, n_wb),
        in_specs=[
            pl.BlockSpec((1, ht, wt, dd),
                         lambda bi, hi, wi: (bi, hi, wi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, wt, g),
                         lambda bi, hi, wi: (bi, hi, wi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((128, 128), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), const, memory_space=pltpu.VMEM),
            inp_spec_a,
            inp_spec_b,
            pl.BlockSpec((cp, cp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((cp, 128), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, 1, wt, 128),
                               lambda bi, hi, wi: (bi, hi, wi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((ht * wt, dd), jnp.bfloat16),
                        pltpu.VMEM((2 * ht * 128, cp), jnp.bfloat16),
                        pltpu.VMEM((wt, d * 128), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(logits_p, guid_p, spatial_p, temp, w0t, b0p, w1t, b1p, inp_win, inp_win,
      fwt, fbp, qft)

    return out_t.reshape(b, hpad, n_wb * wt, 128)[:, :h, :w, :q]
