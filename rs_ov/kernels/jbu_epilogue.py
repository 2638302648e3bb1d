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

__all__ = ["jbu_epilogue_pallas", "jbu_epilogue_classify_pallas",
           "jbu_epilogue_fused_pallas", "jbu_epilogue_fused_classify_pallas"]

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


def _conv_rows(comb_ref, x_ref, band_ref, *, d: int, ht: int, wt: int, emit,
               rows: int = 1):
    """The v5 concat-K banded adaptive conv: one [WT, d*128] @ [d*128, C]
    MXU matmul per output row; `emit(i, y)` consumes each fp32 [WT, C] row.

    rows=R>1 stacks R output rows into ONE issue (VERDICT r3 #4 — attack
    per-row MXU issue serialization): row stripe j occupies band columns
    [(j)*128, (j+d)*128) of a [R*WT, (d+R-1)*128] operand against the
    shared K window x[i : i+d+R-1], i.e. R x fewer issues for
    (d+R-1)/d more issued (zero-padded) flops per row."""
    kb = d + rows - 1  # K blocks per issue
    if rows > 1:
        # zero the off-diagonal stripes once per invocation (each i-step
        # rewrites exactly the same tap blocks, so these stay authoritative)
        for j in range(rows):
            if j:
                band_ref[j * wt:(j + 1) * wt, :j * 128] = jnp.zeros(
                    (wt, j * 128), jnp.bfloat16)
            if j < rows - 1:
                band_ref[j * wt:(j + 1) * wt, (j + d) * 128:] = jnp.zeros(
                    (wt, (rows - 1 - j) * 128), jnp.bfloat16)
    for i in range(0, ht, rows):
        for j in range(rows):
            for u in range(d):
                slab = comb_ref[(i + j) * wt:(i + j + 1) * wt,
                                u * d:(u + 1) * d]
                slab = jnp.pad(slab.astype(jnp.float32),
                               ((0, 0), (0, 128 - d)))
                m = pltpu.roll(slab, 0, axis=1, stride=1, stride_axis=0)
                band_ref[j * wt:(j + 1) * wt,
                         (j + u) * 128:(j + u + 1) * 128] = m.astype(jnp.bfloat16)
        res = jax.lax.dot_general(
            band_ref[:], x_ref[i * 128:(i + kb) * 128],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for j in range(rows):
            emit(i + j, res[j * wt:(j + 1) * wt])


def _cls_tail(y, fw_ref, fb_ref, qf_ref):
    """Per-row pipeline tail: final-fixup residual conv (incl. its casts,
    upsample/jbu._final_fixup_nhwc math), fp32 L2 normalisation, bf16
    cosine-classifier matmul with fp32 accumulation."""
    yb = y.astype(jnp.bfloat16)
    fx2 = jax.lax.dot_general(yb, fw_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    res = ((fx2 + fb_ref[0]) * 0.1).astype(jnp.bfloat16) + yb
    r32 = res.astype(jnp.float32)
    inv = jax.lax.rsqrt(
        jnp.maximum(jnp.sum(r32 * r32, axis=-1, keepdims=True), 1e-24))
    rb = (r32 * inv).astype(jnp.bfloat16)
    return jax.lax.dot_general(rb, qf_ref[:], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel(logits_ref, guid_ref, spatial_ref, temp_ref, w0_ref, b0_ref,
            w1_ref, b1_ref, inpa_ref, inpb_ref, out_ref,
            comb_ref, x_ref, band_ref, *, diameter: int, ht: int, wt: int,
            dd: int, g: int, slab: bool = False, rows: int = 1):
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

    def emit(i, y):
        out_ref[0, i, 0] = y.astype(out_ref.dtype)

    _conv_rows(comb_ref, x_ref, band_ref, d=d, ht=ht, wt=wt, emit=emit,
               rows=rows)


def _kernel_cls(logits_ref, guid_ref, spatial_ref, temp_ref, w0_ref, b0_ref,
                w1_ref, b1_ref, inpa_ref, inpb_ref, fw_ref, fb_ref, qf_ref,
                out_ref, comb_ref, x_ref, band_ref, *, diameter: int, ht: int,
                wt: int, dd: int, g: int, slab: bool = False, rows: int = 1):
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

    def emit(i, y):
        out_ref[0, i, 0] = _cls_tail(y, fw_ref, fb_ref, qf_ref)

    _conv_rows(comb_ref, x_ref, band_ref, d=d, ht=ht, wt=wt, emit=emit,
               rows=rows)


@functools.partial(jax.jit,
                   static_argnames=("diameter", "interpret", "nhwc", "slab",
                                    "rows"))
def jbu_epilogue_pallas(inp: jnp.ndarray, logits_t: jnp.ndarray,
                        guid_t: jnp.ndarray, spatial: jnp.ndarray,
                        pos_temp: jnp.ndarray, w0: jnp.ndarray,
                        b0: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                        diameter: int, interpret: bool = False,
                        nhwc: bool = False, slab: bool = True,
                        rows: int = 1) -> jnp.ndarray:
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

    assert ht % rows == 0
    kernel = functools.partial(_kernel, diameter=d, ht=ht, wt=wt, dd=dd, g=g,
                               slab=slab, rows=rows)
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
                        pltpu.VMEM((rows * wt, (d + rows - 1) * 128),
                                   jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(logits_p, guid_p, spatial_p, temp, w0t, b0p, w1t, b1p, inp_win, inp_win)

    out = out_t.reshape(b, hpad, n_wb * wt, cp)[:, :h, :w, :c]
    return out if nhwc else out.transpose(0, 3, 1, 2)


@functools.partial(jax.jit,
                   static_argnames=("diameter", "interpret", "slab", "rows"))
def jbu_epilogue_classify_pallas(inp: jnp.ndarray, logits_t: jnp.ndarray,
                                 guid_t: jnp.ndarray, spatial: jnp.ndarray,
                                 pos_temp: jnp.ndarray, w0: jnp.ndarray,
                                 b0: jnp.ndarray, w1: jnp.ndarray,
                                 b1: jnp.ndarray, fixup_w: jnp.ndarray,
                                 fixup_b: jnp.ndarray, query_features: jnp.ndarray,
                                 diameter: int,
                                 interpret: bool = False,
                                 slab: bool = True,
                                 rows: int = 1) -> jnp.ndarray:
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

    assert ht % rows == 0
    kernel = functools.partial(_kernel_cls, diameter=d, ht=ht, wt=wt, dd=dd,
                               g=g, slab=slab, rows=rows)
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
                        pltpu.VMEM((rows * wt, (d + rows - 1) * 128),
                                   jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(logits_p, guid_p, spatial_p, temp, w0t, b0p, w1t, b1p, inp_win, inp_win,
      fwt, fbp, qft)

    return out_t.reshape(b, hpad, n_wb * wt, 128)[:, :h, :w, :q]


# ---------------------------------------------------------------------------
# fully fused stage: range logits computed IN-kernel (2-D halo on the
# guidance projection) — the [B, d^2, H, W] fp32 logits tensor, its HBM
# round-trip, its pixel-major transpose, and both reflect-pad passes all
# disappear (reference ops replaced: simfeatup_dev/upsamplers.py:230-274).
#
# MEASURED SLOWER than the split path on v5e (0.747x per chunk, 0/24 trial
# wins): the d^2 tap dot-products lower to VPU elementwise-reduce loops
# here, while the standalone range_logits kernel runs them as MXU matmuls —
# the saved HBM traffic doesn't cover the compute regression. Kept opt-in
# (RS_OV_JBU_FUSED_RANGE=1) and correctness-tested; see benchmarks/PERF.md.
# ---------------------------------------------------------------------------

def _range_front(proja_ref, projb_ref, guid_ref, sp_ref, temp_ref, w0_ref,
                 b0_ref, w1_ref, b1_ref, comb_ref, pwin_ref, lg_ref, xm_ref,
                 *, d: int, ht: int, wt: int, dd: int, g: int):
    """Compute comb' (the fixed-up combined kernel) into comb_ref [ht*wt, dd]
    from the raw range projection.

    Tap-major layout trick: logits live [taps, ht, wt] (tap t = u*d+v written
    as a natural [ht, wt] plane), the softmax/normalise are axis-0
    elementwise reductions, the fixup 1x1 convs are per-row [128,128] @
    [128, wt] MXU matmuls, and one [dd, wt] transpose per output row lands
    comb' in the pixel-major layout the banded conv consumes."""
    r = (d - 1) // 2
    off = pl.program_id(2) * wt
    # 2*ht x 128 halo'd projection window (rows carry the r-halo via the
    # dual-ref trick, columns via the wt+2r <= 128 slice)
    pwin_ref[:ht] = proja_ref[0, :, pl.ds(off, 128), :]
    pwin_ref[ht:] = projb_ref[0, :, pl.ds(off, 128), :]
    # guidance arrives window-prestacked [1, 1, g, ht, wt] (stacking the tiny
    # 3-channel tensor in XLA keeps the block's last dim == the array's,
    # satisfying the (8,128) tiling rule a wt-wide slice would break)
    guid_blk = guid_ref[0, 0]
    center = pwin_ref[r:r + ht, r:r + wt, :]
    for u in range(d):
        for v in range(d):
            sh = pwin_ref[u:u + ht, v:v + wt, :]
            lg_ref[u * d + v] = jnp.sum(center * sh, axis=-1)
    s = lg_ref[:dd] * temp_ref[0]
    mx = jnp.max(s, axis=0, keepdims=True)
    e = jnp.exp(s - mx)
    rk = e / jnp.sum(e, axis=0, keepdims=True)
    comb = rk * sp_ref[:dd, :wt][:, None, :]
    comb = comb / jnp.clip(jnp.sum(comb, axis=0, keepdims=True), 1e-7, None)
    # fixup projection (tap-major: mid = W0 @ x per row block); the
    # comb -> guidance-dtype cast matches the XLA path's concat cast
    xm_ref[:dd] = comb.astype(guid_ref.dtype).astype(jnp.float32)
    xm_ref[dd:dd + g] = guid_blk.astype(jnp.float32)
    xm_ref[dd + g:] = jnp.zeros((128 - dd - g, ht, wt), jnp.float32)
    for i in range(ht):
        xi = xm_ref[:, i, :]
        mid = _gelu_exact(
            jax.lax.dot_general(w0_ref[:], xi, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + b0_ref[:, 0:1])
        fix = jax.lax.dot_general(w1_ref[:], mid, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32) + b1_ref[:, 0:1]
        ci = comb[:, i, :] + 0.1 * fix[:dd]
        comb_ref[i * wt:(i + 1) * wt, :] = ci.T.astype(jnp.bfloat16)


def _kernel_fr(proja_ref, projb_ref, guid_ref, sp_ref, temp_ref, w0_ref,
               b0_ref, w1_ref, b1_ref, inpa_ref, inpb_ref, out_ref,
               comb_ref, x_ref, band_ref, pwin_ref, lg_ref, xm_ref, *,
               diameter: int, ht: int, wt: int, dd: int, g: int):
    _range_front(proja_ref, projb_ref, guid_ref, sp_ref, temp_ref, w0_ref,
                 b0_ref, w1_ref, b1_ref, comb_ref, pwin_ref, lg_ref, xm_ref,
                 d=diameter, ht=ht, wt=wt, dd=dd, g=g)
    _fill_x(x_ref, inpa_ref, inpb_ref, ht=ht, wt=wt, slab=True)

    def emit(i, y):
        out_ref[0, i, 0] = y.astype(out_ref.dtype)

    _conv_rows(comb_ref, x_ref, band_ref, d=diameter, ht=ht, wt=wt, emit=emit)


def _kernel_fr_cls(proja_ref, projb_ref, guid_ref, sp_ref, temp_ref, w0_ref,
                   b0_ref, w1_ref, b1_ref, inpa_ref, inpb_ref, fw_ref, fb_ref,
                   qf_ref, out_ref, comb_ref, x_ref, band_ref, pwin_ref,
                   lg_ref, xm_ref, *, diameter: int, ht: int, wt: int,
                   dd: int, g: int):
    _range_front(proja_ref, projb_ref, guid_ref, sp_ref, temp_ref, w0_ref,
                 b0_ref, w1_ref, b1_ref, comb_ref, pwin_ref, lg_ref, xm_ref,
                 d=diameter, ht=ht, wt=wt, dd=dd, g=g)
    _fill_x(x_ref, inpa_ref, inpb_ref, ht=ht, wt=wt, slab=True)

    def emit(i, y):
        out_ref[0, i, 0] = _cls_tail(y, fw_ref, fb_ref, qf_ref)

    _conv_rows(comb_ref, x_ref, band_ref, d=diameter, ht=ht, wt=wt, emit=emit)


def _pad_reflect_block(x: jnp.ndarray, r: int, rows_total: int,
                       cols_total: int) -> jnp.ndarray:
    """Reflect-pad H/W of [B, H, W, C] by r and zero-extend to the block
    grid — ONE XLA pad when the extended amounts are reflect-legal
    (pad < dim; the dead zone then holds reflected data instead of zeros,
    which only ever feeds cropped outputs), else two."""
    h, w = x.shape[1], x.shape[2]
    bot = rows_total - h - r
    right = cols_total - w - r
    if 0 <= bot <= h - 1 and 0 <= right <= w - 1:
        return jnp.pad(x, ((0, 0), (r, bot), (r, right), (0, 0)),
                       mode="reflect")
    xr = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)), mode="reflect")
    return jnp.pad(xr, ((0, 0), (0, bot - r), (0, right - r), (0, 0)))


def _fused_operands(inp, proj, guid_cf, spatial, pos_temp, w0, b0, w1, b1,
                    diameter):
    """Shared operand/spec construction for the fused-range wrappers."""
    b, h, w, c = inp.shape
    k = proj.shape[-1]
    g = guid_cf.shape[1]
    d = diameter
    dd = d * d
    assert dd + g <= 128 and d <= 17 and d % 2 == 1 and k <= 128
    ht = _HT
    wt = min(_WT, _pad_to(w, 8))
    assert wt + d - 1 <= 128 and 2 * (d // 2) <= ht
    hpad = _pad_to(h, ht)
    wpad = _pad_to(w, wt)
    n_hb = hpad // ht
    n_wb = wpad // wt
    cp = _pad_to(c, 128)
    rows_total = (n_hb + 1) * ht
    wcols = (n_wb - 1) * wt + 128
    r = d // 2

    inp_t = _pad_reflect_block(inp, r, rows_total, wcols)
    if cp != c:
        inp_t = jnp.pad(inp_t, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
    proj_t = _pad_reflect_block(proj.astype(jnp.float32), r, rows_total, wcols)
    guid_p = jnp.pad(guid_cf, ((0, 0), (0, 0), (0, hpad - h), (0, wpad - w)))
    guid_win = jnp.stack([guid_p[:, :, :, i * wt:(i + 1) * wt]
                          for i in range(n_wb)], axis=1)

    cmid = w0.shape[0]
    w0p = jnp.zeros((128, 128), jnp.float32).at[:cmid, :dd + g].set(
        w0.reshape(cmid, dd + g).astype(jnp.float32))
    w1p = jnp.zeros((128, 128), jnp.float32).at[:dd, :cmid].set(
        w1.reshape(dd, cmid).astype(jnp.float32))
    b0p = jnp.zeros((128, 1), jnp.float32).at[:cmid, 0].set(
        b0.astype(jnp.float32))
    b1p = jnp.zeros((128, 1), jnp.float32).at[:dd, 0].set(
        b1.astype(jnp.float32))
    temp = jnp.reshape(pos_temp.astype(jnp.float32), (1,))
    sp2d = jnp.broadcast_to(
        jnp.pad(spatial.astype(jnp.float32).reshape(dd, 1),
                ((0, 128 - dd), (0, 0))), (128, 128))

    const = lambda bi, hi, wi: (0, 0)  # noqa: E731
    specs = [
        pl.BlockSpec((1, ht, wcols, k), lambda bi, hi, wi: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ht, wcols, k), lambda bi, hi, wi: (bi, hi + 1, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, g, ht, wt), lambda bi, hi, wi: (bi, wi, 0, hi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((128, 128), const, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((128, 128), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((128, 1), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((128, 128), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((128, 1), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ht, wcols, cp), lambda bi, hi, wi: (bi, hi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ht, wcols, cp), lambda bi, hi, wi: (bi, hi + 1, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    scratch = [pltpu.VMEM((ht * wt, dd), jnp.bfloat16),
               pltpu.VMEM((2 * ht * 128, cp), jnp.bfloat16),
               pltpu.VMEM((wt, d * 128), jnp.bfloat16),
               pltpu.VMEM((2 * ht, 128, k), jnp.float32),
               pltpu.VMEM((128, ht, wt), jnp.float32),
               pltpu.VMEM((128, ht, wt), jnp.float32)]
    operands = (proj_t, proj_t, guid_win, sp2d, temp, w0p, b0p, w1p, b1p,
                inp_t, inp_t)
    dims = dict(b=b, h=h, w=w, c=c, g=g, dd=dd, ht=ht, wt=wt, hpad=hpad,
                n_hb=n_hb, n_wb=n_wb, cp=cp)
    return operands, specs, scratch, dims


@functools.partial(jax.jit, static_argnames=("diameter", "interpret"))
def jbu_epilogue_fused_pallas(inp: jnp.ndarray, proj: jnp.ndarray,
                              guid_cf: jnp.ndarray, spatial: jnp.ndarray,
                              pos_temp: jnp.ndarray, w0: jnp.ndarray,
                              b0: jnp.ndarray, w1: jnp.ndarray,
                              b1: jnp.ndarray, diameter: int,
                              interpret: bool = False) -> jnp.ndarray:
    """One fully fused JBU stage. inp: [B, H, W, C] UNpadded bicubic hr
    source (channel-last); proj: [B, H, W, K] UNpadded range projection
    (pixel-major, K <= 128); guid_cf: [B, G, H, W] guidance CHANNEL-FIRST
    (no transpose needed — it rides the kernel tap-major). Reflect padding
    of inp and proj happens inside. Other args as jbu_epilogue_pallas.
    -> [B, H, W, C] in inp dtype."""
    operands, specs, scratch, dm = _fused_operands(
        inp, proj, guid_cf, spatial, pos_temp, w0, b0, w1, b1, diameter)
    kernel = functools.partial(_kernel_fr, diameter=diameter, ht=dm["ht"],
                               wt=dm["wt"], dd=dm["dd"], g=dm["g"])
    out_t = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (dm["b"], dm["hpad"], dm["n_wb"], dm["wt"], dm["cp"]), inp.dtype),
        grid=(dm["b"], dm["n_hb"], dm["n_wb"]),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, dm["ht"], 1, dm["wt"], dm["cp"]),
                               lambda bi, hi, wi: (bi, hi, wi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return out_t.reshape(dm["b"], dm["hpad"], dm["n_wb"] * dm["wt"],
                         dm["cp"])[:, :dm["h"], :dm["w"], :dm["c"]]


@functools.partial(jax.jit, static_argnames=("diameter", "interpret"))
def jbu_epilogue_fused_classify_pallas(
        inp: jnp.ndarray, proj: jnp.ndarray, guid_cf: jnp.ndarray,
        spatial: jnp.ndarray, pos_temp: jnp.ndarray, w0: jnp.ndarray,
        b0: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
        fixup_w: jnp.ndarray, fixup_b: jnp.ndarray,
        query_features: jnp.ndarray, diameter: int,
        interpret: bool = False) -> jnp.ndarray:
    """jbu_epilogue_fused_pallas + the pipeline tail (final-fixup conv, L2
    norm, cosine classifier) per output row -> [B, H, W, Q<=128] fp32."""
    operands, specs, scratch, dm = _fused_operands(
        inp, proj, guid_cf, spatial, pos_temp, w0, b0, w1, b1, diameter)
    c, cp = dm["c"], dm["cp"]
    q = query_features.shape[0]
    assert q <= 128
    fwt = jnp.zeros((cp, cp), jnp.bfloat16).at[:c, :c].set(
        fixup_w.reshape(c, c).T.astype(jnp.bfloat16))
    fbp = jnp.zeros((1, cp), jnp.float32).at[0, :c].set(
        fixup_b.astype(jnp.float32))
    qft = jnp.zeros((cp, 128), jnp.bfloat16).at[:c, :q].set(
        query_features.T.astype(jnp.bfloat16))
    const = lambda bi, hi, wi: (0, 0)  # noqa: E731
    specs = specs + [
        pl.BlockSpec((cp, cp), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cp), const, memory_space=pltpu.VMEM),
        pl.BlockSpec((cp, 128), const, memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(_kernel_fr_cls, diameter=diameter, ht=dm["ht"],
                               wt=dm["wt"], dd=dm["dd"], g=dm["g"])
    out_t = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (dm["b"], dm["hpad"], dm["n_wb"], dm["wt"], 128), jnp.float32),
        grid=(dm["b"], dm["n_hb"], dm["n_wb"]),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, dm["ht"], 1, dm["wt"], 128),
                               lambda bi, hi, wi: (bi, hi, wi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands, fwt, fbp, qft)
    return out_t.reshape(dm["b"], dm["hpad"], dm["n_wb"] * dm["wt"],
                         128)[:, :dm["h"], :dm["w"], :q]
