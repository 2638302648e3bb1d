"""Pallas TPU adaptive-conv v4: W-chunked banded-matrix matmuls on the MXU.

Same math as v1/v2/v3 (the JBU inner loop, reference
simfeatup_dev/upsamplers.py:14-25):

    out[b, c, h, w] = sum_{u,v} filt[b, u*d+v, h, w] * inp[b, c, h+u, w+v]

v3 maps the tap contraction over v onto the MXU as one banded matmul per
(output row, window row): [W, Wp] @ [Wp, C] where Wp = pad128(W + d - 1).
The band is only d wide, so the useful-flop density is d/Wp — 3.1% at the
production 224^2 stage (Wp = 352).  v4 chunks the output-width axis into
blocks of WT = 112 so every matmul is [WT, 128] @ [128, C]: the band row j
needs input columns [j, j + d) with j < 112, j + d - 1 <= 121 < 128, so a
K = 128 window of the input row always covers the chunk.  Issued flops drop
2.75x at 224^2 (and are unchanged for W <= 118, where v3 already has
Wp = 128).

The overlapping K-windows (stride WT, width 128) are materialised once in
XLA as a [B, rows, n_wb, 128, C] tensor — a 128/WT ~ 1.14x copy of the
*input*, which is d*d/C ~ 4x smaller than the filter tensor; the banded
matrix itself still never exists outside VMEM.  The row halo keeps v3's
dual-ref trick (input passed at block indices hi and hi+1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["adaptive_conv_pallas_v4"]

_HT = 16   # output rows per grid step (>= d-1 so the halo spans <= 2 blocks)
_WT = 112  # output cols per grid step (WT + d - 1 <= 128 for d <= 17)


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(filt_ref, inpa_ref, inpb_ref, out_ref, acc_ref,
            *, diameter: int, ht: int, wt: int):
    d = diameter
    u = pl.program_id(3)

    @pl.when(u == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for i in range(ht):
        # banded matrix for output row i, window row u: one strided roll
        slab = filt_ref[0, 0, i, 0, :, :].astype(jnp.float32)  # [WT, d]
        slab = jnp.pad(slab, ((0, 0), (0, 128 - d)))           # [WT, 128]
        m = pltpu.roll(slab, 0, axis=1, stride=1, stride_axis=0)
        mb = m.astype(jnp.bfloat16)

        # input row i+u lives in this row block (row < ht) or the next one
        row = i + u

        def _lo(r=row):
            return inpa_ref[0, jnp.minimum(r, ht - 1), 0]

        def _hi(r=row):
            return inpb_ref[0, jnp.clip(r - ht, 0, ht - 1), 0]

        a = jax.lax.cond(row < ht, _lo, _hi)                   # [128, C]
        acc_ref[i] = acc_ref[i] + jax.lax.dot_general(
            mb, a.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(u == d - 1)
    def _():
        out_ref[0, :, 0] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("diameter", "interpret"))
def adaptive_conv_pallas_v4(inp: jnp.ndarray, filt_t: jnp.ndarray,
                            diameter: int,
                            interpret: bool = False) -> jnp.ndarray:
    """inp: [B, C, H+d-1, W+d-1]; filt_t: [B, d*d, H, W] tap-major
    (the layout the JBU range-kernel pipeline produces) -> [B, C, H, W]."""
    b, c, hp, wp = inp.shape
    _, dd, h, w = filt_t.shape
    d = diameter
    assert dd == d * d and hp == h + d - 1 and wp == w + d - 1
    assert d <= 17, "WT + d - 1 must fit the 128-lane K window"

    ht = _HT
    wt = min(_WT, _pad_to(w, 8))
    hpad = _pad_to(h, ht)
    wpad = _pad_to(w, wt)
    n_hb = hpad // ht
    n_wb = wpad // wt
    cp = _pad_to(c, 128)

    # [B, C, Hp, Wp] -> [B, rows, Wx, C], rows padded to (n_hb + 1) blocks so
    # the halo ref's block index hi+1 stays in range; cols padded so the last
    # K-window [(n_wb-1)*wt, (n_wb-1)*wt + 128) is in range
    inp_t = jnp.pad(inp.transpose(0, 2, 3, 1),
                    ((0, 0), (0, (n_hb + 1) * ht - hp),
                     (0, (n_wb - 1) * wt + 128 - wp), (0, cp - c)))
    # overlapping K-windows: [B, rows, n_wb, 128, C]
    inp_win = jnp.stack([inp_t[:, :, i * wt:i * wt + 128] for i in range(n_wb)],
                        axis=2)

    # [B, d*d, H, W] -> [B, u, H, n_wb, WT, v] compact tap slabs
    filt5 = filt_t.reshape(b, d, d, h, w).transpose(0, 1, 3, 4, 2)
    filt5 = jnp.pad(filt5, ((0, 0), (0, 0), (0, hpad - h),
                            (0, wpad - w), (0, 0)))
    filt6 = filt5.reshape(b, d, hpad, n_wb, wt, d)

    kernel = functools.partial(_kernel, diameter=d, ht=ht, wt=wt)
    out_t = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hpad, n_wb, wt, cp), inp.dtype),
        grid=(b, n_hb, n_wb, d),
        in_specs=[
            pl.BlockSpec((1, 1, ht, 1, wt, d),
                         lambda bi, hi, wi, u: (bi, u, hi, wi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, 1, 128, cp),
                         lambda bi, hi, wi, u: (bi, hi, wi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, 1, 128, cp),
                         lambda bi, hi, wi, u: (bi, hi + 1, wi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, 1, wt, cp),
                               lambda bi, hi, wi, u: (bi, hi, wi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((ht, wt, cp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(filt6, inp_win, inp_win)

    out = out_t.reshape(b, hpad, n_wb * wt, cp)
    return out[:, :h, :w, :c].transpose(0, 3, 1, 2)
