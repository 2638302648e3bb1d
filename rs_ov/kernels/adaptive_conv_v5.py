"""Pallas TPU adaptive-conv v5: concat-K banded matmuls — one MXU issue per
output row.

Same math as v1-v4 (the JBU inner loop, reference
simfeatup_dev/upsamplers.py:14-25):

    out[b, c, h, w] = sum_{u,v} filt[b, u*d+v, h, w] * inp[b, c, h+u, w+v]

v4 (W-chunked bands, K=128) issues one [WT, 128] @ [128, C] matmul per
(output row, window row): 78k matmuls at the production B=16 224^2 stage,
~420 ns apiece — ISSUE-RATE bound, so its 2.75x flop reduction over v3
bought only 1.18x.  v5 stacks the d window-rows along the contraction dim:

    out_row_i = [M_0 | M_1 | ... | M_{d-1}] @ concat_u(x_{i+u})
              = [WT, d*128] @ [d*128, C]

one matmul per output row — d x fewer issues, same issued flops.  Because
the window-row loop now lives INSIDE the kernel, the grid has no reduction
axis: i and u are Python-static, the halo pick (row block hi vs hi+1) is
resolved at trace time with zero conditionals, and the fp32 accumulator
scratch disappears (a row's full tap sum happens inside one dot).

Band construction is unchanged from v3/v4: each [WT, 128] banded block is
built in VMEM with one strided ``pltpu.roll`` (row j shifted right by j)
from the compact [WT, d] tap slab — fp32, then cast to bf16 for the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["adaptive_conv_pallas_v5"]

_HT = 16   # output rows per grid step (>= d-1 so the halo spans <= 2 blocks)
_WT = 112  # output cols per grid step (WT + d - 1 <= 128 for d <= 17)


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(filt_ref, inpa_ref, inpb_ref, out_ref, x_ref, band_ref,
            *, diameter: int, ht: int, wt: int):
    d = diameter
    # stage the row block + halo ONCE as a flat [2*ht*128, C] K-buffer; each
    # output row's operand is then a static slice (rows overlap between
    # consecutive i — concatenating per row would recopy everything d times)
    x_ref[:ht * 128] = inpa_ref[0, :, 0].reshape(ht * 128, -1).astype(jnp.bfloat16)
    x_ref[ht * 128:] = inpb_ref[0, :, 0].reshape(ht * 128, -1).astype(jnp.bfloat16)
    for i in range(ht):
        for u in range(d):
            slab = filt_ref[0, u, i, 0].astype(jnp.float32)   # [WT, d]
            slab = jnp.pad(slab, ((0, 0), (0, 128 - d)))      # [WT, 128]
            m = pltpu.roll(slab, 0, axis=1, stride=1, stride_axis=0)
            band_ref[:, u * 128:(u + 1) * 128] = m.astype(jnp.bfloat16)
        out_ref[0, i, 0] = jax.lax.dot_general(
            band_ref[:], x_ref[i * 128:(i + d) * 128],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("diameter", "interpret"))
def adaptive_conv_pallas_v5(inp: jnp.ndarray, filt_t: jnp.ndarray,
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
        grid=(b, n_hb, n_wb),
        in_specs=[
            pl.BlockSpec((1, d, ht, 1, wt, d),
                         lambda bi, hi, wi: (bi, 0, hi, wi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, 1, 128, cp),
                         lambda bi, hi, wi: (bi, hi, wi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, 1, 128, cp),
                         lambda bi, hi, wi: (bi, hi + 1, wi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, 1, wt, cp),
                               lambda bi, hi, wi: (bi, hi, wi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * ht * 128, cp), jnp.bfloat16),
                        pltpu.VMEM((wt, d * 128), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(filt6, inp_win, inp_win)

    out = out_t.reshape(b, hpad, n_wb * wt, cp)
    return out[:, :h, :w, :c].transpose(0, 3, 1, 2)
