"""Pallas TPU adaptive-conv v2: grid-pipelined filter-row streaming.

Same math as rs_ov.kernels.adaptive_conv (the JBU inner loop, reference
simfeatup_dev/upsamplers.py:14-25):

    out[b, c, h, w] = sum_{u,v} filt[b, u*d+v, h, w] * inp[b, c, h+u, w+v]

v1 moves every filter tap plane with a manual double-buffered DMA and
round-trips the fp32 accumulator through VMEM scratch once per tap.  That
is DMA-latency bound at the small JBU stages (121 waits per program) and
VMEM-bandwidth bound at the big ones (3 accumulator accesses per tap).

v2 adds a window-row grid axis: grid step (b, c_block, u) convolves the d
taps of window row u, with the d-tap filter slab streamed through the
normal BlockSpec pipeline (Mosaic double-buffers and overlaps the copies
with compute for free).  The input block's index map ignores the row axis,
so Pallas's revisiting optimisation fetches it once per (batch,
channel-block); the fp32 accumulator lives in scratch across row steps and
is updated once per _CHUNK taps (multiply-adds in between stay a short
expression — Mosaic allocates a VMEM stack temp per expression term, so
_CHUNK bounds the stack while cutting accumulator round-trips).

A fully-static 121-tap-unrolled variant was measured and rejected: it runs
SLOWER than this kernel at every production shape (e.g. 5.0-7.5 ms vs
2.65 ms at the 56^2 stage, B=2) and its Mosaic compile takes 10+ minutes
per shape vs ~10 s here (measured 2026-08-16 on v5e).

Measured (v5e, C=512, d=11, bf16) per-stage vs the v1 kernel:
  B=2  (production tile chunk):  28^2 2.1 vs 3.2 ms · 56^2 2.7 vs 3.9 ·
                                 112^2 3.4 vs 4.1 · 224^2 12.9 vs 13.8
  B=16 (whole 512^2 image):      28^2 7.3 vs 8.6 · 56^2 10.8 vs 13.7 ·
                                 112^2 19.2 vs 24.5 · 224^2 88.6 vs 96.3
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["adaptive_conv_pallas_v2"]

_CHUNK = 4  # taps per accumulator update (bounds Mosaic stack temps)
# v5e has 128 MiB VMEM; Pallas's default 16 MiB scoped limit needlessly
# forces tiny channel blocks — raise it and size blocks to the real budget
_VMEM_LIMIT = int(_os.environ.get("RS_OV_ACONV_VMEM", str(100 * 1024 * 1024)))
_BUDGET = int(_os.environ.get("RS_OV_ACONV_BUDGET", str(12 * 1024 * 1024)))


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


def _kernel_rowstream(filt_ref, inp_ref, out_ref, acc_ref,
                      *, diameter: int, h: int, w: int, hp: int):
    """One grid step per window row u: d-tap filter slabs stream through
    the pipeline."""
    u = pl.program_id(2)

    @pl.when(u == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # dynamic sublane start (u): Mosaic can't prove alignment for a dynamic
    # vector.load offset, so rotate the block (tpu.dynamic_rotate — 32-bit
    # only, non-negative shift, and the fp32 cast is hoisted out of the tap
    # loop anyway) and take a static slice — one extra pass per row.
    # roll(x, hp-u)[i] = x[(i+u) mod hp]; i+u <= h-1+d-1 < hp, no wraparound.
    rows = pltpu.roll(inp_ref[0].astype(jnp.float32), hp - u, axis=1)[:, :h, :]

    # acc += sum over the row's taps, flushing to scratch every _CHUNK terms
    pending = None
    n = 0
    for v in range(diameter):
        tap = filt_ref[0, v, :h, :w].astype(jnp.float32)
        term = tap[None, :, :] * rows[:, :, v:v + w]
        pending = term if pending is None else pending + term
        n += 1
        if n == _CHUNK:
            acc_ref[:] = acc_ref[:] + pending
            pending, n = None, 0
    if pending is not None:
        acc_ref[:] = acc_ref[:] + pending

    @pl.when(u == diameter - 1)
    def _():
        out_ref[0] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("diameter", "interpret"))
def adaptive_conv_pallas_v2(inp: jnp.ndarray, filt_t: jnp.ndarray,
                            diameter: int,
                            interpret: bool = False) -> jnp.ndarray:
    """inp: [B, C, H+d-1, W+d-1]; filt_t: [B, d*d, H, W] tap-major
    (the layout the JBU range-kernel pipeline produces) -> [B, C, H, W]."""
    b, c, hp, wp = inp.shape
    _, dd, h, w = filt_t.shape
    d = diameter
    assert dd == d * d and hp == h + d - 1 and wp == w + d - 1

    hpad, wpad = _pad8(h), _pad128(w)
    if (hpad, wpad) != (h, w):
        filt_t = jnp.pad(filt_t, ((0, 0), (0, 0), (0, hpad - h), (0, wpad - w)))

    # the in-kernel rotate (tpu.dynamic_rotate) needs (8, 128)-tile-aligned
    # vector shapes — pad the input block's spatial dims
    hp2, wp2 = _pad8(hp), _pad128(wp)
    if (hp2, wp2) != (hp, wp):
        inp = jnp.pad(inp, ((0, 0), (0, 0), (0, hp2 - hp), (0, wp2 - wp)))

    fsz = filt_t.dtype.itemsize
    isz = inp.dtype.itemsize
    plane = hpad * wpad              # padded tap-plane elements
    oplane = _pad8(h) * _pad128(w)   # padded output-plane elements

    def footprint(cb):
        return (2 * cb * hp2 * wp2 * isz                 # inp block x2
                + 4 * cb * hp2 * wp2                     # fp32 rotated rows
                + 2 * cb * oplane * isz                  # out block x2
                + 4 * cb * oplane                        # fp32 acc scratch
                + 4 * (_CHUNK + 1) * cb * oplane         # expression temps
                + 2 * d * plane * fsz)                   # filt slab x2

    c_block = c
    while c_block > 8 and (c % c_block != 0 or footprint(c_block) > _BUDGET):
        c_block //= 2

    kernel = functools.partial(_kernel_rowstream, diameter=d, h=h, w=w, hp=hp2)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), inp.dtype),
        grid=(b, c // c_block, d),
        in_specs=[
            pl.BlockSpec((1, d, hpad, wpad), lambda bi, ci, gi: (bi, gi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_block, hp2, wp2),
                         lambda bi, ci, gi: (bi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_block, h, w),
                               lambda bi, ci, gi: (bi, ci, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((c_block, h, w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(filt_t, inp)
