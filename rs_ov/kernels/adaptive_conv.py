"""Pallas TPU kernel: spatially-varying (adaptive) convolution.

The JBU inner loop (reference simfeatup_dev/upsamplers.py:274 calls the
external ``featup`` CUDA op; math = adaptive_conv_py_simple :14-25):

    out[b, c, h, w] = sum_{u,v} filters[b, h, w, u, v] * inp[b, c, h+u, w+v]

The XLA formulation (rs_ov.upsample.jbu.adaptive_conv) re-reads the input
d^2 (=121 for radius 5) times from HBM. This kernel DMAs one overlapping
(channel-block x row-tile) window of the input into VMEM and performs all
d^2 shifted multiply-accumulates on-chip — input bytes cross HBM once per
(C-block, row-tile), an ~d^2x cut in traffic on the hottest non-attention op.

Windows overlap between row-tiles, which BlockSpecs cannot express, so the
operands stay in HBM (memory_space=ANY) and the kernel runs its own async
copies (guide: Async DMA / run_scoped patterns).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["adaptive_conv_pallas"]


def _pick_tiles(c: int, h: int, wp: int, w: int, d: int):
    c_block = c
    while c_block > 8 and c % c_block != 0:
        c_block //= 2
    rows = h
    def footprint(cb, rb):
        return 4 * (cb * (rb + d - 1) * wp + d * d * rb * w + 2 * cb * rb * w)
    while footprint(c_block, rows) > 8 * 1024 * 1024 and c_block > 8:
        c_block //= 2
    while footprint(c_block, rows) > 8 * 1024 * 1024 and rows > 4:
        rows //= 2
    while h % rows != 0:
        rows //= 2
    return c_block, rows


def _kernel(inp_hbm, filt_hbm, out_ref, inp_vmem, filt_vmem, sems,
            *, diameter: int, rows: int, w: int, wp: int, c_block: int):
    bi = pl.program_id(0)
    ci = pl.program_id(1)
    hi = pl.program_id(2)
    r0 = hi * rows

    inp_dma = pltpu.make_async_copy(
        inp_hbm.at[bi, pl.ds(ci * c_block, c_block), pl.ds(r0, rows + diameter - 1), :],
        inp_vmem, sems.at[0])
    filt_dma = pltpu.make_async_copy(
        filt_hbm.at[bi, :, pl.ds(r0, rows), :], filt_vmem, sems.at[1])
    inp_dma.start()
    filt_dma.start()
    inp_dma.wait()
    filt_dma.wait()

    acc = jnp.zeros((c_block, rows, w), jnp.float32)
    for u in range(diameter):
        for v in range(diameter):
            tap = filt_vmem[u * diameter + v, :, :].astype(jnp.float32)
            patch = inp_vmem[:, u:u + rows, v:v + w].astype(jnp.float32)
            acc = acc + tap[None, :, :] * patch
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def adaptive_conv_pallas(inp: jnp.ndarray, filters: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """inp: [B, C, H+d-1, W+d-1]; filters: [B, H, W, d, d] -> [B, C, H, W]."""
    b, c, hp, wp = inp.shape
    _, h, w, d1, d2 = filters.shape
    assert d1 == d2 and hp == h + d1 - 1 and wp == w + d1 - 1
    d = d1

    filt_t = filters.reshape(b, h, w, d * d).transpose(0, 3, 1, 2)  # [B, d*d, H, W]

    c_block, rows = _pick_tiles(c, h, wp, w, d)
    grid = (b, c // c_block, h // rows)

    kernel = functools.partial(_kernel, diameter=d, rows=rows, w=w, wp=wp,
                               c_block=c_block)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), inp.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, c_block, rows, w),
                               lambda bi, ci, hi: (bi, ci, hi, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c_block, rows + d - 1, wp), inp.dtype),
            pltpu.VMEM((d * d, rows, w), filters.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(inp, filt_t)
