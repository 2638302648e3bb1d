"""Pallas TPU kernel: spatially-varying (adaptive) convolution.

The JBU inner loop (reference simfeatup_dev/upsamplers.py:274 calls the
external ``featup`` CUDA op; math = adaptive_conv_py_simple :14-25):

    out[b, c, h, w] = sum_{u,v} filters[b, h, w, u, v] * inp[b, c, h+u, w+v]

The XLA formulation re-reads the input d^2 (=121 for radius 5) times from
HBM (and an unrolled form OOMs by materialising d^2 temps). Here each
program keeps one channel-block of the (padded) input resident in VMEM and
streams the d^2 filter tap planes through a double-buffered DMA pipeline —
input and filters each cross HBM once per channel-block, accumulation stays
in fp32 VMEM scratch.

Layout notes: the input block spans the full (H+d-1, W+d-1) spatial extent so
the shifted window reads are static in-VMEM slices (Mosaic handles the
misaligned starts); HBM DMAs only ever move full tap planes, which keeps
every DMA shape tiling-aligned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["adaptive_conv_pallas", "adaptive_conv_pallas_planes",
           "adaptive_conv_pallas_cl"]


def _kernel_cl(inp_hbm, filt_ref, out_ref, acc_ref, tap_ref, inp_vmem, sems,
               *, diameter: int, rows: int, h: int, w: int, c_block: int):
    """Channels-last variant: channels ride the LANE dim at full width, the
    shifted window reads slice only major/sublane dims (no lane rotations).
    inp_hbm: [B, Hp, Wp, C]; filt_ref: [1, d*d, rows, w] VMEM;
    out_ref: [1, rows, w, cb]; inp_vmem: [rows+d-1, wp, cb]."""
    bi = pl.program_id(0)
    hi = pl.program_id(1)
    ci = pl.program_id(2)
    r0 = hi * rows

    dma = pltpu.make_async_copy(
        inp_hbm.at[bi, pl.ds(r0, rows + diameter - 1), :,
                   pl.ds(ci * c_block, c_block)],
        inp_vmem, sems.at[0])
    dma.start()
    dma.wait()

    acc_ref[:] = jnp.zeros_like(acc_ref)

    # fori over u (dynamic slices on MAJOR dims are legal), static unroll
    # only over v: bounds the unrolled-loop stack temporaries to d, not d^2
    def u_body(u, _):
        for v in range(diameter):
            # stage the tap through an in-place [rows, w, 1] scratch so each
            # iteration reuses one relayout buffer
            tap_ref[:, :, 0] = filt_ref[0, u * diameter + v].astype(jnp.float32)
            patch = inp_vmem[pl.ds(u, rows), v:v + w, :].astype(jnp.float32)
            acc_ref[:] = acc_ref[:] + tap_ref[:] * patch
        return 0

    jax.lax.fori_loop(0, diameter, u_body, 0)
    out_ref[0] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("diameter", "interpret"))
def adaptive_conv_pallas_cl(inp: jnp.ndarray, filt_t: jnp.ndarray,
                            diameter: int,
                            interpret: bool = False) -> jnp.ndarray:
    """EXPERIMENTAL channels-last adaptive conv — kept for reference, LOSES
    to the planes kernel on v5e (400ms vs 237ms across the four JBU stages,
    16 tiles): full-lane channel utilisation does not pay for the per-tap
    relayout of the [rows, w, 1] tap broadcast and the fori/DMA overhead.
    Conclusion recorded 2026-08-16; the NCHW planes kernel stays production.
    inp: [B, C, Hp, Wp] NCHW in/out (transposes inside); filt_t: [B, d*d, H, W].
    """
    b, c, hp, wp = inp.shape
    _, dd, h, w = filt_t.shape
    d = diameter
    assert dd == d * d and hp == h + d - 1 and wp == w + d - 1
    if c % 128 != 0:
        # manual DMA lane slices must be 128-aligned — small-channel cases
        # take the NCHW planes kernel
        return adaptive_conv_pallas_planes(inp, filt_t, diameter,
                                           interpret=interpret)

    inp_cl = inp.transpose(0, 2, 3, 1)  # [B, Hp, Wp, C]
    # the DMA'd region's sublane dim (Wp) must be tiling-aligned
    wp_pad = -(-wp // 8) * 8
    if wp_pad != wp:
        inp_cl = jnp.pad(inp_cl, ((0, 0), (0, 0), (0, wp_pad - wp), (0, 0)))

    c_block = min(c, 128)
    while c % c_block != 0:
        c_block //= 2
    def pad8(x):
        return -(-x // 8) * 8

    def footprint(rb):
        return ((rb + d - 1) * wp_pad * c_block * inp.dtype.itemsize   # inp
                + 4 * rb * pad8(w) * c_block                            # acc
                + 2 * rb * pad8(w) * c_block * inp.dtype.itemsize       # out x2
                + 2 * d * d * pad8(rb) * 128 * filt_t.dtype.itemsize    # filt x2
                + 4 * d * rb * pad8(w) * c_block)                       # v-temps
    # block second-to-last dims must be x8 or the full extent
    candidates = [h] + [r for r in range(8, h, 8) if h % r == 0]
    rows = max((r for r in candidates if footprint(r) <= 12 * 1024 * 1024),
               default=min(candidates),
               key=lambda r: r)

    grid = (b, h // rows, c // c_block)
    kernel = functools.partial(_kernel_cl, diameter=d, rows=rows, h=h, w=w,
                               c_block=c_block)
    out_cl = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), inp.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # input DMA'd manually
            pl.BlockSpec((1, d * d, rows, w), lambda bi, hi, ci: (bi, 0, hi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, w, c_block),
                               lambda bi, hi, ci: (bi, hi, 0, ci),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, w, c_block), jnp.float32),
            pltpu.VMEM((rows, w, 1), jnp.float32),
            pltpu.VMEM((rows + d - 1, wp_pad, c_block), inp.dtype),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        interpret=interpret,
    )(inp_cl, filt_t)
    return out_cl.transpose(0, 3, 1, 2)


def _kernel(filt_hbm, inp_ref, out_ref, acc_ref, filt_vmem, sems,
            *, diameter: int, h: int, w: int, c_block: int, bulk_taps: bool):
    bi = pl.program_id(0)
    n_taps = diameter * diameter

    if bulk_taps:
        # small stages are DMA-latency bound: move ALL tap planes in ONE copy
        dma = pltpu.make_async_copy(filt_hbm.at[bi], filt_vmem, sems.at[0])
        dma.start()
        dma.wait()
    else:
        def tap_dma(slot, tap_idx):
            return pltpu.make_async_copy(
                filt_hbm.at[bi, tap_idx], filt_vmem.at[slot], sems.at[slot])

        tap_dma(0, 0).start()
    acc_ref[:] = jnp.zeros_like(acc_ref)

    # static unroll: VMEM window reads need static (possibly misaligned)
    # offsets — Mosaic cannot prove alignment for dynamic lane starts
    for t in range(n_taps):
        if bulk_taps:
            tap = filt_vmem[t, :h, :w].astype(jnp.float32)  # [h, w]
        else:
            slot = t % 2
            if t + 1 < n_taps:
                tap_dma((t + 1) % 2, t + 1).start()
            tap_dma(slot, t).wait()
            tap = filt_vmem[slot, :h, :w].astype(jnp.float32)
        u, v = t // diameter, t % diameter
        patch = inp_ref[0, :, u:u + h, v:v + w].astype(jnp.float32)
        acc_ref[:] = acc_ref[:] + tap[None, :, :] * patch
    out_ref[0] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def adaptive_conv_pallas(inp: jnp.ndarray, filters: jnp.ndarray,
                         interpret: bool = False) -> jnp.ndarray:
    """inp: [B, C, H+d-1, W+d-1]; filters: [B, H, W, d, d] -> [B, C, H, W]."""
    from rs_ov.kernels.adaptive_conv_v2 import adaptive_conv_pallas_v2

    b, c, hp, wp = inp.shape
    _, h, w, d1, d2 = filters.shape
    assert d1 == d2 and hp == h + d1 - 1 and wp == w + d1 - 1
    filt_t = filters.reshape(b, h, w, d1 * d1).transpose(0, 3, 1, 2)
    return adaptive_conv_pallas_v2(inp, filt_t, d1, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("diameter", "interpret"))
def adaptive_conv_pallas_planes(inp: jnp.ndarray, filt_t: jnp.ndarray,
                                diameter: int,
                                interpret: bool = False) -> jnp.ndarray:
    """Plane-layout entry: filt_t [B, d*d, H, W] (tap-major) — the layout the
    JBU range-kernel pipeline already produces, avoiding a [B,H,W,d,d]
    transpose round-trip of a multi-GB tensor."""
    b, c, hp, wp = inp.shape
    _, dd, h, w = filt_t.shape
    d = diameter
    assert dd == d * d and hp == h + d - 1 and wp == w + d - 1
    del dd
    # manual HBM->VMEM DMAs require tiling-aligned plane shapes: pad the tap
    # planes to (8, 128) multiples; the kernel reads back the [:h, :w] window
    hpad = -(-h // 8) * 8
    wpad = -(-w // 128) * 128
    if (hpad, wpad) != (h, w):
        filt_t = jnp.pad(filt_t, ((0, 0), (0, 0), (0, hpad - h), (0, wpad - w)))

    # channel block sized so inp block + fp32 acc + out fit comfortably;
    # account for Mosaic's physical (8, 128) tile padding of the trailing dims
    def pad8(x):
        return -(-x // 8) * 8

    def pad128(x):
        return -(-x // 128) * 128

    # Perf notes (v5e, 16 tiles x 512ch): this config measures 32/38/50/118 ms
    # for the 28/56/112/224 stages (stage 224 is at the VPU roofline).
    # Alternatives measured and rejected:
    #   - bulk single-DMA of all tap planes: 40ms @28
    #   - larger channel blocks (cb=256): 39ms @28
    #   - XLA fori_loop shifts: 30/158/398 ms
    #   - unrolled XLA adds: 140GB HBM OOM
    #   - channels-last Pallas layout: 36/42/81/241 ms
    #   - XLA unfold+einsum (conv_general_dilated_patches): 63/175 ms @28/56
    # The small-stage overhead appears intrinsic to this op shape on v5e.
    bulk_taps = False

    c_block = c
    def footprint(cb):
        return (cb * pad8(hp) * pad128(wp) * inp.dtype.itemsize
                + 4 * cb * pad8(h) * pad128(w)
                + cb * pad8(h) * pad128(w) * inp.dtype.itemsize
                + 2 * pad8(hpad) * pad128(wpad) * filt_t.dtype.itemsize)
    while c_block > 8 and (c % c_block != 0 or footprint(c_block) > 6 * 1024 * 1024):
        c_block //= 2

    grid = (b, c // c_block)
    kernel = functools.partial(_kernel, diameter=d, h=h, w=w, c_block=c_block,
                               bulk_taps=bulk_taps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), inp.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # filters stay in HBM
            pl.BlockSpec((1, c_block, hp, wp), lambda bi, ci: (bi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_block, h, w), lambda bi, ci: (bi, ci, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((c_block, h, w), jnp.float32),
            pltpu.VMEM((d * d if bulk_taps else 2, hpad, wpad), filt_t.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(filt_t, inp)
