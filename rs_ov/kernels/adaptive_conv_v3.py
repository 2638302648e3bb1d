"""Pallas TPU adaptive-conv v3: banded-matrix matmuls on the MXU.

Same math as v1/v2 (the JBU inner loop, reference
simfeatup_dev/upsamplers.py:14-25):

    out[b, c, h, w] = sum_{u,v} filt[b, u*d+v, h, w] * inp[b, c, h+u, w+v]

v1/v2 compute this on the VPU as 121 shifted multiply-adds; a microbenchmark
(2026-08-16, v5e) shows that loop is VPU issue-rate bound — removing the
per-tap lane rotate or the accumulator round-trips does NOT speed it up
(~92 ms at B=16 C=512 224^2 regardless).  The only unit with headroom is
the MXU.

Key identity: for a fixed output row h and window row u, the tap contraction
over v is a banded matrix product.  Let

    M_u[w, w'] = filt[u, w'-w, h, w]   for 0 <= w'-w < d, else 0

then  out[c, h, :] += inp[c, h+u, :] @ M_u^T,  i.e. with rows as matrices:

    out_row[w, c] = sum_u  M_u[w, :] @ inp_row_{h+u}[:, c]

The banded matrix is built IN-KERNEL in one VPU op from the compact
[W, d] tap slab: ``pltpu.roll(slab_padded, 0, axis=1, stride=1,
stride_axis=0)`` shifts row w right by exactly w, landing tap v of row w at
column w+v (verified on v5e; fp32 only, hence the fp32 round-trip).  The
matmul [W, Wp] @ [Wp, C] then rides the MXU with fp32 accumulation —
numerically identical to v2's bf16->fp32 cast-then-multiply (products of
bf16 inputs are exact either way; only the summation order differs).

Layout: the input is pre-transposed once in XLA to [B, rows, Wp, C] so an
input row is a naturally-tiled [Wp(sublanes), C(lanes)] matmul operand and
the row index (h+u, dynamic in the grid) is a free untiled-dim offset.  The
halo over output-row blocks (a block of ht output rows reads ht+d-1 input
rows) is handled by passing the input twice with adjacent block indices —
Pallas BlockSpecs cannot express overlapping windows directly.

Measured (v5e, C=512, d=11, bf16) vs the v2 rowstream kernel: see
benchmarks/run_adaptive_v3_experiment.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["adaptive_conv_pallas_v3"]

_HT = 16  # output rows per grid step (>= d-1 so the halo spans <= 2 blocks)


def _pad_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(filt_ref, inpa_ref, inpb_ref, out_ref, acc_ref,
            *, diameter: int, ht: int, w: int, wp2: int):
    d = diameter
    u = pl.program_id(2)

    @pl.when(u == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for i in range(ht):
        # banded matrix for output row i, window row u: one strided roll
        slab = filt_ref[0, 0, i].astype(jnp.float32)        # [W, d]
        slab = jnp.pad(slab, ((0, 0), (0, wp2 - d)))        # [W, Wp2]
        m = pltpu.roll(slab, 0, axis=1, stride=1, stride_axis=0)
        mb = m.astype(jnp.bfloat16)                         # [W, Wp2]

        # input row i+u lives in this block (row < ht) or the next one
        row = i + u

        def _lo(r=row):
            return inpa_ref[0, jnp.minimum(r, ht - 1)]

        def _hi(r=row):
            return inpb_ref[0, jnp.clip(r - ht, 0, ht - 1)]

        a = jax.lax.cond(row < ht, _lo, _hi)                # [Wp2, C]
        acc_ref[i] = acc_ref[i] + jax.lax.dot_general(
            mb, a.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(u == d - 1)
    def _():
        out_ref[0] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("diameter", "interpret"))
def adaptive_conv_pallas_v3(inp: jnp.ndarray, filt_t: jnp.ndarray,
                            diameter: int,
                            interpret: bool = False) -> jnp.ndarray:
    """inp: [B, C, H+d-1, W+d-1]; filt_t: [B, d*d, H, W] tap-major
    (the layout the JBU range-kernel pipeline produces) -> [B, C, H, W]."""
    b, c, hp, wp = inp.shape
    _, dd, h, w = filt_t.shape
    d = diameter
    assert dd == d * d and hp == h + d - 1 and wp == w + d - 1

    ht = _HT
    hpad = _pad_to(h, ht)
    n_hb = hpad // ht
    wp2 = _pad_to(w + d - 1, 128)
    cp = _pad_to(c, 128)

    # [B, C, Hp, Wp] -> [B, rows, Wp2, Cp]; rows padded to (n_hb + 1) blocks
    # so the halo ref's block index hi+1 stays in range
    inp_t = jnp.pad(inp.transpose(0, 2, 3, 1),
                    ((0, 0), (0, (n_hb + 1) * ht - hp),
                     (0, wp2 - wp), (0, cp - c)))

    # [B, d*d, H, W] -> [B, u, H, W, v] compact tap slabs
    filt5 = filt_t.reshape(b, d, d, h, w).transpose(0, 1, 3, 4, 2)
    filt5 = jnp.pad(filt5, ((0, 0), (0, 0), (0, hpad - h), (0, 0), (0, 0)))

    kernel = functools.partial(_kernel, diameter=d, ht=ht, w=w, wp2=wp2)
    out_t = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, hpad, w, cp), inp.dtype),
        grid=(b, n_hb, d),
        in_specs=[
            pl.BlockSpec((1, 1, ht, w, d), lambda bi, hi, u: (bi, u, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, wp2, cp), lambda bi, hi, u: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, wp2, cp), lambda bi, hi, u: (bi, hi + 1, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, w, cp), lambda bi, hi, u: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((ht, w, cp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(filt5, inp_t, inp_t)

    return out_t[:, :h, :, :c].transpose(0, 3, 1, 2)
