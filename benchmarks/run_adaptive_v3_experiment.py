#!/usr/bin/env python
"""Adaptive-conv v3 (banded-matmul MXU kernel) vs v2 (rowstream VPU kernel)
at the production JBU shapes (C=512, d=11, bf16).

Background (measured 2026-08-16, v5e, via a stripped-kernel microbench):
the v2 tap loop is VPU ISSUE-RATE bound — variants with the per-tap lane
rotate removed, or with fully-aligned full-width FMAs, all run ~92-94 ms at
B=16 224^2 (cb=8).  No VPU-side restructuring helps; the headroom is on the
MXU.

A pure-XLA banded einsum (build M with the pad-flatten-reshape trick, then
'bchj,bhwj->bchw' per window row) was measured first and REJECTED: 158 ms at
B=16 224^2 (0.58x v2) — the 4.6 GB banded tensor round-trips HBM and XLA's
batched matmul never reaches the MXU's rate.  The v3 Pallas kernel instead
builds each [W, Wp] banded matrix IN VMEM with one strided pltpu.roll and
feeds the MXU directly; the banded tensor never exists in HBM.

Measured (v5e, min-of-trials, 5 calls queued per sync):
  B= 2  28^2: v3  5.27 ms   v2  5.75 ms   1.09x
  B= 2  56^2: v3  5.75 ms   v2  7.52 ms   1.31x
  B= 2 112^2: v3  5.68 ms   v2  7.20 ms   1.27x
  B= 2 224^2: v3  8.48 ms   v2 15.40 ms   1.82x
  B=16  28^2: v3  5.66 ms   v2  9.44 ms   1.67x
  B=16  56^2: v3  7.97 ms   v2 13.92 ms   1.75x
  B=16 112^2: v3 10.91 ms   v2 23.51 ms   2.15x
  B=16 224^2: v3 37.14 ms   v2 91.00 ms   2.45x
(small-shape times are dominated by the tunnelled-TPU dispatch floor ~5 ms;
inside the jitted JBU pipeline only device time matters)

Follow-ups (measured the same way, B=16 224^2, v5e):
  v4 (W-chunked bands, K=352->128, 2.75x fewer issued MXU flops): 33.0 ms —
     only 1.18x over v3: the kernel is matmul-ISSUE bound (78k matmuls of
     [112,128]@[128,512] at ~420 ns apiece), not flop bound.
  v5 (concat-K: the d window-rows stacked along the contraction dim, one
     [112, d*128]@[d*128, 512] matmul per output row, d x fewer issues;
     halo picked at trace time, no accumulator): 26.9 ms = 1.38x v3,
     3.4x v2.  PRODUCTION (bf16 path).  Staging the input block into a flat
     VMEM K-buffer vs per-row concats measured identical (27.7 vs 26.9) —
     Mosaic already folds the overlapping-row copies.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure_min(fn, *args, trials=6, reps=5):
    import jax.numpy as jnp
    out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))  # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from rs_ov.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from rs_ov.kernels.adaptive_conv_v2 import adaptive_conv_pallas_v2
    from rs_ov.kernels.adaptive_conv_v3 import adaptive_conv_pallas_v3

    d, c = 11, 512
    rng = np.random.RandomState(0)
    print(f"device: {jax.devices()[0].device_kind}")

    # numerics vs a small numpy reference first
    b, h = 2, 28
    inp = jnp.asarray(rng.randn(b, c, h + d - 1, h + d - 1), jnp.bfloat16)
    filt = jax.nn.softmax(jnp.asarray(rng.randn(b, d * d, h, h), jnp.float32),
                          axis=1).astype(jnp.bfloat16)
    fi = np.asarray(filt, np.float32)
    ii = np.asarray(inp, np.float32)
    want = np.zeros((b, c, h, h), np.float32)
    for u in range(d):
        for v in range(d):
            want += fi[:, None, u * d + v] * ii[:, :, u:u + h, v:v + h]
    got = np.asarray(adaptive_conv_pallas_v3(inp, filt, d), np.float32)
    rel = np.max(np.abs(got - want)) / np.max(np.abs(want))
    print(f"v3 relerr vs numpy (bf16 inputs): {rel:.2e}")

    for b in (2, 16):
        for hw in (28, 56, 112, 224):
            h = w = hw
            inp = jnp.asarray(rng.randn(b, c, h + d - 1, w + d - 1),
                              jnp.bfloat16)
            filt = jnp.asarray(rng.rand(b, d * d, h, w), jnp.bfloat16)
            t3 = measure_min(lambda i, f: adaptive_conv_pallas_v3(i, f, d),
                             inp, filt)
            t2 = measure_min(lambda i, f: adaptive_conv_pallas_v2(i, f, d),
                             inp, filt)
            print(f"B={b:2d} {hw:3d}^2: v3 {t3:7.2f} ms  v2 {t2:7.2f} ms  "
                  f"speedup {t2 / t3:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
