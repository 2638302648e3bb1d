"""Interleaved A/B: split range-logits kernel vs fully fused-range epilogue.

A = split path (Pallas range_logits kernel -> XLA transpose/reflect-pad ->
slab epilogue kernel); B = fused path (range logits computed IN-kernel from a
2-D halo of the guidance projection; the [B, d^2, H, W] fp32 logits tensor,
its HBM round-trip, its transpose and both reflect-pad passes disappear).

Times the FULL production tile-chunk program (4-stage jbu_one NHWC-classify,
B=2, C=512, r=5) as ONE dispatch per call, alternating variants within a
single process (the only reliable measurement on this tunnelled chip).

Usage: python benchmarks/run_jbu_fused_range_ab.py [trials]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rs_ov.core.cache import enable_compilation_cache

enable_compilation_cache()

from rs_ov.upsample import jbu

B, C = 2, 512
TRIALS = int(sys.argv[1]) if len(sys.argv) > 1 else 24
REPS = 8


def sync(x):
    np.asarray(jax.device_get(x.ravel()[0]))


def make_fn(fused: bool):
    os.environ["RS_OV_JBU_FUSED_RANGE"] = "1" if fused else "0"

    def f(p, s, g, q):
        return jbu.jbu_one_forward_nhwc_classify(p, s, g, q)

    return jax.jit(f)


def timeit(fn, *args):
    t0 = time.perf_counter()
    r = None
    for _ in range(REPS):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) * 1e3 / REPS


def main():
    key = jax.random.PRNGKey(0)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        jbu.init_jbu_one_params(key, C, dtype=jnp.float32))
    src = jax.random.normal(key, (B, 14, 14, C), jnp.bfloat16)
    guid = jax.random.normal(key, (B, 3, 224, 224), jnp.bfloat16)
    qf = jax.random.normal(key, (6, C), jnp.bfloat16)

    f_split = make_fn(False)
    sync(f_split(params, src, guid, qf))
    f_fused = make_fn(True)
    out_fused = f_fused(params, src, guid, qf)
    out_split = f_split(params, src, guid, qf)
    err = float(jnp.max(jnp.abs(out_fused - out_split)))
    print(f"max |fused - split| on TPU: {err:.3e}", flush=True)

    a, b = [], []
    for t in range(TRIALS):
        a.append(timeit(f_split, params, src, guid, qf))
        b.append(timeit(f_fused, params, src, guid, qf))
        if (t + 1) % 6 == 0:
            print(f"  trial {t+1}: split {np.median(a):.2f} ms  "
                  f"fused {np.median(b):.2f} ms", flush=True)
    sa, sb = np.median(a), np.median(b)
    print(f"\nchunk (B={B}) median over {TRIALS}x{REPS}: "
          f"split {sa:.3f} ms | fused {sb:.3f} ms | "
          f"speedup {sa / sb:.3f}x", flush=True)
    print(f"per-trial wins: fused {sum(x > y for x, y in zip(a, b))}/{TRIALS}")


if __name__ == "__main__":
    main()
