"""Interleaved A/B: JBU stage batching vs the production tile-chunk path.

The production program bounds peak HBM by running the WHOLE 4-stage
jbu_one per 2-tile chunk under lax.map (segmentor._chunked_decontam). But
only the final 112->224 stage is memory-heavy; stages 1-3 (28/56/112) are
tiny grids whose pallas_call fixed costs don't amortize at B=2. The
"split" variant runs stages 1-3 for ALL tiles in one batch (8x fewer
kernel launches, 8x larger grids) and chunks only the final
stage+classify. Numerics are identical by construction — every kernel
grids over the batch axis, so batch composition can't change any block's
math.

Also re-sweeps the chunk size on the current (slab) kernel generation for
both variants — the round-2 verdict's tile_chunk re-sweep.

Usage: python benchmarks/run_jbu_stagesplit_ab.py [trials]
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
from rs_ov.utils.resize import adaptive_avg_pool2d

T, C, R = 16, 512, 5
TRIALS = int(sys.argv[1]) if len(sys.argv) > 1 else 18
REPS = 4


def sync(x):
    np.asarray(jax.device_get(x.ravel()[0]))


def _chunked(fn, chunk, *arrays):
    """lax.map `fn` over `chunk`-sized slices of the leading axis."""
    t = arrays[0].shape[0]
    n = t // chunk
    parts = [a.reshape((n, chunk) + a.shape[1:]) for a in arrays]
    out = jax.lax.map(lambda ab: fn(*ab), tuple(parts))
    return out.reshape((t,) + out.shape[2:])


def prod_fn(chunk):
    """Production path: full 4-stage classify per chunk."""
    def f(p, s, g, q):
        if chunk >= T:
            return jbu.jbu_one_forward_nhwc_classify(p, s, g, q, radius=R)
        return _chunked(
            lambda si, gi: jbu.jbu_one_forward_nhwc_classify(p, si, gi, q,
                                                             radius=R),
            chunk, s, g)
    return jax.jit(f)


def split_fn(chunk):
    """Stages 1-3 at full batch; only final stage+classify per chunk."""
    def f(p, s, g, q):
        x = s
        for _ in range(3):
            h, w = x.shape[1], x.shape[2]
            sg = adaptive_avg_pool2d(g, (h * 2, w * 2))
            x = jbu.jbu_module_forward_nhwc(p["up"], x, sg, R)
        h, w = x.shape[1], x.shape[2]
        sg = adaptive_avg_pool2d(g, (h * 2, w * 2))
        last = lambda xi, gi: jbu.jbu_module_forward_nhwc_classify(  # noqa: E731
            p["up"], xi, gi, p["final_fixup"], q, R)
        if chunk >= T:
            return last(x, sg)
        return _chunked(last, chunk, x, sg)
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
    src = jax.random.normal(key, (T, 14, 14, C), jnp.bfloat16)
    guid = jax.random.normal(key, (T, 3, 224, 224), jnp.bfloat16)
    qf = jax.random.normal(key, (6, C), jnp.bfloat16)

    variants = {
        "prod_c2": prod_fn(2),
        "prod_c4": prod_fn(4),
        "split_c2": split_fn(2),
        "split_c4": split_fn(4),
        "split_c16": split_fn(16),
    }
    if os.environ.get("RS_OV_AB_FULL", "0") == "1":
        variants["prod_c1"] = prod_fn(1)
        variants["prod_c16"] = prod_fn(16)

    ref = None
    for name, fn in variants.items():
        out = fn(params, src, guid, qf)
        sync(out)
        if ref is None:
            ref = out
        else:
            err = float(jnp.max(jnp.abs(out - ref)))
            print(f"max |{name} - prod_c2| = {err:.3e}", flush=True)

    times = {k: [] for k in variants}
    for t in range(TRIALS):
        for name, fn in variants.items():
            times[name].append(timeit(fn, params, src, guid, qf))
        if (t + 1) % 6 == 0:
            med = {k: f"{np.median(v):.1f}" for k, v in times.items()}
            print(f"  trial {t+1}: {med}", flush=True)

    base = np.median(times["prod_c2"])
    print(f"\n16-tile JBU+classify medians over {TRIALS}x{REPS} "
          f"(baseline prod_c2 = {base:.2f} ms):")
    for name, v in times.items():
        m = np.median(v)
        wins = sum(x < y for x, y in zip(v, times["prod_c2"]))
        print(f"  {name:<10} {m:8.2f} ms   {base / m:5.3f}x   "
              f"wins {wins}/{TRIALS}")


if __name__ == "__main__":
    main()
