"""Interleaved A/B: reduced-stage JBU fast mode vs the production 4-stage path.

The reference upsampler is a fixed 4-stage 16x JBU (reference
simfeatup_dev/upsamplers.py:304-325); the final 112->224 stage is ~2/3 of
the whole JBU phase. The fast mode (jbu.py stages<4, opt-in) classifies at
the reduced grid and bilinear-resizes the Q-channel logits the rest of the
way — trading upsampler fidelity for time. This script measures the trade's
time side honestly (interleaved trials, logit resize included in every
variant) and reports the numerics side as argmax agreement + logit delta vs
the 4-stage output at 224^2 (random weights — the real-weights mIoU A/B is
the certification gate, benchmarks/PERF.md).

Usage: python benchmarks/run_jbu_stages_ab.py [trials]
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
from rs_ov.utils.resize import resize_bilinear

T, C, R, Q = 16, 512, 5, 6
TILE = 224
TRIALS = int(sys.argv[1]) if len(sys.argv) > 1 else 18
REPS = 4


def sync(x):
    np.asarray(jax.device_get(x.ravel()[0]))


def _chunked(fn, chunk, *arrays):
    t = arrays[0].shape[0]
    n = t // chunk
    parts = [a.reshape((n, chunk) + a.shape[1:]) for a in arrays]
    out = jax.lax.map(lambda ab: fn(*ab), tuple(parts))
    return out.reshape((t,) + out.shape[2:])


def stage_fn(stages, chunk):
    """stages-stage JBU + fused classify + logit resize to the tile size."""
    def one(p, s, g, q):
        lg = jbu.jbu_one_forward_nhwc_classify(p, s, g, q, radius=R,
                                               stages=stages)
        if lg.shape[1] != TILE:
            # [B, h, w, Q] -> [B, Q, h, w] resize -> back: same op order the
            # segmentor tail performs on its Q-channel logits
            lg = resize_bilinear(lg.transpose(0, 3, 1, 2), (TILE, TILE))
            lg = lg.transpose(0, 2, 3, 1)
        return lg

    def f(p, s, g, q):
        if chunk >= T:
            return one(p, s, g, q)
        return _chunked(lambda si, gi: one(p, si, gi, q), chunk, s, g)
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
    guid = jax.random.normal(key, (T, 3, TILE, TILE), jnp.bfloat16)
    qf = jax.random.normal(key, (Q, C), jnp.bfloat16)

    variants = {
        "s4_c2": stage_fn(4, 2),      # production
        "s3_c2": stage_fn(3, 2),
        "s3_c4": stage_fn(3, 4),
        "s2_c8": stage_fn(2, 8),
        "s2_c16": stage_fn(2, 16),
    }

    ref = None
    for name, fn in variants.items():
        out = fn(params, src, guid, qf)
        sync(out)
        if ref is None:
            ref = out
        else:
            agree = float(jnp.mean(
                (jnp.argmax(out, -1) == jnp.argmax(ref, -1)).astype(jnp.float32)))
            err = float(jnp.max(jnp.abs(out - ref)))
            print(f"{name}: argmax agreement vs s4 = {agree:.4f}, "
                  f"max|dlogit| = {err:.3e}", flush=True)

    times = {k: [] for k in variants}
    for t in range(TRIALS):
        for name, fn in variants.items():
            times[name].append(timeit(fn, params, src, guid, qf))
        if (t + 1) % 6 == 0:
            med = {k: f"{np.median(v):.1f}" for k, v in times.items()}
            print(f"  trial {t+1}: {med}", flush=True)

    base = np.median(times["s4_c2"])
    print(f"\n16-tile JBU+classify+resize medians over {TRIALS}x{REPS} "
          f"(baseline s4_c2 = {base:.2f} ms):")
    for name, v in times.items():
        m = np.median(v)
        wins = sum(x < y for x, y in zip(v, times["s4_c2"]))
        print(f"  {name:<8} {m:8.2f} ms   {base / m:5.3f}x   "
              f"wins {wins}/{TRIALS}")


if __name__ == "__main__":
    main()
