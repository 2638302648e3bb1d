#!/usr/bin/env python
"""CoCa generate: KV-cached vs full-prefix decode A/B on the real TPU.

The full-prefix path (the reference's structure, coca_model.py:243-268)
compiles one XLA program PER SEQUENCE LENGTH and re-runs the whole prefix
each step; the cached path (make_coca_cached_decoder) compiles one
fixed-shape step. Both are timed end-to-end at CoCa-Base size with random
weights — wall time includes compiles, which is the point: on a fresh
process the per-length compiles ARE the uncached path's cost, and even
compile-warm its step time grows O(L) while the cached step is O(1).

Writes benchmarks/coca_decode_ab.json.

    python benchmarks/run_coca_decode_ab.py [--seq-len 15] [--batch 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq-len", type=int, default=10)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("-o", "--out",
                    default=os.path.join(REPO, "benchmarks",
                                         "coca_decode_ab.json"))
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from rs_ov.nn.coca import coca_base_config, coca_generate, init_coca_params

    cfg = coca_base_config()
    backend = jax.default_backend()
    dtype = jnp.bfloat16 if backend in ("tpu", "axon") else jnp.float32
    params = init_coca_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(args.batch, 3, 224, 224).astype(np.float32))

    kw = dict(seq_len=args.seq_len, min_seq_len=3, generation_type="top_k",
              top_k=1, seed=1)

    def run(use_cache: bool):
        t0 = time.perf_counter()
        out = coca_generate(params, images, cfg, use_cache=use_cache, **kw)
        return time.perf_counter() - t0, out

    # cached first so its (single) step compile doesn't ride on the
    # uncached run; each path's wall time includes its own compiles.
    # The uncached path is the expensive arm (it runs the towers EAGERLY,
    # one tunnel dispatch per op, per step) — one pass of each is enough.
    t_cached, out_cached = run(True)
    t_cached_warm, _ = run(True)
    t_full, out_full = run(False)

    tokens_equal = bool(np.array_equal(out_cached, out_full))
    result = {
        "what": ("coca_generate cached-vs-full-prefix A/B, CoCa-Base, "
                 "random weights, greedy top_k=1"),
        "backend": backend,
        "batch": args.batch, "seq_len": args.seq_len,
        "cold_s": {"cached": round(t_cached, 2), "full_prefix": round(t_full, 2),
                   "ratio": round(t_full / t_cached, 2)},
        "cached_warm_s": round(t_cached_warm, 2),
        "tokens_equal": tokens_equal,
    }
    print(json.dumps(result, indent=1))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    return 0 if tokens_equal else 1


if __name__ == "__main__":
    raise SystemExit(main())
