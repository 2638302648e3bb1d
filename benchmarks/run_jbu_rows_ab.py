#!/usr/bin/env python
"""A/B the multi-row MXU-issue variant of the fused JBU epilogue
(VERDICT r3 #4: per-row issue serialization).

rows=R stacks R output rows into one [R*112, (d+R-1)*128] @ [..., C] matmul:
R x fewer MXU issues at (d+R-1)/d more issued flops per row (d=11: R=2 ->
+9%, R=4 -> +27%). Run at the production JBU shapes (C=512, d=11, bf16,
B = tile_chunk = 2), interleaved per trial (the tunnelled v5e only ever ADDS
contention noise: compare trial-by-trial, report MIN).

Writes benchmarks/jbu_rows_ab.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

TRIALS = 8
REPS = 5


def main():
    import jax.numpy as jnp

    from rs_ov.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from rs_ov.kernels.jbu_epilogue import (jbu_epilogue_classify_pallas,
                                            jbu_epilogue_pallas)

    b = int(os.environ.get("BVAL", "2"))
    c, d, g, q = 512, 11, 3, 8
    dd = d * d
    rows_list = [1, 2, 4, 8]
    rng = np.random.RandomState(0)
    out = {"what": "fused JBU epilogue, rows-per-MXU-issue A/B (slab path)",
           "b": b, "c": c, "d": d, "trials": TRIALS, "reps": REPS,
           "stages": {}}

    for h in (28, 56, 112, 224):
        w = h
        inp = jnp.asarray(rng.randn(b, h + d - 1, w + d - 1, c), jnp.bfloat16)
        logits = jnp.asarray(rng.randn(b, h, w, dd), jnp.float32)
        guid = jnp.asarray(rng.randn(b, h, w, g), jnp.bfloat16)
        spatial = jnp.asarray(rng.rand(dd), jnp.float32)
        temp = jnp.asarray(0.7, jnp.float32)
        cmid = 16
        w0 = jnp.asarray(rng.randn(cmid, dd + g) * 0.1, jnp.float32)
        b0 = jnp.asarray(rng.randn(cmid) * 0.1, jnp.float32)
        w1 = jnp.asarray(rng.randn(dd, cmid) * 0.1, jnp.float32)
        b1 = jnp.asarray(rng.randn(dd) * 0.1, jnp.float32)
        fw = jnp.asarray(rng.randn(c, c) * 0.05, jnp.float32)
        fb = jnp.asarray(rng.randn(c) * 0.05, jnp.float32)
        qf = rng.randn(q, c).astype(np.float32)
        qf /= np.linalg.norm(qf, axis=1, keepdims=True)
        qf = jnp.asarray(qf)

        def feat(r):
            return jbu_epilogue_pallas(inp, logits, guid, spatial, temp,
                                       w0, b0, w1, b1, d, nhwc=True, rows=r)

        def cls(r):
            return jbu_epilogue_classify_pallas(inp, logits, guid, spatial,
                                                temp, w0, b0, w1, b1, fw, fb,
                                                qf, d, rows=r)

        stage = {}
        for name, fn in (("feat", feat), ("cls", cls)):
            base = np.asarray(fn(1).astype(jnp.float32))
            best = {r: float("inf") for r in rows_list}
            wins = {r: 0 for r in rows_list[1:]}
            exact = {}
            for r in rows_list[1:]:
                got = np.asarray(fn(r).astype(jnp.float32))
                exact[r] = bool(np.array_equal(base, got))
            for _ in range(TRIALS):
                trial = {}
                for r in rows_list:
                    o = fn(r)
                    float(jnp.sum(o.astype(jnp.float32)))
                    t0 = time.perf_counter()
                    for _ in range(REPS):
                        o = fn(r)
                    float(jnp.sum(o.astype(jnp.float32)))
                    trial[r] = (time.perf_counter() - t0) / REPS
                    best[r] = min(best[r], trial[r])
                for r in rows_list[1:]:
                    wins[r] += trial[r] < trial[1]
            stage[name] = {
                "ms": {r: round(best[r] * 1e3, 3) for r in rows_list},
                "speedup_vs_rows1": {r: round(best[1] / best[r], 3)
                                     for r in rows_list[1:]},
                "trial_wins": wins, "bit_identical": exact,
            }
            print(f"stage {h:4d} {name}: " + "  ".join(
                f"r{r}={best[r]*1e3:7.3f}ms" for r in rows_list) +
                f"  wins={wins}  exact={exact}", flush=True)
        out["stages"][h] = stage

    path = os.path.join(os.path.dirname(__file__), "jbu_rows_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
