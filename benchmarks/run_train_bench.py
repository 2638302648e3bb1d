#!/usr/bin/env python
"""CLIP ViT-B/16 train-step throughput on the local chip(s): fp32 vs bf16
mixed precision, with/without remat, a few batch sizes. Writes
benchmarks/train_bench.json."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from rs_ov.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from rs_ov.core.config import get_model_config
    from rs_ov.core.params import init_clip_params
    from rs_ov.train.step import make_clip_train_step

    cfg = get_model_config("ViT-B/16")
    params = init_clip_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    devs = np.array(jax.devices()).reshape(-1, 1)
    mesh = Mesh(devs, ("data", "model"))

    rng = np.random.RandomState(0)
    results = {"device": str(jax.devices()[0])}
    for name, compute_dtype, remat, batch in (
            ("fp32_remat_b8", None, True, 8),
            ("bf16_remat_b8", jnp.bfloat16, True, 8),
            ("bf16_remat_b32", jnp.bfloat16, True, 32),
            ("bf16_noremat_b32", jnp.bfloat16, False, 32),
            ("bf16_remat_b128", jnp.bfloat16, True, 128),
    ):
        images = jnp.asarray(rng.randn(batch, 3, 224, 224).astype(np.float32))
        texts = np.zeros((batch, 77), np.int32)
        for i in range(batch):
            texts[i, :10] = rng.randint(1, 49000, size=10)
            texts[i, 9] = 49407
        texts = jnp.asarray(texts)
        try:
            step, init_opt = make_clip_train_step(
                cfg, mesh, remat=remat, compute_dtype=compute_dtype)
            opt_state = init_opt(params)
            p, o, loss = step(params, opt_state, images, texts)
            float(loss)  # sync after compile
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(4):
                    p, o, loss = step(p, o, images, texts)
                float(loss)
                best = min(best, (time.perf_counter() - t0) / 4)
            results[name] = {"sec_per_step": round(best, 4),
                             "examples_per_sec": round(batch / best, 2)}
            print(name, results[name], flush=True)
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
            print(name, "FAILED:", str(e)[:200], flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "train_bench.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
