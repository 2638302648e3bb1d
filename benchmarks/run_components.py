#!/usr/bin/env python
"""Component-level benchmark: per-stage timings of the flagship pipeline.

Complements bench.py's single headline number with the breakdown the perf
work tracks (all timings force a host read — plain block_until_ready is
unreliable on this platform). Writes benchmarks/components.json.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure(fn, *args, reps=5):
    import jax.numpy as jnp
    float(jnp.sum(fn(*args).astype(jnp.float32)))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        v = float(jnp.sum(fn(*args).astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    from rs_ov.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from rs_ov.core.config import get_model_config
    from rs_ov.core.params import init_clip_params
    from rs_ov.kernels.adaptive_conv_v2 import adaptive_conv_pallas_v2
    from rs_ov.kernels.adaptive_conv_v5 import adaptive_conv_pallas_v5
    from rs_ov.kernels.range_logits import range_logits_pallas
    from rs_ov.nn.vit import VitCallConfig, vit_forward
    from rs_ov.upsample.jbu import init_jbu_one_params, jbu_one_forward

    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    cfg = get_model_config("ViT-B/16")
    params = init_clip_params(jax.random.PRNGKey(0), cfg, dtype=dtype)
    jbu = init_jbu_one_params(jax.random.PRNGKey(1), 512, dtype=dtype)
    call = VitCallConfig(model_type="Experimental", ignore_residual=True,
                         output_cls_token=True, quick_gelu=True,
                         apply_similarity_enhancement=True,
                         apply_outlier_suppression=True, outlier_top_k=30)
    rng = np.random.RandomState(0)
    tiles = jnp.asarray(rng.randn(16, 3, 224, 224).astype(np.float32)).astype(dtype)
    src = jnp.asarray(rng.randn(16, 512, 14, 14).astype(np.float32)).astype(dtype)

    results = {"device": str(jax.devices()[0]), "tiles": 16}
    # the tunnelled chip has a per-call dispatch+sync floor that varies with
    # contention (~5 ms idle, 25+ ms busy) — record it so the per-stage
    # numbers below can be read as (value - floor) device time
    results["dispatch_floor_ms"] = 1e3 * measure(
        jax.jit(lambda x: x + 1), jnp.zeros((8, 128), jnp.float32))
    results["vit_decontam_ms"] = 1e3 * measure(
        jax.jit(lambda p, x: vit_forward(p["visual"], x, cfg.vision, call)[1]),
        params, tiles)
    # finer ViT breakdown: plain tower, then one decontam stage at a time
    import dataclasses
    variants = {
        "vit_plain_ms": dict(apply_similarity_enhancement=False,
                             apply_outlier_suppression=False),
        "vit_sim_ms": dict(apply_outlier_suppression=False),
        "vit_outlier_ms": dict(apply_similarity_enhancement=False),
    }
    for key, over in variants.items():
        c = dataclasses.replace(call, **over)
        results[key] = 1e3 * measure(
            jax.jit(lambda p, x, c=c: vit_forward(p["visual"], x, cfg.vision, c)[1]),
            params, tiles)
    results["jbu_16x_ms"] = 1e3 * measure(
        jax.jit(lambda p, s, g: jbu_one_forward(p, s, g)), jbu, src, tiles, reps=3)
    on_tpu = jax.default_backend() != "cpu"
    for size in (28, 56, 112, 224):
        inp = jnp.asarray(rng.randn(16, 512, size + 10, size + 10)
                          .astype(np.float32)).astype(dtype)
        filt = jnp.asarray(rng.rand(16, 121, size, size)
                           .astype(np.float32)).astype(dtype)
        results[f"adaptive_conv_{size}_ms"] = 1e3 * measure(
            jax.jit(lambda i, f: adaptive_conv_pallas_v5(i, f, 11))
            if on_tpu else
            jax.jit(lambda i, f: i[:, :, 5:5 + size, 5:5 + size]),
            inp, filt, reps=3)
        if on_tpu:
            results[f"adaptive_conv_v2_{size}_ms"] = 1e3 * measure(
                jax.jit(lambda i, f: adaptive_conv_pallas_v2(i, f, 11)),
                inp, filt, reps=3)
            proj = jnp.asarray(rng.randn(16, 32, size + 10, size + 10)
                               .astype(np.float32))
            results[f"range_logits_{size}_ms"] = 1e3 * measure(
                jax.jit(lambda p, q=proj[:, :, 5:5 + size, 5:5 + size]:
                        range_logits_pallas(p, q, 11)),
                proj, reps=3)

    out = os.path.join(REPO, "benchmarks", "components.json")
    with open(out, "w") as f:
        json.dump({k: (round(v, 2) if isinstance(v, float) else v)
                   for k, v in results.items()}, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
