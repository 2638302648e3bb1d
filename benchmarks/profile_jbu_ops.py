"""Per-op cost profile of one JBU tile-chunk (production shapes).

Times every XLA/Pallas piece of the 4-stage jbu_one NHWC-classify path
(B=2 chunk, C=512, r=5, d=11, K=32) individually on the live backend,
interleaved across trials (see memory: never compare across processes),
with a measured dispatch floor subtracted.  Used to decide which glue
passes are worth folding into the Pallas epilogue kernel
(reference op being replaced: /root/reference/simfeatup_dev/upsamplers.py:230-274).

Usage:  python benchmarks/profile_jbu_ops.py [trials]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from rs_ov.core.cache import enable_compilation_cache

enable_compilation_cache()

from rs_ov.kernels.jbu_epilogue import _HT, _WT, _pad_to, jbu_epilogue_pallas
from rs_ov.kernels.range_logits import range_logits_pallas
from rs_ov.upsample import jbu
from rs_ov.upsample.jbu import _proj2, _spatial_kernel, init_jbu_one_params
from rs_ov.utils.resize import (adaptive_avg_pool2d, reflect_pad_2d,
                                reflect_pad_nhwc, resize_bicubic_nhwc)

B, C, R, K, G = 2, 512, 5, 32, 3
D = 2 * R + 1
DD = D * D
TRIALS = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def sync(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0]))[...]


REPS = 16  # calls per dispatch batch: amortises the tunnel's 5-35 ms floor


def timeit(fn, *args):
    """Median per-call ms over REPS back-to-back async dispatches + one sync
    (the tunnel's dispatch floor is paid once, not per call)."""
    t0 = time.perf_counter()
    r = None
    for _ in range(REPS):
        r = fn(*args)
    sync(r)
    return (time.perf_counter() - t0) * 1e3 / REPS


@jax.jit
def _floor_fn(x):
    return x + 1


@functools.partial(jax.jit, static_argnames=("hw",))
def _pool(g, hw):
    return adaptive_avg_pool2d(g, (hw, hw))


@jax.jit
def _proj(g, p):
    return _proj2(g, p).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=())
def _refpad_cf(x):
    return reflect_pad_2d(x, R)


@jax.jit
def _transpose_logits(x):
    return x.transpose(0, 2, 3, 1)


@functools.partial(jax.jit, static_argnames=("hw",))
def _bicubic(x, hw):
    return resize_bicubic_nhwc(x, (hw, hw))


@jax.jit
def _refpad_nhwc(x):
    return reflect_pad_nhwc(x, R)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _epi_prep(inp, h, w):
    """The XLA prep inside jbu_epilogue_pallas: block pad + window stack."""
    ht = _HT
    wt = min(_WT, _pad_to(w, 8))
    hpad = _pad_to(h, ht)
    wpad = _pad_to(w, wt)
    n_hb = hpad // ht
    n_wb = wpad // wt
    cp = _pad_to(C, 128)
    hp, wp = h + D - 1, w + D - 1
    inp_t = jnp.pad(inp, ((0, 0), (0, (n_hb + 1) * ht - hp),
                          (0, (n_wb - 1) * wt + 128 - wp), (0, cp - C)))
    return jnp.stack([inp_t[:, :, i * wt:i * wt + 128] for i in range(n_wb)],
                     axis=2)


def main():
    key = jax.random.PRNGKey(0)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                          if x.dtype == jnp.float32 else x,
                          init_jbu_one_params(key, C, dtype=jnp.float32))
    up = params["up"]
    fx = up["fixup_proj"]
    guidance_cf = jax.random.normal(key, (B, G, 224, 224), jnp.bfloat16)
    spatial = _spatial_kernel(D, up["sigma_spatial"]).reshape(-1)
    pos_temp = jnp.clip(jnp.exp(up["range_temp"].astype(jnp.float32)), 1e-4, 1e4)

    floor = sorted(timeit(_floor_fn, jnp.ones((8,))) for _ in range(10))[2]
    print(f"amortised per-call floor ~{floor:.3f} ms (REPS={REPS})")

    stages = []
    for h in (14, 28, 56, 112):
        hw = h * 2
        src = jax.random.normal(jax.random.PRNGKey(h), (B, h, h, C), jnp.bfloat16)
        sg = _pool(guidance_cf, hw)
        proj = _proj(sg, up["range_proj"])
        proj_p = _refpad_cf(proj)
        logits = range_logits_pallas(proj_p, proj, D)
        logits_t = _transpose_logits(logits)
        guid_t = jnp.asarray(sg.transpose(0, 2, 3, 1))
        hr = _bicubic(src, hw)
        hr_p = _refpad_nhwc(hr)
        epi = functools.partial(
            jbu_epilogue_pallas,
            spatial=spatial, pos_temp=pos_temp,
            w0=fx["w0"].reshape(fx["w0"].shape[0], -1), b0=fx["b0"],
            w1=fx["w1"].reshape(fx["w1"].shape[0], -1), b1=fx["b1"],
            diameter=D, nhwc=True)
        ops = [
            ("pool", lambda sg=sg, hw=hw: _pool(guidance_cf, hw)),
            ("range_proj", lambda sg=sg: _proj(sg, up["range_proj"])),
            ("refpad_proj", lambda proj=proj: _refpad_cf(proj)),
            ("range_logits", lambda proj_p=proj_p, proj=proj:
                range_logits_pallas(proj_p, proj, D)),
            ("logits_T", lambda logits=logits: _transpose_logits(logits)),
            ("bicubic", lambda src=src, hw=hw: _bicubic(src, hw)),
            ("refpad_hr", lambda hr=hr: _refpad_nhwc(hr)),
            ("epi_prep", lambda hr_p=hr_p, hw=hw: _epi_prep(hr_p, hw, hw)),
            ("epilogue(all)", lambda hr_p=hr_p, logits_t=logits_t,
                guid_t=guid_t, epi=epi: epi(hr_p, logits_t, guid_t)),
        ]
        # warm up compiles
        for _, f in ops:
            sync(f())
        stages.append((hw, ops))

    # full-path anchor
    qf = jax.random.normal(key, (6, C), jnp.bfloat16)
    src0 = jax.random.normal(key, (B, 14, 14, C), jnp.bfloat16)
    full = jax.jit(lambda p, s, g, q: jbu.jbu_one_forward_nhwc_classify(p, s, g, q))
    sync(full(params, src0, guidance_cf, qf))

    results = {hw: {name: [] for name, _ in ops} for hw, ops in stages}
    full_ts = []
    for t in range(TRIALS):
        for hw, ops in stages:
            for name, f in ops:
                results[hw][name].append(timeit(f))
        full_ts.append(timeit(full, params, src0, guidance_cf, qf))

    print(f"\n{'op':<16}" + "".join(f"{hw:>9}" for hw, _ in stages) + "   total")
    totals = {}
    for name, _ in stages[0][1]:
        row = []
        for hw, _ in stages:
            med = float(np.median(results[hw][name])) - floor
            row.append(max(med, 0.0))
        totals[name] = sum(row)
        print(f"{name:<16}" + "".join(f"{v:9.2f}" for v in row)
              + f"{sum(row):8.2f}")
    glue = sum(v for k, v in totals.items() if k != "epilogue(all)")
    print(f"\nsum of ops (4 stages): {glue + totals['epilogue(all)']:.2f} ms "
          f"(glue {glue:.2f} + epilogue {totals['epilogue(all)']:.2f})")
    print(f"full chunk (jit whole path): median {np.median(full_ts) - floor:.2f} ms"
          f"  (n={TRIALS}, floor-corrected)")


if __name__ == "__main__":
    main()
