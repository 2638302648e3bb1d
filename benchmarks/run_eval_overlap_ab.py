#!/usr/bin/env python
"""Interleaved eval-loop vs bare-predict A/B (VERDICT r3 #3: "eval sustains
~85% of bare predict — close to >=95%").

The tunnelled chip's throughput varies +/-20% (and has multi-minute degraded
phases), so eval and bare rates from SEPARATE runs are not comparable. Here
both run alternately in ONE process on the SAME decoded images, per round:

  bare : predict over the images (cross-image batches), fully pipelined —
         every dispatch enqueued, ONE block at the end (bench.py's windowed
         loop shape): the best-possible device rate, no metric work.
  eval : the actual evalsuite runner loop (prefetch -> predict -> uint8 pred
         download -> overlapped IoU update) via run_eval(segmentor=...).

Reports the per-round eval/bare ratio (the chip phase cancels) at
batch_images in {1, 8}. Writes benchmarks/eval_overlap_ab.json.
"""

import json
import os
import sys
import time

import numpy as np

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)
os.environ.setdefault("RS_OV_DATA_ROOT", os.path.join("/tmp", "synth_tp"))

ROUNDS = 3
CONFIG = os.path.join(REPO, "configs", "cfg_openearthmap.py")


def main():
    import jax.numpy as jnp

    from rs_ov.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from rs_ov.data.loader import SegDataset, get_dataset_meta
    from rs_ov.evalsuite.config import load_config
    from rs_ov.evalsuite.runner import build_segmentor_from_config, run_eval

    if not os.path.isdir(os.environ["RS_OV_DATA_ROOT"]):
        import subprocess
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "make_synthetic_datasets.py"),
                        "--root", os.environ["RS_OV_DATA_ROOT"],
                        "--n", "24", "--size", "512"], check=True)

    cfg = load_config(CONFIG)
    ds_cfg = cfg["test_dataloader"]["dataset"]
    meta = get_dataset_meta(ds_cfg["type"])
    prefix = ds_cfg["data_prefix"]
    dataset = SegDataset(ds_cfg["type"], prefix["img_path"],
                         prefix.get("seg_map_path"), meta=meta, raw=True)
    samples = list(dataset.prefetch())
    imgs = np.stack([s.img for s in samples])
    metas = [s.meta for s in samples]
    n = len(samples)
    px_unit = 512.0 * 512.0
    img_px = imgs.shape[1] * imgs.shape[2]

    seg = build_segmentor_from_config(cfg, {"pred_dtype": "uint8"},
                                      os.path.dirname(CONFIG))

    out = {"what": "interleaved eval-loop vs bare-predict A/B, one process",
           "config": os.path.basename(CONFIG), "n_images": n,
           "rounds": ROUNDS, "modes": {}}

    # interleave ALL four measurements per round (bare/eval x batch 1/8):
    # the chip's multi-minute phase drift otherwise confounds the batch-mode
    # comparison (observed: batch-1 rounds in a slow phase, batch-8 in a
    # fast one, flipping the apparent winner between runs)
    def make_fns(bi):
        def bare_once():
            t0 = time.perf_counter()
            last = None
            for k in range(0, n, bi):
                r = (seg.predict_raw(imgs[k:k + 1], metas[k:k + 1])
                     if bi == 1 else
                     seg.predict_batch_raw(imgs[k:k + bi], metas[k:k + bi]))
                last = r[-1]["pred_sem_seg"]
            np.asarray(last)
            return (n * img_px / px_unit) / (time.perf_counter() - t0)

        def eval_once():
            # full-run rate, not the 'steady' column: with few batches in
            # flight the steady window degenerates to the drain tail. All
            # programs are compiled by the warmup round, so elapsed here is
            # pure loop time.
            r = run_eval(CONFIG, work_dir="/tmp/ev_ab", segmentor=seg,
                         batch_images=bi, verbose=False)
            return r["tiles512_per_sec"], r["mIoU"]

        return bare_once, eval_once

    fns = {bi: make_fns(bi) for bi in (1, 8)}
    miou0 = {}
    for bi, (bare_once, eval_once) in fns.items():
        bare_once()                      # compile both geometries
        miou0[bi] = eval_once()[1]
        out["modes"][bi] = {"rounds": [], "mIoU": round(float(miou0[bi]), 4)}
    # bf16 at different batch shapes reorders reductions; on random weights
    # ~1% of (near-tied) argmaxes flip — mIoU delta measured 1.3e-4. Exact
    # equality holds in fp32 (tests); here assert metric equivalence only.
    assert abs(miou0[1] - miou0[8]) < 0.05, (miou0[1], miou0[8])

    for _ in range(ROUNDS):
        for bi, (bare_once, eval_once) in fns.items():
            b = bare_once()
            e, miou = eval_once()
            assert abs(miou - miou0[bi]) < 1e-6, "eval must be unchanged"
            out["modes"][bi]["rounds"].append(
                {"bare": round(b, 2), "eval": round(e, 2),
                 "ratio": round(e / b, 4)})
            print(f"batch={bi}: bare {b:6.2f}  eval {e:6.2f}  "
                  f"ratio {e / b:.3f}", flush=True)
    for bi in fns:
        rounds = out["modes"][bi]["rounds"]
        out["modes"][bi]["median_ratio"] = round(
            float(np.median([r["ratio"] for r in rounds])), 4)
        out["modes"][bi]["median_eval"] = round(
            float(np.median([r["eval"] for r in rounds])), 2)

    path = os.path.join(REPO, "benchmarks", "eval_overlap_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
