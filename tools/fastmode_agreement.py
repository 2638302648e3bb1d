#!/usr/bin/env python
"""End-to-end fast-mode agreement artifact (reduced-stage JBU, opt-in).

Runs the production ViT-B/16 pipeline twice over the synthetic smoke
datasets on the real TPU — num_stages=4 (reference semantics) vs
num_stages=3 (fast mode) with IDENTICAL weights — and records per-config
per-pixel prediction agreement plus both mIoUs. This drives the exact
harness a real-weights certification would use (kernel-level agreement
lives in benchmarks/run_jbu_stages_ab.py; this covers the full
slide/stitch/postprocess path end-to-end). Random weights: the artifact
certifies the MACHINERY and gives an indicative agreement number, not a
quality claim (benchmarks/PERF.md "Reduced-stage fast mode").

    python tools/fastmode_agreement.py [--configs N] [--stages 3] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["RS_OV_DATA_ROOT"] = os.path.join(REPO, "data_synth")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=int, default=6,
                    help="limit to first N configs (0 = all 17)")
    ap.add_argument("--stages", type=int, default=3,
                    help="fast-mode stage count to compare against 4")
    ap.add_argument("--cpu", action="store_true",
                    help="CPU + tiny arch (smoke; default real TPU, full size)")
    ap.add_argument("--jbu-stack-ckpt", default=None,
                    help="path to a REAL trained jbu_stack checkpoint (the "
                         "reference ships two in simfeatup_dev/weights/); "
                         "runs the A/B with trained upsampler weights "
                         "instead of random init")
    ap.add_argument("-o", "--out",
                    default=os.path.join(REPO, "benchmarks",
                                         "fastmode_agreement.json"))
    args = ap.parse_args()

    if args.cpu and args.jbu_stack_ckpt:
        ap.error("--cpu uses the tiny embed_dim=32 tower, which cannot "
                 "consume a production-width jbu_stack checkpoint; drop "
                 "--cpu (real TPU) or --jbu-stack-ckpt (random init)")

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.setdefault("RS_OV_NO_COMPILE_CACHE", "1")

    import numpy as np
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rs_ov.data.datasets import get_dataset_meta
    from rs_ov.data.loader import SegDataset
    from rs_ov.evalsuite.config import load_config
    from rs_ov.evalsuite.metrics import IoUMetric
    from rs_ov.evalsuite.runner import build_segmentor_from_config

    from eval_all import CONFIGS

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_synthetic_datasets import ensure_synthetic_data

    ensure_synthetic_data()  # only 5/17 synthetic datasets are committed

    configs = CONFIGS[:args.configs] if args.configs else CONFIGS

    overrides: dict = {}
    if args.cpu:
        from rs_ov.core.config import CLIPConfig, TextConfig, VisionConfig

        tiny = CLIPConfig(
            embed_dim=32,
            vision=VisionConfig(image_size=64, patch_size=16, width=64,
                                layers=3, output_dim=32, head_width=32),
            text=TextConfig(context_length=77, vocab_size=49408, width=32,
                            heads=2, layers=2, output_dim=32))
        overrides.update(clip_config=tiny, slide_stride=32, slide_crop=64,
                         param_dtype=jnp.float32)

    out = {"what": (f"num_stages=4 vs num_stages={args.stages} SegmentorEx "
                    "over the synthetic smoke datasets, identical weights; "
                    "per-pixel prediction agreement + both mIoUs (machinery "
                    "artifact; real-weights mIoU A/B is the quality gate)"),
           "backend": jax.default_backend(),
           "model": "tiny" if args.cpu else "ViT-B/16",
           "stages_fast": args.stages,
           "upsampler": ({"model_name": "jbu_stack",
                          "trained_ckpt": args.jbu_stack_ckpt}
                         if args.jbu_stack_ckpt else
                         {"model_name": "jbu_one", "weights": "random init"}),
           "configs": {}}

    t0 = time.time()
    for cfg_path in configs:
        name = os.path.basename(cfg_path)
        t = time.time()
        cfg = load_config(cfg_path)
        ds_cfg = cfg["test_dataloader"]["dataset"]
        meta = get_dataset_meta(ds_cfg["type"])
        import dataclasses
        kw = {f: ds_cfg[f] for f in ("img_suffix", "seg_map_suffix",
                                     "reduce_zero_label", "ignore_index")
              if f in ds_cfg}
        if kw:
            meta = dataclasses.replace(meta, **kw)
        prefix = ds_cfg["data_prefix"]
        dataset = SegDataset(ds_cfg["type"], prefix["img_path"],
                             prefix.get("seg_map_path"), meta=meta, raw=True)

        # the baseline side pins num_stages=4 explicitly (strict reference
        # semantics) — the segmentor default is the certified 3-stage mode
        base_sfu = {"model_name": "jbu_one"}
        if args.jbu_stack_ckpt:
            base_sfu = {"model_name": "jbu_stack",
                        "model_path": args.jbu_stack_ckpt}
        seg4_overrides = dict(overrides,
                              sim_feat_up_cfg=dict(base_sfu, num_stages=4))
        seg4 = build_segmentor_from_config(cfg, seg4_overrides)
        segf = build_segmentor_from_config(
            cfg, dict(overrides,
                      sim_feat_up_cfg=dict(base_sfu,
                                           num_stages=args.stages)))

        m4 = IoUMetric(num_classes=len(meta.classes),
                       ignore_index=meta.ignore_index)
        mf = IoUMetric(num_classes=len(meta.classes),
                       ignore_index=meta.ignore_index)
        agree_px = total_px = n_images = 0
        for sample in dataset.prefetch():
            n_images += 1
            p4 = np.asarray(
                seg4.predict_raw(sample.img[None], [sample.meta])[0]
                ["pred_sem_seg"])[0].astype(np.int64)
            pf = np.asarray(
                segf.predict_raw(sample.img[None], [sample.meta])[0]
                ["pred_sem_seg"])[0].astype(np.int64)
            agree_px += int((p4 == pf).sum())
            total_px += p4.size
            if sample.seg is not None:
                m4.process(p4, sample.seg)
                mf.process(pf, sample.seg)
        r4, rf = m4.compute(), mf.compute()
        entry = {
            "n_images": n_images,
            "agreement": round(agree_px / max(total_px, 1), 6),
            "mIoU_4stage": round(r4["mIoU"], 4),
            f"mIoU_{args.stages}stage": round(rf["mIoU"], 4),
            "sec": round(time.time() - t, 1),
        }
        out["configs"][name] = entry
        print(f"[{name}] agreement={entry['agreement']:.4f} "
              f"mIoU {r4['mIoU']:.2f} vs {rf['mIoU']:.2f} "
              f"({entry['sec']:.0f}s)", flush=True)
        # flush partials each config: a tunnel drop mid-run keeps the
        # completed rows
        ag = [c["agreement"] for c in out["configs"].values()]
        out["mean_agreement"] = round(float(np.mean(ag)), 6)
        out["elapsed_sec"] = round(time.time() - t0, 1)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)

    print(f"wrote {args.out}; mean agreement {out.get('mean_agreement')}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
