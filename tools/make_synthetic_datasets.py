#!/usr/bin/env python
"""Generate tiny synthetic datasets for every eval config.

No real remote-sensing data exists in this zero-egress image; this writes a
few random images + label masks per config under ``data_synth/`` (mirroring
each config's ``data_prefix`` layout) so ``eval_all.py`` can be smoke-run
end-to-end (configs, loaders, per-dataset label conventions, metrics, result
writers) on real hardware. Metrics on random weights + random data are
meaningless — the point is exercising every dataset path.

Synthetic data is kept strictly OUTSIDE the real dataset paths the configs
ship with: run eval against it via the config-loader remap knob, e.g.

    python tools/make_synthetic_datasets.py [--size 256] [--n 2] [--force]
    RS_OV_DATA_ROOT=$PWD/data_synth python eval_all.py --max-samples 2

(--root changes the output root; --real-paths writes into the configs'
actual paths, only if you really mean it.)
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256, help="image H=W")
    ap.add_argument("--n", type=int, default=2, help="images per dataset")
    ap.add_argument("--force", action="store_true", help="overwrite existing")
    ap.add_argument("--root", default=os.path.join(REPO, "data_synth"),
                    help="root dir to mirror dataset layouts under")
    ap.add_argument("--real-paths", action="store_true",
                    help="write into the configs' real data paths (NOT "
                         "recommended: mixes synthetic files into real "
                         "dataset dirs)")
    args = ap.parse_args()

    if not args.real_paths:
        os.environ["RS_OV_DATA_ROOT"] = args.root

    from PIL import Image

    from eval_all import CONFIGS
    from rs_ov.data.datasets import get_dataset_meta
    from rs_ov.evalsuite.config import load_config

    rng = np.random.RandomState(0)
    made, skipped = [], []
    for config in CONFIGS:
        cfg = load_config(os.path.join(REPO, config))
        ds_cfg = cfg["test_dataloader"]["dataset"]
        meta = get_dataset_meta(ds_cfg["type"])
        overrides = {f: ds_cfg[f] for f in
                     ("img_suffix", "seg_map_suffix", "reduce_zero_label")
                     if f in ds_cfg}
        if overrides:
            meta = dataclasses.replace(meta, **overrides)
        prefix = ds_cfg["data_prefix"]
        img_dir = prefix["img_path"]
        seg_dir = prefix.get("seg_map_path")
        if os.path.isdir(img_dir) and os.listdir(img_dir) and not args.force:
            skipped.append(config)
            continue
        os.makedirs(img_dir, exist_ok=True)
        if seg_dir:
            os.makedirs(seg_dir, exist_ok=True)
        n_cls = len(meta.classes)
        # reduce_zero_label datasets store labels 1..C (0 = to-ignore)
        lo, hi = (1, n_cls + 1) if meta.reduce_zero_label else (0, n_cls)
        for i in range(args.n):
            img = rng.randint(0, 255, (args.size, args.size, 3), dtype=np.uint8)
            Image.fromarray(img).save(
                os.path.join(img_dir, f"syn{i}{meta.img_suffix}"))
            if seg_dir:
                mask = rng.randint(lo, hi, (args.size, args.size)).astype(np.uint8)
                Image.fromarray(mask).save(
                    os.path.join(seg_dir, f"syn{i}{meta.seg_map_suffix}"))
        made.append(config)
    print(f"created {len(made)} synthetic datasets; "
          f"skipped {len(skipped)} already present")


if __name__ == "__main__":
    main()


def ensure_synthetic_data(root: str | None = None) -> None:
    """Regenerate any missing synthetic datasets under ``root`` (default
    <repo>/data_synth). Only 5 of the 17 are committed; tools that eval all
    configs call this instead of failing on a fresh checkout."""
    import subprocess
    import sys as _sys

    root = root or os.path.join(REPO, "data_synth")
    probe = os.path.join(root, "payload", "datasets", "LoveDA")
    if os.path.isdir(probe):
        return
    subprocess.run(
        [_sys.executable, os.path.abspath(__file__), "--root", root],
        check=True, timeout=600)
