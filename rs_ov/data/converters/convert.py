#!/usr/bin/env python
"""Dataset converter CLI: raw downloads -> mmseg-layout tiles.

    python -m rs_ov.data.converters.convert potsdam  <raw_dir> -o out/
    python -m rs_ov.data.converters.convert uavid    <raw_dir> -o out/
    python -m rs_ov.data.converters.convert isaid    <raw_dir> -o out/
    python -m rs_ov.data.converters.convert binary   <img_dir> <ann_dir> -o out/
    ...

Per-dataset logic mirrors the reference scripts (reference
tools/dataset_converters/*.py); the shared tiling/palette machinery lives in
rs_ov.data.converters.core. The `binary` subcommand covers the
building/road/water datasets whose masks are already 0/255 PNGs (whu.py,
inria.py, xBD.py, chn6-cug.py, deepglobe_road.py, roadval.py, wbs-si.py —
0/255 -> 0/1 index masks, optional tiling).
"""

from __future__ import annotations

import argparse
import glob
import os
import os.path as osp

import numpy as np

from rs_ov.data.converters.core import (clip_boxes, convert_from_color,
                                        rgb_to_index_matmul, save_png, tile_image)

# ISPRS Potsdam/Vaihingen BGR color map (reference potsdam.py:76-80; note the
# reference reads BGR via mmcv.imread — we read RGB, so the map is flipped)
_ISPRS_COLOR_RGB = np.array([
    [0, 0, 0], [255, 255, 255], [0, 0, 255], [0, 255, 255],
    [0, 255, 0], [255, 255, 0], [255, 0, 0]])

_UAVID_PALETTE = {0: (0, 0, 0), 1: (128, 0, 0), 2: (128, 64, 128),
                  3: (192, 0, 192), 4: (0, 128, 0), 5: (128, 128, 0),
                  6: (64, 64, 0), 7: (64, 0, 128)}  # 7 = Moving_Car

_ISAID_PALETTE = {0: (0, 0, 0), 1: (0, 0, 63), 2: (0, 63, 63), 3: (0, 63, 0),
                  4: (0, 63, 127), 5: (0, 63, 191), 6: (0, 63, 255),
                  7: (0, 127, 63), 8: (0, 127, 127), 9: (0, 0, 127),
                  10: (0, 0, 191), 11: (0, 0, 255), 12: (0, 191, 127),
                  13: (0, 127, 191), 14: (0, 127, 255), 15: (0, 100, 155)}


def _load_rgb(path):
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"))


def _iter_images(d, exts=("png", "tif", "tiff", "jpg", "jpeg", "JPG")):
    for ext in exts:
        yield from sorted(glob.glob(osp.join(d, f"*.{ext}")))


def convert_isprs(raw_dir, out_dir, clip_size=512, stride_size=256,
                  label_subdir="labels", image_subdir="images"):
    """Potsdam/Vaihingen-style: tile images + RGB label maps -> index masks
    (reference potsdam.py:35-110 / vaihingen.py)."""
    for split in ("train", "validation"):
        img_out = osp.join(out_dir, "images", split)
        ann_out = osp.join(out_dir, "annotations", split)
        src_img = osp.join(raw_dir, image_subdir, split)
        src_ann = osp.join(raw_dir, label_subdir, split)
        if not osp.isdir(src_img):
            continue
        for path in _iter_images(src_img):
            stem = osp.splitext(osp.basename(path))[0]
            tile_image(_load_rgb(path), img_out, stem, clip_size, stride_size)
        for path in _iter_images(src_ann):
            stem = osp.splitext(osp.basename(path))[0]
            label = rgb_to_index_matmul(_load_rgb(path), _ISPRS_COLOR_RGB)
            tile_image(label, ann_out, stem, clip_size, stride_size, pad_val=255)


def convert_uavid(raw_dir, out_dir, clip_size=1024, stride_size=512):
    """UAVid: color labels -> indices w/ Moving_Car -> Static_Car
    (reference uavid.py:26-32, :85-130)."""
    for seq in sorted(glob.glob(osp.join(raw_dir, "seq*"))):
        for path in _iter_images(osp.join(seq, "Images")):
            stem = f"{osp.basename(seq)}_{osp.splitext(osp.basename(path))[0]}"
            tile_image(_load_rgb(path), osp.join(out_dir, "images"),
                       stem, clip_size, stride_size)
        for path in _iter_images(osp.join(seq, "Labels")):
            stem = f"{osp.basename(seq)}_{osp.splitext(osp.basename(path))[0]}"
            label = convert_from_color(_load_rgb(path), _UAVID_PALETTE,
                                       remap={7: 3})
            tile_image(label, osp.join(out_dir, "annotations"),
                       stem, clip_size, stride_size, pad_val=255)


def convert_isaid(raw_dir, out_dir, patch=896, stride=512):
    """iSAID: instance-color labels -> semantic indices, 255-padded tiles
    (reference isaid.py:38-48, :100-150)."""
    for split in ("train", "val"):
        src = osp.join(raw_dir, split)
        if not osp.isdir(src):
            continue
        for path in _iter_images(osp.join(src, "images")):
            stem = osp.splitext(osp.basename(path))[0]
            if stem.endswith("_instance_color_RGB"):
                label = convert_from_color(_load_rgb(path), _ISAID_PALETTE)
                tile_image(label, osp.join(out_dir, "annotations", split),
                           stem, patch, stride, pad_val=255)
            else:
                tile_image(_load_rgb(path), osp.join(out_dir, "images", split),
                           stem, patch, stride, pad_val=0)


def convert_loveda(raw_dir, out_dir):
    """LoveDA: reorganise the unzipped Train/Val/Test trees (Rural + Urban)
    into the mmseg images/annotations layout (reference loveda.py:22-74 —
    pure file moves, no pixel transforms; masks are already index maps)."""
    import shutil

    split_map = {"Train": "train", "Val": "validation", "Test": "test"}
    for raw_split, split in split_map.items():
        for domain in ("Rural", "Urban"):
            src = osp.join(raw_dir, raw_split, domain)
            if not osp.isdir(src):
                continue
            img_out = osp.join(out_dir, "images", split)
            ann_out = osp.join(out_dir, "annotations", split)
            os.makedirs(img_out, exist_ok=True)
            os.makedirs(ann_out, exist_ok=True)
            for path in _iter_images(osp.join(src, "images_png")):
                shutil.copy(path, osp.join(img_out, osp.basename(path)))
            mask_dir = osp.join(src, "masks_png")
            if osp.isdir(mask_dir):
                for path in _iter_images(mask_dir):
                    shutil.copy(path, osp.join(ann_out, osp.basename(path)))


def convert_openearthmap(raw_dir, out_dir, val_list=None):
    """OpenEarthMap: regions/<name>/{images,labels}/*.tif -> flat
    img_dir/ann_dir per split, split by the official val file list
    (reference openearthmap.py pattern)."""
    import glob as _glob
    import shutil

    val_names = set()
    if val_list and osp.exists(val_list):
        val_names = {line.strip() for line in open(val_list) if line.strip()}
    for img_path in sorted(_glob.glob(osp.join(raw_dir, "*", "images", "*.tif"))):
        name = osp.basename(img_path)
        split = "val" if name in val_names else "train"
        os.makedirs(osp.join(out_dir, "img_dir", split), exist_ok=True)
        os.makedirs(osp.join(out_dir, "ann_dir", split), exist_ok=True)
        shutil.copy(img_path, osp.join(out_dir, "img_dir", split, name))
        label = img_path.replace(osp.sep + "images" + osp.sep,
                                 osp.sep + "labels" + osp.sep)
        if osp.exists(label):
            shutil.copy(label, osp.join(out_dir, "ann_dir", split, name))


def convert_binary(img_dir, ann_dir, out_dir, threshold=128,
                   clip_size=0, stride_size=0):
    """Building/road/water datasets: 0/255 masks -> 0/1 index masks
    (reference whu.py / inria.py / xBD.py / chn6-cug.py / *_road.py pattern),
    optional tiling when clip_size > 0."""
    from PIL import Image

    img_out = osp.join(out_dir, "images")
    ann_out = osp.join(out_dir, "annotations")
    os.makedirs(img_out, exist_ok=True)
    os.makedirs(ann_out, exist_ok=True)
    for path in _iter_images(img_dir):
        stem = osp.splitext(osp.basename(path))[0]
        img = _load_rgb(path)
        if clip_size:
            tile_image(img, img_out, stem, clip_size, stride_size or clip_size)
        else:
            save_png(img, osp.join(img_out, f"{stem}.png"))
    for path in _iter_images(ann_dir):
        stem = osp.splitext(osp.basename(path))[0]
        mask = np.asarray(Image.open(path))
        if mask.ndim == 3:
            mask = mask[..., 0]
        mask = (mask >= threshold).astype(np.uint8)
        if clip_size:
            tile_image(mask, ann_out, stem, clip_size, stride_size or clip_size,
                       pad_val=255)
        else:
            save_png(mask, osp.join(ann_out, f"{stem}.png"))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="dataset", required=True)

    p = sub.add_parser("potsdam")
    p.add_argument("raw_dir")
    p.add_argument("-o", "--out_dir", required=True)
    p.add_argument("--clip_size", type=int, default=512)
    p.add_argument("--stride_size", type=int, default=256)

    p = sub.add_parser("vaihingen")
    p.add_argument("raw_dir")
    p.add_argument("-o", "--out_dir", required=True)
    p.add_argument("--clip_size", type=int, default=512)
    p.add_argument("--stride_size", type=int, default=256)

    p = sub.add_parser("uavid")
    p.add_argument("raw_dir")
    p.add_argument("-o", "--out_dir", required=True)
    p.add_argument("--clip_size", type=int, default=1024)
    p.add_argument("--stride_size", type=int, default=512)

    p = sub.add_parser("isaid")
    p.add_argument("raw_dir")
    p.add_argument("-o", "--out_dir", required=True)
    p.add_argument("--patch", type=int, default=896)
    p.add_argument("--stride", type=int, default=512)

    p = sub.add_parser("loveda")
    p.add_argument("raw_dir")
    p.add_argument("-o", "--out_dir", required=True)

    p = sub.add_parser("openearthmap")
    p.add_argument("raw_dir")
    p.add_argument("-o", "--out_dir", required=True)
    p.add_argument("--val_list", default=None)

    p = sub.add_parser("binary")
    p.add_argument("img_dir")
    p.add_argument("ann_dir")
    p.add_argument("-o", "--out_dir", required=True)
    p.add_argument("--threshold", type=int, default=128)
    p.add_argument("--clip_size", type=int, default=0)
    p.add_argument("--stride_size", type=int, default=0)

    args = parser.parse_args()
    if args.dataset in ("potsdam", "vaihingen"):
        convert_isprs(args.raw_dir, args.out_dir, args.clip_size, args.stride_size)
    elif args.dataset == "uavid":
        convert_uavid(args.raw_dir, args.out_dir, args.clip_size, args.stride_size)
    elif args.dataset == "isaid":
        convert_isaid(args.raw_dir, args.out_dir, args.patch, args.stride)
    elif args.dataset == "loveda":
        convert_loveda(args.raw_dir, args.out_dir)
    elif args.dataset == "openearthmap":
        convert_openearthmap(args.raw_dir, args.out_dir, args.val_list)
    elif args.dataset == "binary":
        convert_binary(args.img_dir, args.ann_dir, args.out_dir, args.threshold,
                       args.clip_size, args.stride_size)


if __name__ == "__main__":
    main()
