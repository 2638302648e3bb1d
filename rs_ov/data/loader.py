"""Directory-walking segmentation dataset loader (mmseg layout).

Replaces the mmengine Runner/dataloader stack with a dependency-light
iterator over (image, annotation) pairs laid out as
``data_prefix.img_path`` / ``data_prefix.seg_map_path`` with per-dataset
suffixes (the layout the reference's configs describe, e.g.
reference configs/cfg_potsdam.py:22-33).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from rs_ov.data.datasets import DatasetMeta, get_dataset_meta
from rs_ov.data.transforms import load_annotation, load_image, preprocess_image

__all__ = ["SegSample", "SegDataset"]


@dataclass
class SegSample:
    img: np.ndarray          # [3, H, W] float32 normalised, or (raw mode)
                             # [H, W, 3] uint8 RGB for Segmentor.predict_raw
    seg: Optional[np.ndarray]  # [H, W] int64 labels (ignore_index=255) or None
    meta: dict


class SegDataset:
    """Iterable eval dataset; optionally sharded for data-parallel eval.

    raw=True skips host-side normalisation and yields [H, W, 3] uint8 — the
    Segmentor.predict_raw contract (normalisation fused on device)."""

    def __init__(self, dataset_type: str, img_dir: str, seg_dir: str | None = None,
                 meta: DatasetMeta | None = None, shard: tuple[int, int] = (0, 1),
                 max_samples: int | None = None, raw: bool = False):
        self.raw = raw
        self.meta = meta or get_dataset_meta(dataset_type)
        self.img_dir = img_dir
        self.seg_dir = seg_dir
        suffix = self.meta.img_suffix
        names = sorted(f for f in os.listdir(img_dir) if f.endswith(suffix))
        rank, world = shard
        names = names[rank::world]
        if max_samples:
            names = names[:max_samples]
        self._stems = [n[: -len(suffix)] for n in names]

    def __len__(self) -> int:
        return len(self._stems)

    def __iter__(self) -> Iterator[SegSample]:
        for stem in self._stems:
            yield self.load(stem)

    def prefetch(self, lookahead: int = 2) -> Iterator[SegSample]:
        """Background-thread prefetching iterator: decode+preprocess of the
        next images overlaps TPU compute (the mmengine num_workers role)."""
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=lookahead) as pool:
            futures = [pool.submit(self.load, s) for s in self._stems[:lookahead]]
            for i in range(len(self._stems)):
                nxt = i + lookahead
                if nxt < len(self._stems):
                    futures.append(pool.submit(self.load, self._stems[nxt]))
                yield futures[i].result()
                futures[i] = None  # release memory

    def load(self, stem: str) -> SegSample:
        img_path = os.path.join(self.img_dir, stem + self.meta.img_suffix)
        rgb = load_image(img_path)
        seg = None
        if self.seg_dir:
            seg_path = os.path.join(self.seg_dir, stem + self.meta.seg_map_suffix)
            if os.path.exists(seg_path):
                seg = load_annotation(seg_path, self.meta.reduce_zero_label,
                                      self.meta.ignore_index)
        return SegSample(
            img=rgb if self.raw else preprocess_image(rgb),
            seg=seg,
            meta={"img_path": img_path, "ori_shape": rgb.shape[:2],
                  "img_shape": rgb.shape[:2]},
        )
