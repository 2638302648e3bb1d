"""IoU metric — mmseg `IoUMetric` semantics, collective-reduction ready.

Accumulates per-class (intersect, union, pred_area, label_area) exactly like
mmseg's IoUMetric (the reference's evaluator, reference configs/base_config.py
:27): pixels equal to ignore_index are dropped, per-image histograms are
summed over the dataset, then
    IoU_c  = intersect_c / union_c          mIoU = nanmean
    Acc_c  = intersect_c / label_c          mAcc = nanmean
    aAcc   = sum(intersect) / sum(label).

The accumulator is a plain [4, C] array, so multi-host / multi-chip eval
reduces it with one `jax.lax.psum` (see rs_ov.parallel) — the TPU-native
replacement for mmengine's distributed metric collection.
"""

from __future__ import annotations

import numpy as np

__all__ = ["IoUMetric", "confusion_update"]


def confusion_update(pred: np.ndarray, label: np.ndarray, num_classes: int,
                     ignore_index: int = 255) -> np.ndarray:
    """Per-image [4, C] histogram: intersect, union, pred_area, label_area."""
    mask = label != ignore_index
    pred = pred[mask]
    label = label[mask]
    inter = pred[pred == label]
    area_inter = np.bincount(inter, minlength=num_classes)[:num_classes]
    area_pred = np.bincount(pred, minlength=num_classes)[:num_classes]
    area_label = np.bincount(label, minlength=num_classes)[:num_classes]
    area_union = area_pred + area_label - area_inter
    return np.stack([area_inter, area_union, area_pred, area_label]).astype(np.float64)


class IoUMetric:
    def __init__(self, num_classes: int, ignore_index: int = 255,
                 class_names: tuple[str, ...] | None = None):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.class_names = class_names
        self.state = np.zeros((4, num_classes), np.float64)

    def process(self, pred: np.ndarray, label: np.ndarray) -> None:
        self.state += confusion_update(pred.reshape(-1).astype(np.int64),
                                       label.reshape(-1).astype(np.int64),
                                       self.num_classes, self.ignore_index)

    def merge(self, state: np.ndarray) -> None:
        """Fold in a state from another shard (psum'd or host-gathered)."""
        self.state += state

    def compute(self) -> dict:
        inter, union, _, label = self.state
        with np.errstate(divide="ignore", invalid="ignore"):
            iou = inter / union
            acc = inter / label
        result = {
            "aAcc": float(np.nansum(inter) / np.nansum(label) * 100.0),
            "mIoU": float(np.nanmean(np.where(union > 0, iou, np.nan)) * 100.0),
            "mAcc": float(np.nanmean(np.where(label > 0, acc, np.nan)) * 100.0),
            "IoU": (iou * 100.0).tolist(),
            "Acc": (acc * 100.0).tolist(),
        }
        if self.class_names:
            result["per_class"] = {
                n: {"IoU": float(iou[i] * 100.0), "Acc": float(acc[i] * 100.0)}
                for i, n in enumerate(self.class_names)
            }
        return result
