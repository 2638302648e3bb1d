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

import functools

import numpy as np

__all__ = ["IoUMetric", "confusion_update", "device_confusion_update"]


def _device_conf_fn():
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("c", "ig"))
    def f(state, pred, label, c, ig):
        """state [4, C] float32 + batch histogram of (pred, label) [N, H, W]
        int arrays — all ON DEVICE. Invalid (ignore_index) pixels bucket into
        class index c and are sliced off; mismatched valid pixels bucket
        their intersect count there too. Same math as confusion_update."""
        p = pred.reshape(-1).astype(jnp.int32)
        lbl = label.reshape(-1).astype(jnp.int32)
        valid = lbl != ig
        pv = jnp.where(valid, p, c)
        lv = jnp.where(valid, lbl, c)
        inter = jnp.where(pv == lv, pv, c)
        ai = jnp.bincount(inter, length=c + 1)[:c]
        ap = jnp.bincount(pv, length=c + 1)[:c]
        al = jnp.bincount(lv, length=c + 1)[:c]
        return state + jnp.stack([ai, ap + al - ai, ap, al]
                                 ).astype(jnp.float32)

    return f


_device_conf = None


def device_confusion_update(state, pred, label, num_classes: int,
                            ignore_index: int = 255):
    """On-device accumulate: returns a new device-resident [4, C] state.
    Nothing crosses the host boundary — the eval loop uploads uint8 labels
    with the batch and downloads ONLY the final [4, C] state, instead of a
    full prediction raster per image (the tunnel round trips that dominated
    the eval loop: benchmarks/eval_overlap_ab.json)."""
    global _device_conf
    if _device_conf is None:
        _device_conf = _device_conf_fn()
    return _device_conf(state, pred, label, num_classes, ignore_index)


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
