"""Compatibility shim: ``from segmentor import SegmentorEx, get_cls_idx``
(the reference's module layout, reference segmentor.py:25-622)."""

from rs_ov.pipeline.segmentor import SegmentorEx  # noqa: F401
from rs_ov.text.classifier import get_cls_idx  # noqa: F401
