"""Compatibility shim: ``from segearth_segmentor import Segmentor``
(the reference's plain SegEarth-OV entry, reference segearth_segmentor.py:23)."""

from rs_ov.pipeline.segmentor import Segmentor  # noqa: F401
from rs_ov.text.classifier import get_cls_idx  # noqa: F401
