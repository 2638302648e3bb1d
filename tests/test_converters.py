"""Converter-core parity vs the reference scripts' math."""

import numpy as np

from rs_ov.data.converters.core import clip_boxes, convert_from_color, rgb_to_index_matmul


def test_clip_boxes_match_reference_grid():
    """Same box set as reference potsdam.py:48-73 for a 5120^2 raster."""
    boxes = clip_boxes(5120, 5120, 512, 256)
    assert boxes.shape[1] == 4
    assert (boxes[:, 2] - boxes[:, 0] == 512).all()
    assert (boxes[:, 3] - boxes[:, 1] == 512).all()
    assert boxes[:, 2].max() == 5120 and boxes[:, 3].max() == 5120
    assert boxes[:, 0].min() == 0

    # odd size: edge boxes shift inward, full coverage
    boxes = clip_boxes(700, 1000, 512, 256)
    assert (boxes[:, 2] - boxes[:, 0] == 512).all()
    cover = np.zeros((700, 1000), bool)
    for x1, y1, x2, y2 in boxes:
        cover[y1:y2, x1:x2] = True
    assert cover.all()


def test_rgb_to_index_matmul():
    cmap = np.array([[0, 0, 0], [255, 255, 255], [0, 0, 255]])
    img = np.zeros((2, 3, 3), np.uint8)
    img[0, 1] = [255, 255, 255]
    img[1, 2] = [0, 0, 255]
    out = rgb_to_index_matmul(img, cmap)
    assert out[0, 0] == 0 and out[0, 1] == 1 and out[1, 2] == 2


def test_convert_from_color_with_remap():
    palette = {0: (0, 0, 0), 1: (128, 0, 0), 7: (64, 0, 128)}
    img = np.zeros((2, 2, 3), np.uint8)
    img[0, 0] = (128, 0, 0)
    img[1, 1] = (64, 0, 128)
    out = convert_from_color(img, palette, remap={7: 3})
    assert out[0, 0] == 1 and out[1, 1] == 3 and out[0, 1] == 0
