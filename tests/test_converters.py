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


def _write_png(path, arr):
    from PIL import Image
    import os
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr.astype(np.uint8)).save(path)


def test_named_binary_drivers(tmp_path):
    """whu / xbd / chn6-cug drivers reproduce the reference scripts' file
    layout and 0/1 thresholding (reference whu.py:45-52, xBD.py:36-41,
    chn6-cug.py:27-43)."""
    from PIL import Image

    from rs_ov.data.converters.convert import (convert_gt_images, convert_whu,
                                               convert_xbd)

    mask = np.zeros((8, 8), np.uint8)
    mask[2:4] = 200  # above whu threshold 128

    raw = tmp_path / "whu"
    _write_png(str(raw / "train" / "OUT" / "a.png"), mask)
    convert_whu(str(raw), str(tmp_path / "whu_out"))
    out = np.asarray(Image.open(tmp_path / "whu_out" / "train" / "label_cvt" / "a.png"))
    assert set(np.unique(out)) == {0, 1} and out[2, 0] == 1 and out[0, 0] == 0

    raw = tmp_path / "xbd"
    dmg = np.zeros((8, 8), np.uint8)
    dmg[1, 1] = 3  # any damage level >= 1 -> building
    _write_png(str(raw / "targets" / "b_target.png"), dmg)
    convert_xbd(str(raw), str(tmp_path / "xbd_out"))
    out = np.asarray(Image.open(tmp_path / "xbd_out" / "targets_cvt" / "b.png"))
    assert out[1, 1] == 1 and out.sum() == 1  # '_target' stripped

    raw = tmp_path / "chn6"
    _write_png(str(raw / "gt" / "c_mask.png"), mask)
    _write_png(str(raw / "images" / "c_sat.png"),
               np.zeros((8, 8, 3), np.uint8))
    convert_gt_images(str(raw), str(tmp_path / "chn6_out"), image_subdir="images")
    assert (tmp_path / "chn6_out" / "label_cvt" / "c.png").exists()
    assert (tmp_path / "chn6_out" / "image_cvt" / "c.png").exists()


def test_inria_driver_splits_and_tiles(tmp_path):
    """Inria: only the fixed val/test rasters convert, tiled to clip_size
    with box-coordinate names (reference inria.py:89-136)."""
    from rs_ov.data.converters.convert import convert_inria

    raw = tmp_path / "inria"
    img = np.random.RandomState(0).randint(0, 255, (20, 20, 3))
    gt = np.zeros((20, 20), np.uint8)
    gt[:10] = 255
    # austin1 is in split_test; austin2 is train -> skipped
    for stem in ("austin1", "austin2"):
        _write_png(str(raw / "images" / f"{stem}.tif"), img)
        _write_png(str(raw / "gt" / f"{stem}.tif"), gt)
    convert_inria(str(raw), str(tmp_path / "out"), clip_size=10, stride_size=10)

    import glob
    tiles = sorted(glob.glob(str(tmp_path / "out" / "img_dir" / "split_test" / "*.png")))
    assert len(tiles) == 4 and "austin1_0_0_10_10" in tiles[0]
    assert not glob.glob(str(tmp_path / "out" / "**" / "austin2*"), recursive=True)
    anns = glob.glob(str(tmp_path / "out" / "ann_dir" / "split_test" / "*.png"))
    assert len(anns) == 4
