"""Native C++ preprocessing vs numpy reference."""

import numpy as np
import pytest

from rs_ov import native


def test_normalize_matches_numpy():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (123, 77, 3), dtype=np.uint8)
    mean = np.array([122.771, 116.746, 104.094], np.float32)
    std = np.array([68.501, 66.632, 70.323], np.float32)
    ref = ((img.astype(np.float32) - mean) / std).transpose(2, 0, 1)
    got = native.normalize_hwc_to_chw(img, mean, std)
    np.testing.assert_allclose(got, ref, atol=1e-5)

    imgf = rng.rand(64, 64, 3).astype(np.float32) * 255
    ref = ((imgf - mean) / std).transpose(2, 0, 1)
    got = native.normalize_hwc_to_chw(imgf, mean, std)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_extract_tiles_matches_numpy():
    rng = np.random.RandomState(1)
    img = rng.randn(3, 96, 96).astype(np.float32)
    coords = [(0, 0, 64, 64), (0, 32, 64, 96), (32, 0, 96, 64), (32, 32, 96, 96)]
    ref = np.stack([img[:, y1:y2, x1:x2] for y1, x1, y2, x2 in coords])
    got = native.extract_tiles_chw(img, coords)
    np.testing.assert_allclose(got, ref)


def test_native_lib_builds():
    """The toolchain is baked into this image; the lib should really build."""
    assert native.available(), "C++ preprocessing library failed to build"


def test_native_decode_builds():
    """libpng/libjpeg are baked into this image; decode should really build."""
    assert native.decode_available(), "C++ decode path failed to build"


def _png_bytes(arr, mode=None, palette=False):
    import io

    from PIL import Image
    im = Image.fromarray(arr, mode=mode)
    if palette:
        im = im.convert("P")
    buf = io.BytesIO()
    im.save(buf, "PNG")
    return buf.getvalue()


def test_decode_rgb_parity_with_pil(tmp_path):
    """load_image: native decoder == PIL for every format the eval data
    layer uses (RGB/gray/palette/RGBA PNG, JPEG — same libjpeg as PIL)."""
    import io

    from PIL import Image

    from rs_ov.data.transforms import load_image

    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 256, (37, 53, 3), np.uint8)
    cases = {
        "rgb.png": _png_bytes(rgb),
        "gray.png": _png_bytes(rng.randint(0, 256, (21, 33), np.uint8)),
        "pal.png": _png_bytes(rgb, palette=True),
        "rgba.png": _png_bytes(
            np.concatenate([rgb, rng.randint(0, 256, (37, 53, 1), np.uint8)],
                           axis=-1)),
    }
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "JPEG", quality=90)
    cases["img.jpg"] = buf.getvalue()

    for name, data in cases.items():
        p = tmp_path / name
        p.write_bytes(data)
        got = load_image(str(p))
        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        np.testing.assert_array_equal(got, ref, err_msg=name)
        assert got.dtype == np.uint8 and got.shape == ref.shape


def test_decode_labels_parity_with_pil(tmp_path):
    """load_annotation: palette indices preserved, gray exact, RGB-coded
    labels collapse to channel 0, reduce_zero_label applies — all equal to
    the PIL path's semantics."""
    from rs_ov.data.transforms import load_annotation

    rng = np.random.RandomState(1)
    labels = rng.randint(0, 7, (21, 33)).astype(np.uint8)

    gray = tmp_path / "gray.png"
    gray.write_bytes(_png_bytes(labels))
    np.testing.assert_array_equal(load_annotation(str(gray)), labels)

    pal = tmp_path / "pal.png"
    pal.write_bytes(_png_bytes(labels, palette=True))
    np.testing.assert_array_equal(load_annotation(str(pal)), labels)

    rgbl = tmp_path / "rgb.png"
    rgbl.write_bytes(_png_bytes(np.stack([labels, labels * 0, labels * 0], -1)))
    np.testing.assert_array_equal(load_annotation(str(rgbl)), labels)

    got = load_annotation(str(gray), reduce_zero_label=True)
    ref = labels.astype(np.int64).copy()
    ref[ref == 0] = 255
    ref = ref - 1
    ref[ref == 254] = 255
    np.testing.assert_array_equal(got, ref)


def test_decode_16bit_falls_back_to_pil(tmp_path):
    """16-bit PNGs route to PIL and still load correctly."""
    import io

    from PIL import Image

    from rs_ov.data.transforms import load_annotation

    rng = np.random.RandomState(2)
    lab16 = rng.randint(0, 1000, (9, 11)).astype(np.uint16)
    buf = io.BytesIO()
    Image.fromarray(lab16).save(buf, "PNG")
    assert native.decode_gray(buf.getvalue()) is None
    p = tmp_path / "l16.png"
    p.write_bytes(buf.getvalue())
    ref = np.asarray(Image.open(io.BytesIO(buf.getvalue()))).astype(np.int64)
    np.testing.assert_array_equal(load_annotation(str(p)), ref)
