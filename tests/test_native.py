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
