"""Parity of matmul-formulated resizes vs torch F.interpolate semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from rs_ov.utils.resize import (
    adaptive_avg_pool2d,
    resize_bicubic,
    resize_bicubic_scaled,
    resize_bilinear,
)


@pytest.mark.parametrize("in_hw,out_hw", [((14, 14), (28, 28)), ((16, 16), (224, 224)),
                                          ((224, 224), (512, 512)), ((13, 17), (29, 31)),
                                          ((32, 32), (15, 9))])
def test_bilinear_matches_torch(in_hw, out_hw):
    x = np.random.RandomState(0).randn(2, 3, *in_hw).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=out_hw, mode="bilinear",
                        align_corners=False).numpy()
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((14, 14), (28, 28)), ((7, 7), (53, 53)),
                                          ((28, 28), (14, 14))])
def test_bicubic_matches_torch(in_hw, out_hw):
    x = np.random.RandomState(1).randn(1, 4, *in_hw).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), size=out_hw, mode="bicubic",
                        align_corners=False).numpy()
    got = np.asarray(resize_bicubic(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_bicubic_scale_factor_quirk():
    """Pos-embed interpolation uses scale_factor with a +0.1 fudge."""
    n = 14
    gh, gw = 20, 12
    x = np.random.RandomState(2).randn(1, 8, n, n).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x),
                        scale_factor=((gh + 0.1) / n, (gw + 0.1) / n),
                        mode="bicubic", align_corners=False).numpy()
    assert ref.shape[-2:] == (gh, gw)
    got = np.asarray(resize_bicubic_scaled(jnp.asarray(x), (gh, gw),
                                           (n / (gh + 0.1), n / (gw + 0.1))))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("in_hw,out_hw", [((224, 224), (28, 28)), ((100, 60), (28, 28)),
                                          ((17, 23), (5, 7))])
def test_adaptive_avg_pool(in_hw, out_hw):
    x = np.random.RandomState(3).randn(2, 3, *in_hw).astype(np.float32)
    ref = F.adaptive_avg_pool2d(torch.from_numpy(x), out_hw).numpy()
    got = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_nhwc_variants_match_channel_first():
    """Channel-last resize/pad helpers == channel-first on transposed data."""
    from rs_ov.utils.resize import (reflect_pad_2d, reflect_pad_nhwc,
                                    resize_bicubic, resize_bicubic_nhwc)

    x = np.random.RandomState(4).randn(2, 5, 13, 17).astype(np.float32)
    xj = jnp.asarray(x)
    xt = jnp.asarray(x.transpose(0, 2, 3, 1))
    a = np.asarray(resize_bicubic(xj, (26, 34)))
    b = np.asarray(resize_bicubic_nhwc(xt, (26, 34))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6)
    a = np.asarray(reflect_pad_2d(xj, 3))
    b = np.asarray(reflect_pad_nhwc(xt, 3)).transpose(0, 3, 1, 2)
    np.testing.assert_array_equal(a, b)
