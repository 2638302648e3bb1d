"""Transform parity: resize modes + CenterCropOrPad + train-aug plumb.

Reference: open_clip/transform.py:84-236 (ResizeKeepRatio, CenterCropOrPad,
center_crop_or_pad) and :274-389 (image_transform mode dispatch). The
reference stack can't execute here (torchvision absent), so the tests check
the documented formulas by exact arithmetic on odd-sized images (the
round-3 VERDICT done-criterion) — PIL performs the actual resampling in
BOTH stacks, so the resize step is identical by construction.
"""

import numpy as np
import pytest
from PIL import Image

from rs_ov.factory import center_crop_or_pad, image_transform

MEAN = np.asarray((0.48145466, 0.4578275, 0.40821073), np.float32)
STD = np.asarray((0.26862954, 0.26130258, 0.27577711), np.float32)


def _denorm(x_chw):
    return x_chw * STD[:, None, None] + MEAN[:, None, None]


def _img(h, w, seed=0):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)


def test_center_crop_or_pad_pad_split():
    """reference transform.py:190-196: left/top get floor, right/bottom get
    ceil of the deficit."""
    x = np.full((5, 19, 3), 7, np.uint8)
    out = center_crop_or_pad(x, (32, 32), fill=0)
    assert out.shape == (32, 32, 3)
    # width deficit 13 -> left 6, right 7; height deficit 27 -> top 13, bottom 14
    assert (out[:, :6] == 0).all() and (out[:, -7:] == 0).all()
    assert (out[:13] == 0).all() and (out[-14:] == 0).all()
    assert (out[13:13 + 5, 6:6 + 19] == 7).all()


def test_center_crop_or_pad_crop_origin_rounds_half():
    """crop origin int(round((size-crop)/2.0)): torchvision F.center_crop."""
    x = np.arange(7 * 7).reshape(7, 7, 1).astype(np.uint8)
    out = center_crop_or_pad(x, (4, 4))
    # (7-4)/2 = 1.5 -> round() -> 2 (banker's rounds 1.5 to 2)
    assert out.shape == (4, 4, 1)
    np.testing.assert_array_equal(out[..., 0], x[2:6, 2:6, 0])


def test_center_crop_or_pad_mixed_pad_and_crop():
    x = np.full((40, 10, 3), 9, np.uint8)
    out = center_crop_or_pad(x, (32, 32), fill=1)
    assert out.shape == (32, 32, 3)
    assert (out[:, :11] == 1).all() and (out[:, -11:] == 1).all()
    assert (out[:, 11:21] == 9).all()


def test_longest_mode_fits_box_then_pads():
    """ResizeKeepRatio(longest=1): ratio = max(h/th, w/tw); the resized
    image FITS inside the target and is then zero-padded to it."""
    t = image_transform(32, resize_mode="longest")
    out = t(np.full((100, 60, 3), 200, np.uint8))
    assert out.shape == (3, 32, 32)
    img = _denorm(out) * 255.0
    # ratio = max(100/32, 60/32) = 3.125 -> resize to (32, round(60/3.125)=19)
    # pad width 13 -> left 6, right 7
    assert np.allclose(img[:, :, :6], 0, atol=0.5)
    assert np.allclose(img[:, :, -7:], 0, atol=0.5)
    assert np.allclose(img[:, :, 6:25], 200, atol=1.0)


def test_longest_mode_fill_color():
    t = image_transform(32, resize_mode="longest", fill_color=255)
    out = t(np.zeros((64, 32, 3), np.uint8))
    img = _denorm(out) * 255.0
    # ratio = 2 -> (32, 16); pad left 8, right 8 with 255
    assert np.allclose(img[:, :, :8], 255, atol=0.5)
    assert np.allclose(img[:, :, 24:], 255, atol=0.5)
    assert np.allclose(img[:, :, 8:24], 0, atol=0.5)


def test_shortest_scalar_resize_truncates_long_side():
    """torchvision scalar Resize: long = int(size * long / short), NOT
    rounded — 33x100 at size 32 gives long side int(32*100/33)=96."""
    src = _img(33, 100)
    t = image_transform(32, resize_mode="shortest")
    out = t(src)
    assert out.shape == (3, 32, 32)
    want = np.asarray(Image.fromarray(src).resize((96, 32), Image.BICUBIC))
    # center crop left = int(round((96-32)/2.0)) = 32
    want = want[:, 32:64].astype(np.float32) / 255.0
    got = _denorm(out).transpose(1, 2, 0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_shortest_tuple_target_uses_keep_ratio_round():
    """Non-square target: ResizeKeepRatio(longest=0) rounds both sides."""
    t = image_transform((16, 32), resize_mode="shortest")
    out = t(_img(50, 70))
    assert out.shape == (3, 16, 32)


def test_squash_matches_pil_resize():
    src = _img(41, 67, seed=3)
    t = image_transform(24, resize_mode="squash")
    got = _denorm(t(src)).transpose(1, 2, 0)
    want = np.asarray(
        Image.fromarray(src).resize((24, 24), Image.BICUBIC)
    ).astype(np.float32) / 255.0
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_is_train_returns_augmenting_transform():
    """factory.image_transform(is_train=True) plumbs to data.augment
    (reference transform.py:300-358 branch)."""
    t = image_transform(32, is_train=True,
                        aug_cfg={"scale": (0.5, 0.9),
                                 "horizontal_flip_prob": 0.5})
    outs = [t(_img(64, 64, seed=7)) for _ in range(4)]
    assert all(o.shape == (3, 32, 32) for o in outs)
    # random crops: consecutive outputs differ
    assert any(not np.allclose(outs[0], o) for o in outs[1:])


def test_is_train_rejected_kwargs_surface():
    with pytest.raises(TypeError):
        image_transform(32, is_train=True, aug_cfg={"not_a_field": 1})


def test_grayscale_input_converted_to_rgb():
    t = image_transform(16, resize_mode="squash")
    out = t(np.full((20, 20), 128, np.uint8))
    assert out.shape == (3, 16, 16)
