"""SOM acceptance tests — ported from the reference's test_som.py (the
reference ships these tests but not the module; SOM_IMPLEMENTATION.md +
SOM_DETECTION_MODES.md specify the behaviour)."""

import numpy as np

import jax.numpy as jnp

from rs_ov.decontam.som import suppress_outlier_module


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_som_basic():
    rng = np.random.RandomState(0)
    b, gh, gw, c = 1, 4, 4, 768
    p = gh * gw
    tokens = rng.randn(b, p, c).astype(np.float32)
    heads, n = 12, p + 1
    attn = _softmax(rng.rand(b, heads, n, n).astype(np.float32))
    planted = [5, 10]
    for idx in planted:
        attn[:, :, idx + 1, idx + 1] = 0.01
        attn[:, :, 0, idx + 1] = 0.5

    purified, mask, conf = suppress_outlier_module(
        jnp.asarray(tokens), jnp.asarray(attn), gh, gw)
    purified, mask, conf = map(np.asarray, (purified, mask, conf))
    assert purified.shape == tokens.shape
    assert mask.shape == (b, gh, gw)
    flat = mask.reshape(b, p)
    detected = set(np.nonzero(flat[0])[0].tolist())
    assert detected >= set(planted)
    # non-outliers preserved, outliers changed
    keep = ~flat[0]
    np.testing.assert_array_equal(purified[0, keep], tokens[0, keep])
    assert not np.allclose(purified[0, flat[0]], tokens[0, flat[0]])


def test_bidirectional_detection():
    rng = np.random.RandomState(1)
    b, gh, gw, c = 1, 4, 4, 4
    p = gh * gw
    tokens = rng.randn(b, p, c).astype(np.float32)
    heads, n = 4, p + 1
    attn = _softmax(rng.rand(b, heads, n, n).astype(np.float32))
    # patch 5: cls_comparison type
    attn[:, :, 6, 6] = 0.01
    attn[:, :, 0, 6] = 0.5
    # patch 10: self_sufficiency type
    attn[:, :, 11, 11] = 0.01
    attn[:, :, 11, 0] = 0.4
    # patch 8: both
    attn[:, :, 9, 9] = 0.01
    attn[:, :, 9, 0] = 0.4
    attn[:, :, 0, 9] = 0.3

    _, mask, conf = suppress_outlier_module(
        jnp.asarray(tokens), jnp.asarray(attn), gh, gw, consensus_threshold=0.5)
    mask = np.asarray(mask).reshape(b, p)
    assert mask.sum() >= 3
    for planted in (5, 8, 10):
        assert mask[0, planted]


def test_som_neighbor_mean():
    """Exact arithmetic: centre of a known 3x3 grid -> mean of 8 nbrs = 5.0."""
    b, gh, gw, c = 1, 3, 3, 4
    p = gh * gw
    tokens = np.broadcast_to(
        np.arange(1, p + 1, dtype=np.float32)[None, :, None], (b, p, c)).copy()
    n = p + 1
    attn = np.zeros((b, 1, n, n), np.float32)
    center = 4
    attn[:, :, center + 1, center + 1] = 0.01
    attn[:, :, 0, center + 1] = 0.5
    for i in range(p):
        if i != center:
            attn[:, :, i + 1, i + 1] = 0.5
            attn[:, :, 0, i + 1] = 0.01

    purified, mask, _ = suppress_outlier_module(
        jnp.asarray(tokens), jnp.asarray(attn), gh, gw,
        detection_mode="cls_comparison")
    purified = np.asarray(purified)
    assert abs(purified[0, center, 0] - 5.0) < 0.01


def test_som_boundary_handling():
    """Corner outlier: mean over its 3 REAL neighbours only."""
    rng = np.random.RandomState(2)
    b, gh, gw, c = 1, 3, 3, 4
    p = gh * gw
    tokens = rng.randn(b, p, c).astype(np.float32)
    n = p + 1
    attn = np.zeros((b, 1, n, n), np.float32)
    attn[:, :, 1, 1] = 0.01  # corner (0,0)
    attn[:, :, 0, 1] = 0.5
    for i in range(1, p):
        attn[:, :, i + 1, i + 1] = 0.5
        attn[:, :, 0, i + 1] = 0.01

    purified, mask, _ = suppress_outlier_module(
        jnp.asarray(tokens), jnp.asarray(attn), gh, gw,
        detection_mode="cls_comparison")
    purified, mask = np.asarray(purified), np.asarray(mask)
    assert mask[0, 0, 0]
    expected = tokens[0, [1, 3, 4]].mean(axis=0)  # right, below, diag
    np.testing.assert_allclose(purified[0, 0], expected, atol=1e-5)


def test_detection_modes_nesting():
    """'either' (intersection) ⊆ {cls_comparison, self_sufficiency} ⊆ 'both'."""
    rng = np.random.RandomState(3)
    b, gh, gw, c = 1, 4, 4, 8
    p = gh * gw
    tokens = rng.randn(b, p, c).astype(np.float32)
    attn = _softmax(rng.rand(b, 6, p + 1, p + 1).astype(np.float32))

    masks = {}
    for mode in ("cls_comparison", "self_sufficiency", "both", "either"):
        _, m, _ = suppress_outlier_module(
            jnp.asarray(tokens), jnp.asarray(attn), gh, gw, detection_mode=mode)
        masks[mode] = np.asarray(m).reshape(-1)
    assert (masks["either"] <= masks["cls_comparison"]).all()
    assert (masks["either"] <= masks["self_sufficiency"]).all()
    assert (masks["both"] >= masks["cls_comparison"]).all()
