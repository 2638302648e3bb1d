"""On-device DBSCAN vs sklearn, and CTD adaptive debiasing vs reference."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ref_shim import load_reference_module
from rs_ov.decontam.ctd import adaptive_debiasing, cluster_patch_tokens_dbscan, dbscan


def _same_partition(a, b):
    """Labels describe the same partition (numbering-independent), same noise."""
    a, b = np.asarray(a), np.asarray(b)
    assert (a == -1).tolist() == (b == -1).tolist()
    mapping = {}
    for la, lb in zip(a, b):
        if la == -1:
            continue
        if la in mapping:
            assert mapping[la] == lb, (a, b)
        else:
            mapping[la] = lb
    assert len(set(mapping.values())) == len(mapping)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dbscan_matches_sklearn(seed):
    from sklearn.cluster import DBSCAN

    rng = np.random.RandomState(seed)
    # three blobs + scattered noise, on the unit sphere like the pipeline
    blobs = [rng.randn(40, 8) * 0.05 + c for c in
             (rng.randn(8) * 3, rng.randn(8) * 3, rng.randn(8) * 3)]
    noise = rng.randn(15, 8) * 5
    pts = np.concatenate(blobs + [noise]).astype(np.float32)

    pts_norm = pts / (np.linalg.norm(pts, axis=-1, keepdims=True) + 1e-8)
    ref = DBSCAN(eps=0.3, min_samples=5, metric="euclidean").fit_predict(pts_norm)
    got = np.asarray(dbscan(jnp.asarray(pts), eps=0.3, min_samples=5,
                            metric="euclidean"))
    _same_partition(got, ref)


def test_dbscan_sklearn_numbering():
    """Cluster ids should follow sklearn's discovery order for clean blobs."""
    from sklearn.cluster import DBSCAN

    rng = np.random.RandomState(3)
    a = rng.randn(30, 4) * 0.02 + np.array([4, 0, 0, 0])
    b = rng.randn(30, 4) * 0.02 + np.array([0, 4, 0, 0])
    pts = np.concatenate([a, b]).astype(np.float32)
    pts_norm = pts / (np.linalg.norm(pts, axis=-1, keepdims=True) + 1e-8)
    ref = DBSCAN(eps=0.3, min_samples=5).fit_predict(pts_norm)
    got = np.asarray(dbscan(jnp.asarray(pts), eps=0.3, min_samples=5,
                            metric="euclidean"))
    np.testing.assert_array_equal(got, ref)


def test_cluster_patch_tokens_production_cfg():
    """The production CTD call (reference segmentor.py:343-352)."""
    ctd_ref = load_reference_module("CTD")
    rng = np.random.RandomState(0)
    # 14x14 grid of tokens forming 2 coherent regions
    base = np.where(np.arange(196)[:, None] < 98,
                    rng.randn(1, 64) * 0.1 + 2.0,
                    rng.randn(1, 64) * 0.1 - 2.0)
    tokens = (base + rng.randn(196, 64) * 0.05).astype(np.float32)[None]
    cfg = {"max_points": 8192, "metric": "euclidean", "eps": 1.1, "min_samples": 11}

    _, ref_labels = ctd_ref.cluster_patch_tokens_dbscan(
        torch.from_numpy(tokens), grid_hw=(14, 14), cfg_dict=cfg)
    _, labels = cluster_patch_tokens_dbscan(jnp.asarray(tokens), (14, 14), cfg)
    _same_partition(np.asarray(labels)[0], ref_labels.numpy()[0])


def test_adaptive_debiasing_matches_reference():
    ctd_ref = load_reference_module("CTD")
    rng = np.random.RandomState(1)
    items = rng.randn(1, 20, 6).astype(np.float32)
    labels = np.array([[0, 0, 0, 1, 1, -1, 2, 2, 2, 2, 1, 1, 0, -1, 2, 0, 1, 2, 0, 1]],
                      dtype=np.int64)
    bias = rng.randn(1, 6).astype(np.float32)

    ref = ctd_ref.adaptive_debiasing(
        items=torch.from_numpy(items.copy()), labels=torch.from_numpy(labels),
        bias=torch.from_numpy(bias), factor=-1.5).numpy()
    got = np.asarray(adaptive_debiasing(jnp.asarray(items), jnp.asarray(labels),
                                        jnp.asarray(bias), factor=-1.5))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
