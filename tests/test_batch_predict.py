"""Cross-image batched inference (predict_batch_raw): one fused program over
the union tile batch of N same-geometry images.

Reference: the per-image forward_slide loop (segmentor.py:394-451),
idiomatically upgraded — the math per tile is unchanged, so batched
predictions must match per-image predict_raw.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from rs_ov.core.config import get_model_config


def _tiny_clip():
    cfg = get_model_config("ViT-B-16")
    return dataclasses.replace(
        cfg,
        vision=dataclasses.replace(cfg.vision, width=64, layers=3,
                                   image_size=64, head_width=32,
                                   output_dim=32),
        text=dataclasses.replace(cfg.text, width=32, heads=2, layers=2,
                                 output_dim=32),
        embed_dim=32)


@pytest.fixture(scope="module")
def seg(tmp_path_factory):
    from rs_ov.pipeline.segmentor import SegmentorEx

    cls = tmp_path_factory.mktemp("cls") / "cls.txt"
    cls.write_text("background\nbuilding\nroad\ntree")
    return SegmentorEx(
        clip_type="CLIP", vit_type="ViT-B/16", model_type="Experimental",
        name_path=str(cls), clip_config=_tiny_clip(), param_dtype=jnp.float32,
        slide_stride=32, slide_crop=64, apply_sim_feat_up=True,
        apply_similarity_enhancement=True, apply_outlier_suppression=True,
        outlier_suppression_cfg={"top_k": 2}, global_debias_factor=0.2,
        prob_thd=0.1, bg_idx=0,
    )


def test_batch_matches_per_image(seg):
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (3, 96, 96, 3)).astype(np.uint8)
    metas = [{"ori_shape": (96, 96)} for _ in range(3)]
    batched = seg.predict_batch_raw(imgs, metas)
    single = seg.predict_raw(imgs, metas)
    for b, s in zip(batched, single):
        np.testing.assert_array_equal(np.asarray(b["pred_sem_seg"]),
                                      np.asarray(s["pred_sem_seg"]))
        np.testing.assert_allclose(np.asarray(b["seg_logits"]),
                                   np.asarray(s["seg_logits"]),
                                   atol=2e-5, rtol=1e-4)


def test_batch_of_one_delegates(seg):
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (1, 96, 96, 3)).astype(np.uint8)
    out = seg.predict_batch_raw(img, [{"ori_shape": (96, 96)}])
    ref = seg.predict_raw(img, [{"ori_shape": (96, 96)}])
    np.testing.assert_array_equal(np.asarray(out[0]["pred_sem_seg"]),
                                  np.asarray(ref[0]["pred_sem_seg"]))


def test_batch_with_cross_tile_fusion(tmp_path):
    """Fusion must stay per-image: a batch of [A, B] must equal each image's
    own fused prediction (regrouping bug would leak context across images)."""
    from rs_ov.pipeline.segmentor import SegmentorEx

    cls = tmp_path / "cls.txt"
    cls.write_text("background\nbuilding")
    seg = SegmentorEx(
        clip_type="CLIP", vit_type="ViT-B/16", model_type="Experimental",
        name_path=str(cls), clip_config=_tiny_clip(), param_dtype=jnp.float32,
        slide_stride=32, slide_crop=64, apply_sim_feat_up=False,
        apply_cross_tile_fusion=True,
    )
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 256, (2, 96, 96, 3)).astype(np.uint8)
    metas = [{"ori_shape": (96, 96)}] * 2
    batched = seg.predict_batch_raw(imgs, metas)
    for i in range(2):
        ref = seg.predict_raw(imgs[i:i + 1], metas[:1])[0]
        np.testing.assert_allclose(
            np.asarray(batched[i]["seg_logits"]),
            np.asarray(ref["seg_logits"]), atol=2e-5, rtol=1e-4)


def test_heterogeneous_ori_shape_rejected(seg):
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 256, (2, 96, 96, 3)).astype(np.uint8)
    with pytest.raises(AssertionError, match="homogeneous"):
        seg.predict_batch_raw(imgs, [{"ori_shape": (96, 96)},
                                     {"ori_shape": (64, 64)}])
