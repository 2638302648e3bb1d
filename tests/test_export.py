"""AOT export/serving artifact: the serialized per-geometry program must
reproduce the live segmentor's predictions exactly (rs_ov/pipeline/
export.py; the reference has no export/serving story)."""

import numpy as np
import pytest

import jax.numpy as jnp

from rs_ov.core.config import CLIPConfig, TextConfig, VisionConfig
from rs_ov.pipeline.export import export_predict, load_predict
from rs_ov.pipeline.segmentor import SegmentorEx

TINY = CLIPConfig(
    embed_dim=32,
    vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=3,
                        output_dim=32, head_width=32),
    text=TextConfig(context_length=77, vocab_size=49408, width=32, heads=2,
                    layers=2, output_dim=32),
)


@pytest.fixture(scope="module")
def seg(tmp_path_factory):
    cls = tmp_path_factory.mktemp("cls") / "cls.txt"
    cls.write_text("background\nbuilding\nroad")
    return SegmentorEx(clip_type="CLIP", vit_type="ViT-B/16",
                       model_type="Experimental", name_path=str(cls),
                       clip_config=TINY, param_dtype=jnp.float32,
                       slide_stride=32, slide_crop=64,
                       apply_sim_feat_up=True)


def test_export_roundtrip_matches_live(seg, tmp_path):
    path = str(tmp_path / "model_96.rsov")
    hdr = export_predict(seg, (96, 96), path)
    assert hdr["image_hw"] == [96, 96] and hdr["raw"] is True
    assert hdr["num_queries"] == 3

    fn = load_predict(path)
    assert fn.header["format"] == "rs_ov.export_predict"

    img = np.random.RandomState(0).randint(0, 256, (96, 96, 3), np.uint8)
    live = np.asarray(
        seg.predict_raw(img[None], [{"ori_shape": (96, 96)}])[0]
        ["pred_sem_seg"])
    served = np.asarray(fn(img)["pred_sem_seg"])
    np.testing.assert_array_equal(live, served)


def test_export_rejects_garbage(tmp_path):
    p = tmp_path / "junk.rsov"
    p.write_bytes(b"not an artifact")
    with pytest.raises(ValueError, match="not an rs_ov export"):
        load_predict(str(p))


def test_export_fast_mode_program(tmp_path):
    """A reduced-stage (fast mode) segmentor exports and serves the same
    contract — the serving artifact composes with the deployment knobs."""
    cls = tmp_path / "cls.txt"
    cls.write_text("background\nbuilding")
    seg = SegmentorEx(clip_type="CLIP", vit_type="ViT-B/16",
                      model_type="ClearCLIP", name_path=str(cls),
                      clip_config=TINY, param_dtype=jnp.float32,
                      slide_stride=32, slide_crop=64,
                      apply_sim_feat_up=True,
                      sim_feat_up_cfg={"model_name": "jbu_one",
                                       "num_stages": 2})
    path = str(tmp_path / "fast.rsov")
    export_predict(seg, (64, 64), path)
    fn = load_predict(path)
    img = np.random.RandomState(1).randint(0, 256, (64, 64, 3), np.uint8)
    live = np.asarray(
        seg.predict_raw(img[None], [{"ori_shape": (64, 64)}])[0]
        ["pred_sem_seg"])
    np.testing.assert_array_equal(live, np.asarray(fn(img)["pred_sem_seg"]))
