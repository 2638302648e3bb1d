"""Reduced-stage JBU fast mode (segmentor default 2 stages since the
round-5 trained-weights certification,
benchmarks/fastmode_agreement_realjbu_s2.json — 3 stages in round 4,
benchmarks/fastmode_agreement_realjbu.json; num_stages=4 restores strict
reference semantics, simfeatup_dev/upsamplers.py:304-325 is a fixed
4-stage 16x — the LIBRARY functions in upsample/jbu.py keep 4 as their
default for that reason).

stages<4 classifies at the reduced grid and relies on the segmentor's
always-present bilinear logit resize for the remaining factor. These tests
pin the mechanics: shapes, default-path invariance, config/env plumbing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rs_ov.core.config import CLIPConfig, TextConfig, VisionConfig
from rs_ov.upsample.jbu import (get_upsampler, init_jbu_one_params,
                                init_jbu_stack_params, jbu_one_forward,
                                jbu_stack_forward)

TINY = CLIPConfig(
    embed_dim=32,
    vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=3,
                        output_dim=32, head_width=32),
    text=TextConfig(context_length=77, vocab_size=49408, width=32, heads=2,
                    layers=2, output_dim=32),
)


@pytest.fixture(scope="module")
def arrays():
    key = jax.random.PRNGKey(0)
    k0, k1 = jax.random.split(key)
    source = jax.random.normal(k0, (1, 4, 4, 16), jnp.float32).transpose(0, 3, 1, 2)
    guidance = jax.random.normal(k1, (1, 3, 64, 64), jnp.float32)
    return source, guidance


@pytest.mark.parametrize("stages", [1, 2, 3, 4])
def test_jbu_one_stage_shapes(arrays, stages):
    source, guidance = arrays
    p = init_jbu_one_params(jax.random.PRNGKey(1), 16)
    out = jbu_one_forward(p, source, guidance, radius=5, stages=stages)
    f = 2 ** stages
    assert out.shape == (1, 16, 4 * f, 4 * f)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_jbu_one_default_is_four_stages(arrays):
    source, guidance = arrays
    p = init_jbu_one_params(jax.random.PRNGKey(1), 16)
    default = jbu_one_forward(p, source, guidance, radius=5)
    explicit = jbu_one_forward(p, source, guidance, radius=5, stages=4)
    np.testing.assert_array_equal(np.asarray(default), np.asarray(explicit))


@pytest.mark.parametrize("stages", [2, 4])
def test_jbu_stack_stage_shapes(arrays, stages):
    source, guidance = arrays
    p = init_jbu_stack_params(jax.random.PRNGKey(2), 16)
    out = jbu_stack_forward(p, source, guidance, radius=3, stages=stages)
    f = 2 ** stages
    assert out.shape == (1, 16, 4 * f, 4 * f)


def test_registry_threads_stages(arrays):
    source, guidance = arrays
    fwd4, init = get_upsampler("jbu_one")
    fwd2, _ = get_upsampler("jbu_one", stages=2)
    p = init(jax.random.PRNGKey(3), 16)
    assert fwd4(p, source, guidance).shape[-1] == 64
    assert fwd2(p, source, guidance).shape[-1] == 16


def _make_segmentor(tmp_path, **kw):
    from rs_ov.pipeline.segmentor import SegmentorEx

    cls = tmp_path / "cls.txt"
    if not cls.exists():
        cls.write_text("background\nbuilding")
    kwargs = dict(
        clip_type="CLIP", vit_type="ViT-B/16", model_type="Experimental",
        name_path=str(cls), clip_config=TINY, param_dtype=jnp.float32,
        slide_stride=32, slide_crop=64, apply_sim_feat_up=True,
    )
    kwargs.update(kw)
    return SegmentorEx(**kwargs)


def test_segmentor_fast_mode_same_output_geometry(tmp_path):
    """num_stages=2 keeps the public prediction contract (shape, labels)."""
    img = np.random.RandomState(0).randn(1, 3, 96, 96).astype(np.float32)
    full = _make_segmentor(tmp_path, sim_feat_up_cfg={"model_name": "jbu_one",
                                                      "num_stages": 4})
    assert full.jbu_stages == 4  # strict reference semantics
    fast = _make_segmentor(tmp_path)
    assert fast.jbu_stages == 2  # certified fast-mode default (round 5)
    pf = np.asarray(full.predict(img, [{"ori_shape": (96, 96)}])[0]["pred_sem_seg"])
    pq = np.asarray(fast.predict(img, [{"ori_shape": (96, 96)}])[0]["pred_sem_seg"])
    assert pf.shape == pq.shape == (1, 96, 96)
    assert set(np.unique(pq)).issubset({0, 1})


def test_segmentor_stages_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv("RS_OV_JBU_STAGES", "4")
    seg = _make_segmentor(tmp_path)
    assert seg.jbu_stages == 4


def test_segmentor_stages_validation(tmp_path):
    with pytest.raises(ValueError, match="stages"):
        _make_segmentor(tmp_path, sim_feat_up_cfg={"num_stages": 0})
    with pytest.raises(ValueError, match="stages"):
        _make_segmentor(tmp_path, sim_feat_up_cfg={"num_stages": 5})
