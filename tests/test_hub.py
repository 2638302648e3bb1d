"""Hub packaging (rs_ov/hub.py) vs reference push_to_hf_hub semantics."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from rs_ov import hub
from rs_ov.core.config import CLIPConfig, TextConfig, VisionConfig
from rs_ov.core.params import init_clip_params
from rs_ov.factory import CLIPModel


def _tiny_model():
    cfg = CLIPConfig(
        embed_dim=16,
        vision=VisionConfig(image_size=32, patch_size=16, width=64, layers=2,
                            output_dim=16),
        text=TextConfig(context_length=8, vocab_size=64, width=64, heads=1,
                        layers=2, output_dim=16))
    params = init_clip_params(jax.random.PRNGKey(0), cfg)
    return CLIPModel(cfg=cfg, params=params)


def test_save_for_hub_roundtrip(tmp_path):
    from rs_ov.utils.safetensors import load_safetensors

    m = _tiny_model()
    out = hub.save_for_hub(m, "tiny-test", str(tmp_path / "artifact"),
                           model_card={"description": "test model"})
    assert sorted(os.listdir(out)) == ["README.md", "open_clip_config.json",
                                      "open_clip_model.safetensors"]
    cfgj = json.load(open(os.path.join(out, "open_clip_config.json")))
    assert cfgj["model_cfg"]["embed_dim"] == 16
    assert cfgj["model_cfg"]["vision_cfg"]["patch_size"] == 16
    assert cfgj["preprocess_cfg"]["size"] == 32

    # reference-named tensors: the reloaded weights reproduce the model
    from rs_ov.core.checkpoint import clip_params_from_state_dict

    sd = load_safetensors(os.path.join(out, "open_clip_model.safetensors"))
    assert "visual.conv1.weight" in sd and "text_projection" in sd
    reloaded = CLIPModel(cfg=m.cfg,
                         params=clip_params_from_state_dict(sd))
    img = jnp.asarray(np.random.RandomState(0).randn(1, 3, 32, 32), jnp.float32)
    np.testing.assert_allclose(np.asarray(reloaded.encode_image(img)),
                               np.asarray(m.encode_image(img)), atol=1e-6)
    ids = jnp.zeros((1, 8), jnp.int32)
    np.testing.assert_allclose(np.asarray(reloaded.encode_text(ids)),
                               np.asarray(m.encode_text(ids)), atol=1e-6)


def test_factory_loads_safetensors(tmp_path):
    """create_model(pretrained=<.safetensors>) — the HF-hub weight format."""
    from rs_ov import factory

    m = _tiny_model()
    out = hub.save_for_hub(m, "tiny-test", str(tmp_path / "a"))
    path = os.path.join(out, "open_clip_model.safetensors")
    loaded = factory.create_model("tiny-unknown-name", pretrained=path)
    img = jnp.asarray(np.random.RandomState(1).randn(1, 3, 32, 32), jnp.float32)
    np.testing.assert_allclose(np.asarray(loaded.encode_image(img)),
                               np.asarray(m.encode_image(img)), atol=1e-6)


def test_push_to_hf_hub_stages_then_refuses(tmp_path):
    import pytest

    m = _tiny_model()
    with pytest.raises(RuntimeError, match="zero-egress"):
        hub.push_to_hf_hub(m, "tiny-test", "org/tiny-test",
                           save_directory=str(tmp_path / "staged"))
    assert os.path.exists(tmp_path / "staged" / "open_clip_model.safetensors")


def test_generate_readme_sections():
    txt = hub.generate_readme({
        "tags": ("clip", "rs"), "license": "apache-2.0",
        "details": {"Dataset": "Million-AID", "Params": [1, 2]},
        "description": "A test card.", "usage": "```python\n...\n```",
    }, "rs-ov-test")
    assert txt.startswith("---\ntags:\n- clip\n- rs\n")
    assert "library_name: open_clip" in txt
    assert "pipeline_tag: zero-shot-image-classification" in txt
    assert "license: apache-2.0" in txt
    assert "datasets:\n- million-aid" in txt
    assert "# Model card for rs-ov-test" in txt
    assert "## Model Details" in txt and "## Model Usage" in txt


def test_safetensors_matches_official_lib(tmp_path):
    """Bit-compat both directions with the real safetensors package."""
    import pytest

    st = pytest.importorskip("safetensors.numpy")
    from rs_ov.utils.safetensors import load_safetensors, save_safetensors

    t = {"x": np.random.RandomState(0).randn(4, 3).astype(np.float32),
         "y": np.arange(5, dtype=np.int32)}
    ours = str(tmp_path / "ours.safetensors")
    theirs = str(tmp_path / "theirs.safetensors")
    save_safetensors(t, ours, metadata={"format": "pt"})
    r1 = st.load_file(ours)
    assert all(np.array_equal(r1[k], t[k]) for k in t)
    st.save_file(t, theirs)
    r2 = load_safetensors(theirs)
    assert all(np.array_equal(r2[k], t[k]) for k in t)


def test_open_clip_facade_factory_surface():
    """reference factory.py public entry points exist on the facade."""
    import types

    import open_clip
    from rs_ov.train import losses

    for name in ("create_model", "create_model_and_transforms",
                 "create_model_from_pretrained", "create_loss",
                 "get_tokenizer", "push_to_hf_hub", "generate_readme",
                 "list_models", "list_pretrained"):
        assert hasattr(open_clip, name), name
    a = types.SimpleNamespace(distill=False, model="coca_ViT-B-32", siglip=False)
    assert open_clip.create_loss(a) is losses.coca_loss
    m = open_clip.create_model_from_pretrained(
        "ViT-B-32", pretrained=None, return_transform=False)
    assert m.cfg.embed_dim == 512


def test_layer_scale_roundtrip(tmp_path):
    """ls_1/ls_2 gammas survive hub export -> classic loader."""
    import dataclasses

    from rs_ov.core.checkpoint import clip_params_from_state_dict
    from rs_ov.core.config import get_model_config
    from rs_ov.core.params import init_clip_params
    from rs_ov.utils.safetensors import load_safetensors

    cfg = get_model_config("ViT-M-16-alt")
    tiny = dataclasses.replace(
        cfg,
        vision=dataclasses.replace(cfg.vision, width=64, layers=2,
                                   image_size=32, head_width=32),
        text=dataclasses.replace(cfg.text, width=64, heads=1, layers=2,
                                 context_length=8, vocab_size=64))
    params = init_clip_params(jax.random.PRNGKey(0), tiny)
    assert "ls_1" in params["visual"]["blocks"][0]
    # randomize gammas away from init so a drop would change outputs
    for blk in params["visual"]["blocks"]:
        blk["ls_1"] = blk["ls_1"] + 0.3
        blk["ls_2"] = blk["ls_2"] + 0.1
    m = CLIPModel(cfg=tiny, params=params)
    out = hub.save_for_hub(m, "ls-test", str(tmp_path / "a"))
    sd = load_safetensors(os.path.join(out, "open_clip_model.safetensors"))
    assert "visual.transformer.resblocks.0.ls_1.gamma" in sd
    reloaded = CLIPModel(cfg=tiny, params=clip_params_from_state_dict(sd))
    img = jnp.asarray(np.random.RandomState(0).randn(1, 3, 32, 32), jnp.float32)
    np.testing.assert_allclose(np.asarray(reloaded.encode_image(img)),
                               np.asarray(m.encode_image(img)), atol=1e-6)


def test_hub_preprocess_cfg_by_family(tmp_path):
    # tiny stand-in weights: only the model NAME drives preprocess_cfg
    m = _tiny_model()
    out = hub.save_for_hub(m, "ViT-B-16-SigLIP-test", str(tmp_path / "s"))
    cfgj = json.load(open(os.path.join(out, "open_clip_config.json")))
    assert cfgj["preprocess_cfg"]["mean"] == [0.5, 0.5, 0.5]
    assert cfgj["preprocess_cfg"]["resize_mode"] == "squash"
