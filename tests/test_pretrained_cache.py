"""Checkpoint-cache machinery: SHA-256-prefix verification, cache-dir
resolution, URL/hf_hub dispatch — the offline-testable part of the
reference's download stack (reference open_clip/pretrained.py:508-607).
Only the network fetch itself is a zero-egress refusal here."""

import hashlib
import os

import pytest

from rs_ov.pretrained import (
    HF_WEIGHTS_NAME,
    download_pretrained,
    download_pretrained_from_hf,
    download_pretrained_from_url,
    expected_sha256_for_url,
    get_pretrained_cfg,
    resolve_cache_dir,
    verify_sha256_prefix,
)

OPENAI_RN50 = ("https://openaipublic.azureedge.net/clip/models/"
               "afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6"
               "762/RN50.pt")
MLF_RN50 = ("https://github.com/mlfoundations/open_clip/releases/download/"
            "v0.2-weights/rn50-quickgelu-yfcc15m-455df137.pt")


def test_expected_sha256_url_schemes():
    # openaipublic: full hash is the parent path segment
    assert expected_sha256_for_url(OPENAI_RN50) == (
        "afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762")
    # mlfoundations: 8-hex prefix after the last '-' in the stem
    assert expected_sha256_for_url(MLF_RN50) == "455df137"
    # anything else: no embedded hash
    assert expected_sha256_for_url("https://example.com/weights.pt") == ""


def test_verify_sha256_prefix(tmp_path):
    p = tmp_path / "ckpt.pt"
    p.write_bytes(b"not really a checkpoint")
    full = hashlib.sha256(b"not really a checkpoint").hexdigest()
    assert verify_sha256_prefix(str(p), full)
    assert verify_sha256_prefix(str(p), full[:8])
    assert verify_sha256_prefix(str(p), "")  # no expectation -> trivially ok
    assert not verify_sha256_prefix(str(p), "0" * 8 if full[0] != "0"
                                    else "f" * 8)


def test_resolve_cache_dir_precedence(tmp_path, monkeypatch):
    monkeypatch.delenv("RS_OV_CACHE_DIR", raising=False)
    assert resolve_cache_dir("/x/y") == "/x/y"
    monkeypatch.setenv("RS_OV_CACHE_DIR", str(tmp_path))
    assert resolve_cache_dir(None) == str(tmp_path)
    assert resolve_cache_dir("/x/y") == "/x/y"  # explicit arg still wins
    monkeypatch.delenv("RS_OV_CACHE_DIR")
    assert resolve_cache_dir(None) == os.path.expanduser(
        os.path.join("~", ".cache", "clip"))


def _stage(tmp_path, url, payload):
    """Write `payload` at the cache slot for `url`, return its path."""
    target = tmp_path / os.path.basename(url)
    target.write_bytes(payload)
    return target


def test_url_cache_hit_on_valid_hash(tmp_path):
    payload = b"weights-bytes"
    digest = hashlib.sha256(payload).hexdigest()
    url = (f"https://github.com/mlfoundations/open_clip/releases/download/"
           f"v0/model-tag-{digest[:8]}.pt")
    target = _stage(tmp_path, url, payload)
    assert download_pretrained_from_url(url, cache_dir=str(tmp_path)) \
        == str(target)


def test_url_cache_corruption_triggers_refetch(tmp_path):
    url = MLF_RN50  # expects prefix 455df137, which random bytes won't have
    _stage(tmp_path, url, b"corrupted bytes")
    with pytest.warns(UserWarning, match="SHA-256"), \
            pytest.raises(RuntimeError, match="No egress"):
        download_pretrained_from_url(url, cache_dir=str(tmp_path))


def test_url_cache_miss_raises_with_url(tmp_path):
    with pytest.raises(RuntimeError, match="No egress.*example.com"):
        download_pretrained_from_url("https://example.com/w.pt",
                                     cache_dir=str(tmp_path))


def test_url_cache_hit_without_hash_scheme(tmp_path):
    url = "https://example.com/w.pt"  # no embedded hash: presence suffices
    target = _stage(tmp_path, url, b"anything")
    assert download_pretrained_from_url(url, cache_dir=str(tmp_path)) \
        == str(target)


def test_url_target_is_directory_raises(tmp_path):
    (tmp_path / "w.pt").mkdir()
    with pytest.raises(RuntimeError, match="not a regular file"):
        download_pretrained_from_url("https://example.com/w.pt",
                                     cache_dir=str(tmp_path))


def test_hf_staged_layout_and_default_filename(tmp_path):
    d = tmp_path / "laion" / "CLIP-ViT-B-32"
    d.mkdir(parents=True)
    (d / HF_WEIGHTS_NAME).write_bytes(b"hf weights")
    assert download_pretrained_from_hf(
        "laion/CLIP-ViT-B-32", cache_dir=str(tmp_path)) \
        == str(d / HF_WEIGHTS_NAME)
    with pytest.raises(RuntimeError, match="No egress.*huggingface.co"):
        download_pretrained_from_hf("laion/missing", cache_dir=str(tmp_path))


def test_dispatch_url_wins_unless_forced(tmp_path):
    payload = b"b"
    url = "https://example.com/w.pt"
    cfg = {"url": url, "hf_hub": "org/model/"}
    _stage(tmp_path, url, payload)
    got = download_pretrained(cfg, cache_dir=str(tmp_path))
    assert got.endswith("w.pt")
    # force_hf_hub: trailing slash means the default weights filename
    d = tmp_path / "org" / "model"
    d.mkdir(parents=True)
    (d / HF_WEIGHTS_NAME).write_bytes(payload)
    got = download_pretrained(cfg, force_hf_hub=True, cache_dir=str(tmp_path))
    assert got == str(d / HF_WEIGHTS_NAME)
    assert download_pretrained({}) == ""


def test_create_model_resolves_staged_cache(tmp_path, monkeypatch):
    """factory.create_model finds a tag's weights staged in the cache dir —
    the 'registry usable outside the sandbox' path (reference
    factory.py:278-301)."""
    import torch

    from ref_shim import load_reference_transformer
    from rs_ov.factory import create_model

    tmod = load_reference_transformer()
    torch.manual_seed(0)
    vit = tmod.VisionTransformer(image_size=32, patch_size=16, width=32,
                                 layers=2, heads=2, mlp_ratio=4.0,
                                 output_dim=16)
    text = tmod.TextTransformer(context_length=8, vocab_size=64, width=16,
                                heads=2, layers=1, output_dim=16)
    sd = {f"visual.{k}": v for k, v in vit.state_dict().items()}
    sd.update(text.state_dict())
    sd["logit_scale"] = torch.tensor(2.0)
    slot = tmp_path / "laion" / "CLIP-ViT-B-32-laion2B-s34B-b79K"
    slot.mkdir(parents=True)
    torch.save(sd, slot / HF_WEIGHTS_NAME)

    monkeypatch.setenv("RS_OV_CACHE_DIR", str(tmp_path))
    model = create_model("ViT-B-32", pretrained="laion2b_s34b_b79k")
    assert model.params["visual"]["conv1_w"].shape == (32, 3, 16, 16)
    # a tag with nothing staged still refuses with the canonical source
    with pytest.raises(FileNotFoundError):
        create_model("ViT-B-32", pretrained="datacomp_xl_s13b_b90k")


def test_registry_entry_resolves_through_dispatch(tmp_path):
    cfg = get_pretrained_cfg("RN50", "yfcc15m")
    assert cfg["url"] == MLF_RN50
    with pytest.raises(RuntimeError, match="No egress"):
        download_pretrained(cfg, cache_dir=str(tmp_path))
