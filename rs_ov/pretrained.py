"""Pretrained-weights registry: (model, tag) -> canonical URL.

The reference ships ~124 entries (reference open_clip/pretrained.py:30-440)
and downloads on demand. This environment has no egress, so the registry is
informational: `create_model` raises with the URL when asked for a tag it
cannot find locally. Covers every (model, tag) pair the reference segmentor
actually uses (reference segmentor.py:69-112).
"""

from __future__ import annotations

__all__ = ["get_pretrained_url", "list_pretrained"]

_OPENAI = "https://openaipublic.azureedge.net/clip/models"

PRETRAINED: dict[tuple[str, str], str] = {
    ("ViT-B/16", "openai"): f"{_OPENAI}/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    ("ViT-B-16", "openai"): f"{_OPENAI}/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    ("ViT-B/32", "openai"): f"{_OPENAI}/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    ("ViT-L/14", "openai"): f"{_OPENAI}/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
    ("ViT-L-14", "openai"): f"{_OPENAI}/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
    ("ViT-B-16", "laion2b_s34b_b88k"):
        "https://huggingface.co/laion/CLIP-ViT-B-16-laion2B-s34B-b88K/resolve/main/open_clip_pytorch_model.bin",
    ("ViT-L-14", "laion2b_s32b_b82k"):
        "https://huggingface.co/laion/CLIP-ViT-L-14-laion2B-s32B-b82K/resolve/main/open_clip_pytorch_model.bin",
    ("ViT-B-16-quickgelu", "metaclip_fullcc"):
        "https://dl.fbaipublicfiles.com/MMPT/metaclip/b16_fullcc2.5b.pt",
    ("ViT-L-14-quickgelu", "metaclip_fullcc"):
        "https://dl.fbaipublicfiles.com/MMPT/metaclip/l14_fullcc2.5b.pt",
    # RS-domain checkpoints distributed via research repos / HF
    ("ViT-B-32", "remoteclip"):
        "https://huggingface.co/chendelong/RemoteCLIP/resolve/main/RemoteCLIP-ViT-B-32.pt",
    ("ViT-L-14", "remoteclip"):
        "https://huggingface.co/chendelong/RemoteCLIP/resolve/main/RemoteCLIP-ViT-L-14.pt",
    ("ViT-B-32", "georsclip"):
        "https://huggingface.co/Zilun/GeoRSCLIP/resolve/main/ckpt/RS5M_ViT-B-32.pt",
    ("ViT-L-14", "georsclip"):
        "https://huggingface.co/Zilun/GeoRSCLIP/resolve/main/ckpt/RS5M_ViT-L-14.pt",
    ("ViT-H-14", "georsclip"):
        "https://huggingface.co/Zilun/GeoRSCLIP/resolve/main/ckpt/RS5M_ViT-H-14.pt",
    ("blip-base", "model_base_14M"):
        "https://storage.googleapis.com/sfr-vision-language-research/BLIP/models/model_base_14M.pth",
    ("blip-large", "model_large"):
        "https://storage.googleapis.com/sfr-vision-language-research/BLIP/models/model_large.pth",
}


def get_pretrained_url(model: str, tag: str) -> str | None:
    return PRETRAINED.get((model, tag)) or PRETRAINED.get(
        (model.replace("/", "-"), tag))


def list_pretrained() -> list[tuple[str, str]]:
    return sorted(PRETRAINED)
