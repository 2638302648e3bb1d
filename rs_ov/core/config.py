"""Model architecture configs + registry.

Mirrors the capability surface of the reference's JSON arch registry
(reference open_clip/factory.py:32-53 + open_clip/model_configs/*.json and the
CLIPVisionCfg/CLIPTextCfg dataclasses, reference open_clip/model.py:26-83),
re-designed as frozen (hashable) dataclasses so they can be passed as *static*
arguments through ``jax.jit`` — attention-mode dispatch and module toggles are
trace-time constants on TPU, not runtime attribute-poking.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

__all__ = [
    "VisionConfig",
    "TextConfig",
    "CLIPConfig",
    "get_model_config",
    "list_models",
]


@dataclasses.dataclass(frozen=True)
class VisionConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    mlp_ratio: float = 4.0
    output_dim: int = 512
    # heads = width // head_width (OpenCLIP convention)
    head_width: int = 64
    pool_type: str = "tok"  # 'tok' | 'avg' | 'none'
    final_ln_after_pool: bool = False
    no_ln_pre: bool = False

    @property
    def heads(self) -> int:
        return self.width // self.head_width

    @property
    def grid_size(self) -> tuple[int, int]:
        return (self.image_size // self.patch_size, self.image_size // self.patch_size)


@dataclasses.dataclass(frozen=True)
class TextConfig:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    output_dim: int = 512
    pool_type: str = "argmax"  # 'argmax' | 'first' | 'last' | 'none'
    no_causal_mask: bool = False
    pad_id: int = 0


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int
    vision: VisionConfig
    text: TextConfig
    quick_gelu: bool = False  # OpenAI checkpoints use QuickGELU

    @property
    def name(self) -> str:
        return f"ViT-{self.vision.width}x{self.vision.layers}-p{self.vision.patch_size}"


def _cfg(embed_dim, image_size, patch_size, v_width, v_layers,
         t_width, t_heads, t_layers, quick_gelu=False) -> CLIPConfig:
    return CLIPConfig(
        embed_dim=embed_dim,
        vision=VisionConfig(
            image_size=image_size, patch_size=patch_size,
            width=v_width, layers=v_layers, output_dim=embed_dim,
        ),
        text=TextConfig(
            width=t_width, heads=t_heads, layers=t_layers, output_dim=embed_dim,
        ),
        quick_gelu=quick_gelu,
    )


# Registry of the architectures the reference exercises
# (reference segmentor.py:69-112 picks from these).
_MODEL_CONFIGS: dict[str, CLIPConfig] = {
    # OpenAI-style names (quick_gelu=True: reference openai.py path)
    "ViT-B/16": _cfg(512, 224, 16, 768, 12, 512, 8, 12, quick_gelu=True),
    "ViT-B/32": _cfg(512, 224, 32, 768, 12, 512, 8, 12, quick_gelu=True),
    "ViT-L/14": _cfg(768, 224, 14, 1024, 24, 768, 12, 12, quick_gelu=True),
    # OpenCLIP names (GELU)
    "ViT-B-16": _cfg(512, 224, 16, 768, 12, 512, 8, 12),
    "ViT-B-32": _cfg(512, 224, 32, 768, 12, 512, 8, 12),
    "ViT-L-14": _cfg(768, 224, 14, 1024, 24, 768, 12, 12),
    "ViT-H-14": _cfg(1024, 224, 14, 1280, 32, 1024, 16, 24),
    # quickgelu-suffixed variants (MetaCLIP: reference segmentor.py:100-104)
    "ViT-B-16-quickgelu": _cfg(512, 224, 16, 768, 12, 512, 8, 12, quick_gelu=True),
    "ViT-B-32-quickgelu": _cfg(512, 224, 32, 768, 12, 512, 8, 12, quick_gelu=True),
    "ViT-L-14-quickgelu": _cfg(768, 224, 14, 1024, 24, 768, 12, 12, quick_gelu=True),
    "ViT-L/14-quickgelu": _cfg(768, 224, 14, 1024, 24, 768, 12, 12, quick_gelu=True),
}


def get_model_config(name: str) -> CLIPConfig:
    """Resolve a model name ('ViT-B/16', 'ViT-L-14', ...) to its config."""
    if name in _MODEL_CONFIGS:
        return _MODEL_CONFIGS[name]
    # tolerate '/'<->'-' spelling differences like open_clip does
    alt = name.replace("/", "-")
    if alt in _MODEL_CONFIGS:
        return _MODEL_CONFIGS[alt]
    raise KeyError(f"Unknown model '{name}'. Known: {sorted(_MODEL_CONFIGS)}")


def list_models() -> list[str]:
    return sorted(_MODEL_CONFIGS)


def register_model(name: str, cfg: CLIPConfig) -> None:
    _MODEL_CONFIGS[name] = cfg
