"""GEM user-level API (the reference gem package surface: gem/gem.py).

``create_gem_model`` (reference gem/gem.py:91-123) returns a wrapper with
``encode_text`` / ``forward`` heatmap helpers (reference gem/gem_wrapper.py:
47-126); here it is a functional handle over the same param pytree — no
weight surgery, the GEM forward is simply a different pure function.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

from rs_ov.factory import CLIPModel, create_model, get_tokenizer
from rs_ov.nn.gem import gem_vit_forward
from rs_ov.text.encoder import text_forward
from rs_ov.utils.resize import resize_bilinear

__all__ = ["GEMWrapper", "create_gem_model", "get_gem_img_transform",
           "visualize"]


@dataclasses.dataclass
class GEMWrapper:
    model: CLIPModel
    tokenizer: object
    depth: int = 7
    ss_attn_iter: int = 1
    ss_attn_temp: Optional[float] = None
    ignore_residual: bool = False

    def encode_image(self, image) -> jnp.ndarray:
        """[B,3,H,W] -> GEM patch tokens [B, P, D] (gem_utils.py:159-199)."""
        return gem_vit_forward(
            self.model.params["visual"], jnp.asarray(image),
            self.model.cfg.vision, depth=self.depth,
            ss_attn_iter=self.ss_attn_iter, ss_attn_temp=self.ss_attn_temp,
            ignore_residual=self.ignore_residual,
            quick_gelu_act=self.model.cfg.quick_gelu)

    def encode_text(self, classnames: list[str]) -> jnp.ndarray:
        """'a photo of a {}.' prompts -> normalised [Q, D]
        (reference gem_wrapper.py:47-52)."""
        ids = self.tokenizer([f"a photo of a {c}." for c in classnames])
        return text_forward(self.model.params["text"], jnp.asarray(ids),
                            self.model.cfg.text,
                            quick_gelu_act=self.model.cfg.quick_gelu,
                            normalize=True)

    @staticmethod
    def min_max(logits: jnp.ndarray) -> jnp.ndarray:
        """Per-map min-max normalisation (reference gem_wrapper.py:54-60)."""
        b, q = logits.shape[:2]
        flat = logits.reshape(b, q, -1)
        lo = flat.min(axis=-1)[:, :, None, None]
        hi = flat.max(axis=-1)[:, :, None, None]
        return (logits - lo) / (hi - lo)

    def forward(self, image, classnames: list[str]) -> jnp.ndarray:
        """Image-text heatmaps [B, Q, H, W], min-max normalised
        (reference gem_wrapper.py:61-126)."""
        image = jnp.asarray(image)
        feats = self.encode_image(image)  # [B, P, D]
        f32 = feats.astype(jnp.float32)
        f32 = f32 / jnp.maximum(jnp.linalg.norm(f32, axis=-1, keepdims=True), 1e-12)
        txt = self.encode_text(classnames).astype(jnp.float32)  # [Q, D]
        logits = jnp.einsum("bpd,qd->bqp", f32, txt)
        patch = self.model.cfg.vision.patch_size
        gh, gw = image.shape[-2] // patch, image.shape[-1] // patch
        maps = logits.reshape(logits.shape[0], logits.shape[1], gh, gw)
        maps = resize_bilinear(maps, (image.shape[-2], image.shape[-1]))
        return self.min_max(maps)

    __call__ = forward


def create_gem_model(model_name: str, pretrained: Optional[str] = None,
                     gem_depth: int = 7, ss_attn_iter: int = 1,
                     ss_attn_temp: Optional[float] = None,
                     precision: str = "fp32", device=None,
                     ignore_residual: bool = False, **kwargs) -> GEMWrapper:
    model = create_model(model_name, pretrained, precision, device=device, **kwargs)
    return GEMWrapper(model=model, tokenizer=get_tokenizer(model_name),
                      depth=gem_depth, ss_attn_iter=ss_attn_iter,
                      ss_attn_temp=ss_attn_temp, ignore_residual=ignore_residual)


def get_gem_img_transform(img_size=(448, 448), mean=None, std=None):
    """(reference gem/gem.py:76-88) — bicubic resize + CLIP normalisation."""
    import numpy as np

    from rs_ov.utils.resize import resize_bicubic

    mean = np.asarray(mean or (0.48145466, 0.4578275, 0.40821073), np.float32)
    std = np.asarray(std or (0.26862954, 0.26130258, 0.27577711), np.float32)
    if isinstance(img_size, int):
        img_size = (img_size, img_size)

    def transform(img_hwc):
        x = np.asarray(img_hwc).astype(np.float32) / 255.0
        x = np.asarray(resize_bicubic(jnp.asarray(x.transpose(2, 0, 1)), img_size))
        return (x - mean[:, None, None]) / std[:, None, None]

    return transform


def visualize(image, text, logits, alpha: float = 0.6,
              save_path: str | None = None, show: bool = False):
    """Per-class JET heatmap overlays (reference gem/gem.py:151-189).

    image: HWC uint8 array / PIL image, or CHW float CLIP-normalised tensor
    (un-normalised like the reference :137-140); logits: [Q, H, W] min-maxed
    GEM heatmaps (GEMWrapper.forward output). Returns the list of [H, W, 3]
    uint8 overlays; save_path (a directory or filename prefix) writes
    ``heatmap_{cls}.png`` per class (:189); show=True additionally displays
    via matplotlib when available (headless-safe: ImportError is ignored).
    """
    import numpy as np

    from rs_ov.data.palette import confidence_heatmap

    logits = np.asarray(logits, np.float32)
    if logits.ndim > 3:
        logits = logits[0]
    h, w = logits.shape[-2:]

    img = np.asarray(getattr(image, "convert", lambda m: image)("RGB"))
    if img.ndim > 3:
        img = img[0]
    if img.ndim == 3 and img.shape[0] == 3 and img.dtype != np.uint8:
        # CHW CLIP-normalised -> HWC uint8 (reference :137-140)
        mean = np.asarray((0.48145466, 0.4578275, 0.40821073), np.float32)
        std = np.asarray((0.26862954, 0.26130258, 0.27577711), np.float32)
        img = (np.clip(img * std[:, None, None] + mean[:, None, None], 0, 1)
               .transpose(1, 2, 0) * 255).astype(np.uint8)
    img = np.asarray(img, np.uint8)
    if img.shape[:2] != (h, w):
        img = np.asarray(resize_bilinear(
            jnp.asarray(img.transpose(2, 0, 1), jnp.float32), (h, w))
        ).transpose(1, 2, 0).astype(np.uint8)

    overlays = []
    for q, cls_name in enumerate(text):
        heat = confidence_heatmap(logits[q])
        viz = ((1 - alpha) * img + alpha * heat).astype(np.uint8)
        overlays.append(viz)
        if save_path is not None:
            import os

            from PIL import Image

            if os.path.isdir(save_path) or save_path.endswith(os.sep):
                os.makedirs(save_path, exist_ok=True)
                out = os.path.join(save_path, f"heatmap_{cls_name}.png")
            else:
                out = f"{save_path}heatmap_{cls_name}.png"
            Image.fromarray(viz).save(out)
        if show:
            try:
                import matplotlib.pyplot as plt

                plt.imshow(viz)
                plt.title(cls_name)
                plt.axis("off")
                plt.tight_layout()
                plt.show()
            except ImportError:
                pass
    return overlays
