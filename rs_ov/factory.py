"""Model factory — the open_clip entry-point surface on rs_ov internals.

Mirrors the reference's ``open_clip.create_model`` family (reference
open_clip/factory.py:165-320, :360, :417) so users of the reference find the
same call shapes: (model_name, pretrained, precision) -> a model handle with
``encode_image`` / ``encode_text``, plus ``create_model_and_transforms`` and
``get_tokenizer``. ``pretrained`` is a LOCAL checkpoint path or a registry
tag; tags resolve to URLs in ``rs_ov.pretrained`` but are never downloaded
implicitly (zero-egress) — a clear error tells the user where to fetch.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rs_ov.core.checkpoint import (clip_params_from_state_dict,
                                   infer_clip_config_from_state_dict,
                                   load_torch_state_dict)
from rs_ov.core.config import CLIPConfig, get_model_config
from rs_ov.core.params import cast_floating, init_clip_params
from rs_ov.nn.vit import VitCallConfig, vit_forward
from rs_ov.text.encoder import text_forward
from rs_ov.text.tokenizer import SimpleTokenizer

__all__ = ["CLIPModel", "CoCaModel", "create_loss", "create_model",
           "create_model_and_transforms", "create_model_from_pretrained",
           "get_tokenizer", "image_transform", "image_transform_v2",
           "PreprocessCfg"]

_PRECISIONS = {"fp32": jnp.float32, "fp16": jnp.bfloat16, "bf16": jnp.bfloat16,
               "bfloat16": jnp.bfloat16, "float32": jnp.float32}


@dataclasses.dataclass
class CLIPModel:
    """Functional CLIP handle (the reference's ``CLIP`` nn.Module surface)."""

    cfg: CLIPConfig
    params: dict

    def encode_image(self, image, model_type: str = "vanilla",
                     ignore_residual: bool = False,
                     output_cls_token: bool = False, normalize: bool = False,
                     **call_kwargs):
        def _norm(x):
            x32 = x.astype(jnp.float32)
            return (x32 / jnp.maximum(jnp.linalg.norm(x32, axis=-1, keepdims=True),
                                      1e-12)).astype(x.dtype)

        if self.cfg.vision.timm_model_name:
            # native timm-family tower (nn/timm_tower.py): pooled embeddings
            # only — the decontamination hooks live in the CLIP ViT path
            if (model_type not in ("vanilla", "default") or ignore_residual
                    or output_cls_token or call_kwargs):
                raise NotImplementedError(
                    f"{self.cfg.vision.timm_model_name} towers expose the "
                    "plain encode_image(image) contract (reference "
                    "timm_model.py:150-153); the decontamination/self-self "
                    "hooks apply to the CLIP ViT towers only.")
            from rs_ov.nn.timm_tower import timm_tower_forward
            out = timm_tower_forward(self.params["visual"], jnp.asarray(image),
                                     self.cfg.vision, self.cfg.embed_dim)
            return _norm(out) if normalize else out

        call = VitCallConfig(model_type=model_type, ignore_residual=ignore_residual,
                             output_cls_token=output_cls_token,
                             quick_gelu=self.cfg.quick_gelu, **call_kwargs)
        out = vit_forward(self.params["visual"], jnp.asarray(image),
                          self.cfg.vision, call)

        if output_cls_token:
            pooled, tokens = out
            return (_norm(pooled), _norm(tokens)) if normalize else (pooled, tokens)
        return _norm(out) if normalize else out

    def encode_text(self, text_ids, normalize: bool = False):
        return text_forward(self.params["text"], jnp.asarray(text_ids),
                            self.cfg.text, quick_gelu_act=self.cfg.quick_gelu,
                            normalize=normalize)

    @property
    def logit_scale(self):
        return jnp.exp(self.params["logit_scale"])

    @property
    def visual_patch_size(self):
        return (self.cfg.vision.patch_size, self.cfg.vision.patch_size)


@dataclasses.dataclass
class CoCaModel:
    """Functional CoCa handle (the reference's ``CoCa`` nn.Module surface,
    coca_model.py:80-268): encode_image / encode_text / forward / generate."""

    cfg: "object"  # rs_ov.nn.coca.CoCaConfig
    params: dict

    def encode_image(self, images, normalize: bool = True):
        from rs_ov.nn.coca import coca_encode_image
        return coca_encode_image(self.params, jnp.asarray(images), self.cfg,
                                 normalize=normalize)[0]

    def encode_text(self, text_ids, normalize: bool = True):
        from rs_ov.nn.coca import coca_encode_text
        return coca_encode_text(self.params, jnp.asarray(text_ids), self.cfg,
                                normalize=normalize)[0]

    def __call__(self, images, texts=None, **kw):
        from rs_ov.nn.coca import coca_forward
        return coca_forward(self.params, jnp.asarray(images),
                            None if texts is None else jnp.asarray(texts),
                            self.cfg, **kw)

    def generate(self, images, **kw):
        from rs_ov.nn.coca import coca_generate
        return coca_generate(self.params, jnp.asarray(images), self.cfg, **kw)

    @property
    def logit_scale(self):
        return jnp.exp(self.params["logit_scale"])


def _create_coca(model_name: str, pretrained, dtype, seed: int):
    from rs_ov.core.checkpoint import coca_params_from_state_dict
    from rs_ov.core.config import get_coca_config
    from rs_ov.nn.coca import init_coca_params

    cfg = get_coca_config(model_name)
    if pretrained and os.path.exists(pretrained):
        sd = load_torch_state_dict(pretrained)
        params = cast_floating(coca_params_from_state_dict(sd), dtype)
    elif pretrained:
        raise FileNotFoundError(
            f"No implicit downloads in this environment; pass a local "
            f"checkpoint path as `pretrained` for {model_name}.")
    else:
        params = cast_floating(init_coca_params(jax.random.PRNGKey(seed), cfg),
                               dtype)
    return CoCaModel(cfg=cfg, params=params)


def create_model(model_name: str, pretrained: Optional[str] = None,
                 precision: str = "fp32", device=None, jit: bool = False,
                 force_quick_gelu: bool = False, seed: int = 0,
                 force_image_size: Optional[int] = None,
                 **_ignored):
    """(reference factory.py:165-320). ``pretrained``: local path or tag.
    coca_* model names build a CoCaModel (reference coca_model.py).
    ``force_image_size`` overrides the arch's input resolution (the ViT
    pos-embed is interpolated at runtime for any grid, nn/vit.py)."""
    del device, jit

    def _sized(c):
        if force_image_size and c.vision.image_size != force_image_size:
            return dataclasses.replace(
                c, vision=dataclasses.replace(c.vision,
                                              image_size=force_image_size))
        return c

    dtype = _PRECISIONS.get(precision, jnp.float32)
    if pretrained and not os.path.exists(pretrained):
        # registry tag -> SHA-verified file already staged in the cache dir
        # (reference factory.py:278-301 via pretrained.py download_pretrained;
        # here the fetch itself is zero-egress so only cache hits resolve)
        from rs_ov.pretrained import download_pretrained, get_pretrained_cfg

        pcfg = get_pretrained_cfg(model_name, pretrained)
        if pcfg:
            try:
                pretrained = download_pretrained(pcfg)
            except RuntimeError:
                pass  # cache miss: fall through to the canonical-URL refusal
    if model_name.startswith("coca"):
        return _create_coca(model_name, pretrained, dtype, seed)
    if pretrained and os.path.exists(pretrained) and pretrained.endswith(".npz"):
        try:
            cfg = get_model_config(model_name)
        except KeyError:
            cfg = None
        if cfg is not None and cfg.vision.timm_model_name \
                and "siglip" in cfg.vision.timm_model_name:
            # big_vision SigLIP npz -> the native MAP-head towers
            from rs_ov.core.checkpoint import siglip_params_from_big_vision_npz
            params = cast_floating(siglip_params_from_big_vision_npz(pretrained),
                                   dtype)
            params.setdefault("logit_scale", jnp.asarray(np.log(10.0), dtype))
            if cfg.init_logit_bias is not None:
                params.setdefault("logit_bias",
                                  jnp.asarray(cfg.init_logit_bias, dtype))
            return CLIPModel(cfg=_sized(cfg), params=params)
    if pretrained and os.path.exists(pretrained):
        sd = load_torch_state_dict(pretrained)
        quick_gelu = force_quick_gelu or "/" in model_name \
            or pretrained.endswith((".pt",)) and "openai" in pretrained.lower()
        try:
            cfg = get_model_config(model_name)
        except KeyError:
            cfg = infer_clip_config_from_state_dict(sd, quick_gelu=quick_gelu)
        params = cast_floating(clip_params_from_state_dict(
            sd, timm_model_name=getattr(cfg.vision, "timm_model_name", None)),
            dtype)
        return CLIPModel(cfg=_sized(cfg), params=params)
    if pretrained:
        from rs_ov.pretrained import get_pretrained_url

        url = get_pretrained_url(model_name, pretrained)
        raise FileNotFoundError(
            f"No implicit downloads in this environment. Fetch the weights for "
            f"({model_name}, {pretrained}) from {url or 'its distributor'} and "
            f"pass the local path as `pretrained`.")
    cfg = _sized(get_model_config(model_name))  # init at the forced size
    if force_quick_gelu and not cfg.quick_gelu:
        cfg = dataclasses.replace(cfg, quick_gelu=True)
    if cfg.vision.timm_model_name:
        # timm-named tower (reference timm_model.py:29-162) -> the native
        # family implementations in nn/timm_tower.py (ConvNeXt / SigLIP
        # ViT / EVA), with the reference's (timm_pool, timm_proj) head
        # semantics. Text side is the standard tower from the same config.
        from rs_ov.core.params import init_text_params
        from rs_ov.nn.timm_tower import init_timm_tower_params

        kv, kt = jax.random.split(jax.random.PRNGKey(seed))
        params = {
            "visual": init_timm_tower_params(kv, cfg.vision, cfg.embed_dim,
                                             dtype),
            "text": init_text_params(kt, cfg.text, dtype),
            "logit_scale": jnp.asarray(np.log(1 / 0.07), dtype),
        }
        if cfg.init_logit_bias is not None:
            params["logit_bias"] = jnp.asarray(cfg.init_logit_bias, dtype)
        return CLIPModel(cfg=cfg, params=params)
    params = init_clip_params(jax.random.PRNGKey(seed), cfg, dtype=dtype)
    return CLIPModel(cfg=cfg, params=params)


def preprocess_style(model_name: str, pretrained_tag: str | None = None):
    """(mean, std, interpolation, resize_mode) for a model/tag — the
    reference attaches these per pretrained entry (pretrained.py _pcfg
    styles); named-config fallback goes by family (SigLIP/CLIPA towers use
    inception/imagenet normalisation and 'squash' resize, not OpenAI's)."""
    if pretrained_tag:
        from rs_ov.pretrained import get_pretrained_cfg

        cfg = get_pretrained_cfg(model_name, pretrained_tag)
        if cfg:
            return (cfg["mean"], cfg["std"], cfg["interpolation"],
                    cfg["resize_mode"])
    n = model_name.lower()
    if "siglip" in n:
        return ((0.5, 0.5, 0.5), (0.5, 0.5, 0.5), "bicubic", "squash")
    if "clipa" in n:
        return ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225),
                "bilinear", "squash")
    return ((0.48145466, 0.4578275, 0.40821073),
            (0.26862954, 0.26130258, 0.27577711), "bicubic", "shortest")


def center_crop_or_pad(x, output_size, fill: float = 0.0):
    """Center crop, padding first if the image is smaller than the crop
    along any edge (reference transform.py:167-204 center_crop_or_pad,
    same split-the-difference padding and round-half crop origin)."""
    import numpy as np

    ch, cw = output_size
    h, w = x.shape[:2]
    if cw > w or ch > h:
        left = (cw - w) // 2 if cw > w else 0
        right = (cw - w + 1) // 2 if cw > w else 0
        top = (ch - h) // 2 if ch > h else 0
        bottom = (ch - h + 1) // 2 if ch > h else 0
        x = np.pad(x, ((top, bottom), (left, right)) + ((0, 0),) * (x.ndim - 2),
                   constant_values=fill)
        h, w = x.shape[:2]
        if cw == w and ch == h:
            return x
    # torchvision F.center_crop origin: int(round((size - crop) / 2.0))
    top, left = int(round((h - ch) / 2.0)), int(round((w - cw) / 2.0))
    return x[top:top + ch, left:left + cw]


def image_transform(image_size=224, is_train: bool = False,
                    mean=None, std=None, interpolation: str = "bicubic",
                    resize_mode: str = "shortest", fill_color: int = 0,
                    aug_cfg=None):
    """Preprocessing closure (reference transform.py:274-389).

    Inference: resize -> center crop (or crop-or-pad) -> normalize, with the
    reference's three resize modes —
      'shortest': scale the short side to the target (torchvision scalar
                  Resize semantics: long side = int(size * long / short)),
                  then plain center crop;
      'longest':  ResizeKeepRatio(longest=1) — scale so the image FITS the
                  target box, then CenterCropOrPad with `fill_color`
                  (reference transform.py:84-236);
      'squash':   resize straight to (H, W).
    Resizing happens on the uint8 image via PIL — exactly what torchvision's
    transforms do for PIL inputs — so outputs match the reference pipeline
    bit-for-bit before normalization.

    Training (`is_train=True`): the reference's AugmentationCfg branch
    (transform.py:300-358), delegated to rs_ov.data.augment.

    Returns a numpy HWC-uint8 -> CHW-float32 callable. `image_size` may be
    an int or an (H, W) tuple."""
    import numpy as np

    size = tuple(image_size) if isinstance(image_size, (tuple, list)) \
        else (int(image_size), int(image_size))
    if is_train:
        from rs_ov.data.augment import AugmentationCfg, build_train_transform

        if isinstance(aug_cfg, dict):
            aug_cfg = AugmentationCfg(**aug_cfg)
        assert size[0] == size[1], "train aug expects a square target"
        return build_train_transform(size[0], aug_cfg, mean=mean, std=std)

    assert resize_mode in ("shortest", "longest", "squash"), resize_mode
    mean = np.asarray(mean if mean is not None else
                      (0.48145466, 0.4578275, 0.40821073), np.float32)
    std = np.asarray(std if std is not None else
                     (0.26862954, 0.26130258, 0.27577711), np.float32)

    def _resize(img, hw):
        from PIL import Image

        pil_mode = Image.BILINEAR if interpolation == "bilinear" \
            else Image.BICUBIC
        if img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        return np.asarray(Image.fromarray(img).resize(hw[::-1], pil_mode))

    def transform(img_hwc):
        x = np.asarray(img_hwc)
        if x.ndim == 2:
            x = np.repeat(x[..., None], 3, axis=-1)
        h, w = x.shape[:2]
        th, tw = size
        if resize_mode == "squash":
            x = _resize(x, (th, tw))
        elif resize_mode == "longest":
            ratio = max(h / th, w / tw)
            x = _resize(x, (round(h / ratio), round(w / ratio)))
            x = center_crop_or_pad(x, (th, tw), fill=fill_color)
        else:  # shortest
            if th == tw:
                # torchvision scalar-Resize: short side -> size, long side
                # int-truncated (NOT rounded)
                short, long = (h, w) if h <= w else (w, h)
                ns, nl = th, int(th * long / short)
                x = _resize(x, (ns, nl) if h <= w else (nl, ns))
            else:
                ratio = min(h / th, w / tw)  # ResizeKeepRatio longest=0
                x = _resize(x, (round(h / ratio), round(w / ratio)))
            x = center_crop_or_pad(x, (th, tw))
        x = x.astype(np.float32) / 255.0
        x = x.transpose(2, 0, 1)
        return (x - mean[:, None, None]) / std[:, None, None]

    return transform


@dataclasses.dataclass
class PreprocessCfg:
    """The reference's preprocess config surface (transform.py:17-60)."""
    size: int | tuple = 224
    mode: str = "RGB"
    mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    std: tuple = (0.26862954, 0.26130258, 0.27577711)
    interpolation: str = "bicubic"
    resize_mode: str = "shortest"
    fill_color: int = 0


def image_transform_v2(cfg: PreprocessCfg, is_train: bool, aug_cfg=None):
    """The reference's torchvision-v2 entry point (transform.py:393-407):
    same semantics as image_transform, config-object signature."""
    return image_transform(
        image_size=cfg.size, is_train=is_train, mean=cfg.mean, std=cfg.std,
        interpolation=cfg.interpolation, resize_mode=cfg.resize_mode,
        fill_color=cfg.fill_color, aug_cfg=aug_cfg)


def _model_transform(model, model_name: str, pretrained) -> "object":
    tag = pretrained if pretrained and not os.path.exists(str(pretrained)) \
        else None
    mean, std, interp, mode = preprocess_style(model_name, tag)
    return image_transform(model.cfg.vision.image_size, mean=mean, std=std,
                           interpolation=interp, resize_mode=mode)


def create_model_and_transforms(model_name: str, pretrained: Optional[str] = None,
                                precision: str = "fp32", **kwargs):
    """(model, preprocess_train, preprocess_val) — reference factory.py:360."""
    model = create_model(model_name, pretrained, precision, **kwargs)
    preprocess = _model_transform(model, model_name, pretrained)
    return model, preprocess, preprocess


def create_model_from_pretrained(model_name: str, pretrained=None,
                                 precision: str = "fp32",
                                 return_transform: bool = True, **kwargs):
    """(model, preprocess) from a pretrained checkpoint (reference
    factory.py:417-460). `pretrained` must be a local path (zero-egress)."""
    model = create_model(model_name, pretrained, precision, **kwargs)
    if not return_transform:
        return model
    return model, _model_transform(model, model_name, pretrained)


def create_loss(args):
    """Loss selector with the reference's dispatch rules (factory.py:323-357):
    args.distill -> distill loss, 'coca' in args.model -> CoCa loss,
    args.siglip -> SigLIP, else CLIP contrastive. Returns the functional
    losses from rs_ov.train.losses (collectives via named mesh axes instead
    of rank/world_size plumbing)."""
    from rs_ov.train import losses

    if getattr(args, "distill", False):
        return losses.distill_clip_loss
    if "coca" in getattr(args, "model", "").lower():
        return losses.coca_loss
    if getattr(args, "siglip", False):
        return losses.siglip_loss
    return losses.clip_loss


def get_tokenizer(model_name: str = "", context_length: int | None = None,
                  local_tokenizer_path: str | None = None, **_ignored):
    """Tokenizer for a model name (reference factory.py:83-124): BPE
    SimpleTokenizer unless the arch config names an HF/SigLIP tokenizer.

    Hub tokenizers need a LOCAL asset in this zero-egress environment —
    pass ``local_tokenizer_path`` (saved tokenizer dir / tokenizer.json /
    sentencepiece .model); otherwise the HF name is tried as a local path
    and a clear FileNotFoundError points at the canonical source.
    """
    cfg = None
    if model_name:
        try:
            cfg = get_model_config(model_name)
        except KeyError:
            cfg = None
    tcfg = getattr(cfg, "text", None)
    hf_name = getattr(tcfg, "hf_tokenizer_name", None)
    if hf_name:
        from rs_ov.text.hf_tokenizers import HFTokenizer, SigLipTokenizer

        ctx = context_length or tcfg.context_length
        path = local_tokenizer_path or hf_name
        if tcfg.tokenizer_clean == "canonicalize":  # SigLIP family
            return SigLipTokenizer(path, context_length=ctx)
        return HFTokenizer(path, context_length=ctx,
                           strip_sep_token=tcfg.strip_sep_token)
    ctx = context_length or getattr(tcfg, "context_length", None) or 77
    return SimpleTokenizer(context_length=ctx)
