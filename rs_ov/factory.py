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
           "get_tokenizer", "image_transform"]

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


def image_transform(image_size: int = 224, is_train: bool = False,
                    mean=None, std=None, interpolation: str = "bicubic",
                    resize_mode: str = "shortest"):
    """Inference preprocessing closure (reference transform.py:274-389:
    resize -> center crop -> normalize). resize_mode 'shortest' scales the
    short side then center-crops; 'squash' resizes straight to (S, S).
    Returns a numpy HWC-uint8 -> CHW-float32 callable."""
    import numpy as np

    from rs_ov.utils.resize import resize_bicubic, resize_bilinear

    assert not is_train, "training augmentation is out of scope for eval"
    mean = np.asarray(mean if mean is not None else
                      (0.48145466, 0.4578275, 0.40821073), np.float32)
    std = np.asarray(std if std is not None else
                     (0.26862954, 0.26130258, 0.27577711), np.float32)
    resize = resize_bilinear if interpolation == "bilinear" else resize_bicubic

    def transform(img_hwc):
        x = np.asarray(img_hwc).astype(np.float32) / 255.0
        h, w = x.shape[:2]
        if resize_mode == "squash":
            x = np.asarray(resize(jnp.asarray(x.transpose(2, 0, 1)),
                                  (image_size, image_size)))
        else:
            scale = image_size / min(h, w)
            nh, nw = round(h * scale), round(w * scale)
            x = np.asarray(resize(jnp.asarray(x.transpose(2, 0, 1)), (nh, nw)))
            top, left = (nh - image_size) // 2, (nw - image_size) // 2
            x = x[:, top:top + image_size, left:left + image_size]
        return (x - mean[:, None, None]) / std[:, None, None]

    return transform


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
