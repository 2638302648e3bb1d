"""Open-vocabulary segmentor — the reference's SegmentorEx/Segmentor API on a
fully-batched, jit-compiled TPU pipeline.

Where the reference runs a Python loop of single-tile forwards
(reference segmentor.py:394-451) and pokes modules onto the ViT at runtime
(:196-274), here every image shape compiles ONCE into a single XLA program:
tile extraction -> batched decontaminating ViT over all tiles -> (optionally)
cross-tile fusion, global debias, CTD, SimFeatUp -> cosine classification ->
overlap-average stitch -> resize -> softmax/synonym-merge/threshold.

API mirrors reference segmentor.py:26-622 (``SegmentorEx``) and
segearth_segmentor.py:23-373 (``Segmentor``); framework-specific additions:
``checkpoint_path`` (no implicit downloads), ``param_dtype``,
``apply_cross_tile_fusion`` (the reference designed but never wired it —
reference segmentor.py:286,:433).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rs_ov.core.checkpoint import (
    clip_params_from_state_dict,
    jbu_params_from_state_dict,
    load_torch_state_dict,
)
from rs_ov.core.config import get_model_config
from rs_ov.core.params import cast_floating, init_clip_params
from rs_ov.decontam.cross_tile import CrossTileFusionConfig, fuse_tile_grid
from rs_ov.decontam.ctd import adaptive_debiasing, cluster_patch_tokens_dbscan
from rs_ov.decontam.global_debias import global_debias
from rs_ov.nn.vit import VitCallConfig, vit_forward
from rs_ov.pipeline.postprocess import postprocess_logits, query_onehot
from rs_ov.pipeline.tiler import compute_padsize, extract_tiles, stitch, tile_grid
from rs_ov.text.classifier import build_text_classifier, get_cls_idx
from rs_ov.text.templates import OPENAI_IMAGENET_TEMPLATES
from rs_ov.upsample.jbu import get_upsampler

__all__ = ["SegmentorEx", "Segmentor", "PREPROC_MEAN", "PREPROC_STD"]

# SegDataPreProcessor constants live in the jax-free rs_ov.data.transforms
# (re-exported here for API compatibility)
from rs_ov.data.transforms import PREPROC_MEAN, PREPROC_STD  # noqa: E402


def _resolve_arch(clip_type: str, vit_type: str) -> str:
    """(clip_type, vit_type) -> arch name (reference segmentor.py:69-112)."""
    b = "B" in vit_type
    table = {
        "CLIP": "ViT-B/16" if b else "ViT-L/14",
        "RemoteCLIP": "ViT-B-32" if b else "ViT-L-14",
        "GeoRSCLIP": ("ViT-B-32" if b else
                      ("ViT-H-14" if "H" in vit_type else "ViT-L-14")),
        "SkyCLIP": "ViT-B-32" if b else "ViT-L-14",
        "OpenCLIP": "ViT-B-16" if b else "ViT-L-14",
        "MetaCLIP": "ViT-B-16-quickgelu" if b else "ViT-L-14-quickgelu",
        "ALIP": "ViT-B-32",
    }
    if clip_type not in table:
        raise NotImplementedError(
            f"clip_type '{clip_type}' not yet supported (known: {sorted(table)} + BLIP via the dedicated branch)")
    return table[clip_type]


class SegmentorEx:
    """Training-free open-vocab segmentor with the full decontamination stack."""

    def __init__(self,
                 clip_type: str = "CLIP",
                 vit_type: str = "ViT-B/16",
                 model_type: str = "Experimental",
                 name_path: str = "",
                 ignore_residual: bool = True,
                 prob_thd: float = 0.0,
                 logit_scale: float = 50.0,
                 slide_stride: int = 112,
                 slide_crop: int = 224,
                 cls_token_lambda: float = 0.0,
                 global_debias_factor: float = 0.0,
                 bg_idx: int = 0,
                 apply_sim_feat_up: bool = False,
                 sim_feat_up_cfg: Optional[dict] = None,
                 apply_ctd: bool = False,
                 ctd_cfg: Optional[dict] = None,
                 apply_outlier_suppression: bool = False,
                 outlier_suppression_cfg: Optional[dict] = None,
                 apply_self_attn_enhancement: bool = False,
                 self_attn_enhancement_cfg: Optional[dict] = None,
                 apply_layer_fusion: bool = False,
                 layer_fusion_lambda: float = 0.5,
                 layer_fusion_threshold: float = 0.7,
                 apply_similarity_enhancement: bool = False,
                 similarity_enhancement_cfg: Optional[dict] = None,
                 apply_cross_tile_fusion: bool = False,
                 cross_tile_fusion_cfg: Optional[dict] = None,
                 apply_som: bool = False,
                 som_cfg: Optional[dict] = None,
                 result_dir: Optional[str] = None,
                 heatmap_dir: Optional[str] = None,
                 # framework-level knobs
                 checkpoint_path: Optional[str] = None,
                 params: Optional[dict] = None,
                 upsampler_params: Optional[dict] = None,
                 query_features=None,
                 blip_vocab_path: Optional[str] = None,
                 param_dtype=None,
                 templates=OPENAI_IMAGENET_TEMPLATES,
                 tile_chunk: int = 0,
                 pred_dtype=None,  # int32 default; uint8 shrinks the
                 # per-image pred download 4x (labels must fit — the eval
                 # runner opts in when the vocabulary allows)
                 shape_bucket: int = 0,  # pad images up to multiples of this
                 mesh=None,  # jax.sharding.Mesh: shard the tile batch over 'data'
                 gem_depth: int = 7,
                 ss_attn_iter: int = 1,
                 ss_attn_temp: Optional[float] = None,
                 seed: int = 0,
                 clip_config=None,  # explicit CLIPConfig (tests / custom arch)
                 device=None,  # accepted for API compat; placement is JAX's job
                 ):
        del device
        from rs_ov.core.cache import enable_compilation_cache

        enable_compilation_cache()
        self.clip_type = clip_type
        self.vit_type = vit_type
        self.model_type = model_type
        self.is_blip = clip_type == "BLIP"

        if param_dtype is None:
            param_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        self.param_dtype = param_dtype

        if self.is_blip:
            from rs_ov.nn.blip import (BlipConfig, blip_params_from_state_dict,
                                       init_blip_params)

            self.cfg = clip_config if clip_config is not None else (
                BlipConfig.base(slide_crop) if "B" in vit_type
                else BlipConfig.large(slide_crop))
            self.patch_size = self.cfg.vision.patch_size
            if params is not None:
                self.params = cast_floating(params, param_dtype)
            elif checkpoint_path:
                sd = load_torch_state_dict(checkpoint_path)
                self.params = cast_floating(blip_params_from_state_dict(sd),
                                            param_dtype)
            else:
                self.params = init_blip_params(jax.random.PRNGKey(seed), self.cfg,
                                               dtype=param_dtype)
        else:
            self.cfg = clip_config if clip_config is not None \
                else get_model_config(_resolve_arch(clip_type, vit_type))
            self.patch_size = self.cfg.vision.patch_size
            if params is not None:
                self.params = cast_floating(params, param_dtype)
            elif checkpoint_path:
                sd = load_torch_state_dict(checkpoint_path)
                self.params = cast_floating(clip_params_from_state_dict(sd),
                                            param_dtype)
            else:
                # zero-egress environment: no implicit weight downloads —
                # random init keeps the pipeline runnable/benchmarkable
                self.params = init_clip_params(jax.random.PRNGKey(seed), self.cfg,
                                               dtype=param_dtype)

        # ---- text side: prompt-ensemble query features (frozen) ----
        query_words, self.query_idx = get_cls_idx(name_path)
        self.num_queries = len(query_words)
        self.num_classes = max(self.query_idx) + 1
        if query_features is not None:
            self.query_features = jnp.asarray(query_features, jnp.float32)
        elif self.is_blip:
            self.query_features = self._build_blip_classifier(
                query_words, templates, blip_vocab_path)
        else:
            self.query_features = build_text_classifier(
                self.params["text"], query_words, self.cfg.text,
                quick_gelu=self.cfg.quick_gelu, templates=templates)  # [Q, D] fp32
        self._onehot = jnp.asarray(query_onehot(self.query_idx))

        # ---- static call config for the ViT ----
        sim_cfg = dict(similarity_weight=1.0, temperature=1.0, add_self_similarity=True)
        sim_cfg.update(similarity_enhancement_cfg or {})
        # suppression_layers: the reference set_outlier_suppressor surface
        # (transformer.py:446-469) — global layer indices (negatives OK)
        # whose attention feeds outlier detection; () = penultimate default
        out_cfg = dict(top_k=10, contamination_temp=0.1, suppression_layers=())
        out_cfg.update(outlier_suppression_cfg or {})
        sa_cfg = dict(enhancement_strength=0.1, min_self_attn_threshold=0.15,
                      mode="feature", top_k=10)
        sa_cfg.update(self_attn_enhancement_cfg or {})
        som = dict(consensus_threshold=0.5, detection_mode="both",
                   self_sufficiency_ratio=1.0)
        som.update(som_cfg or {})
        self.call = VitCallConfig(
            model_type=model_type,
            ignore_residual=ignore_residual,
            output_cls_token=True,
            quick_gelu=getattr(self.cfg, "quick_gelu", False),
            apply_similarity_enhancement=apply_similarity_enhancement,
            similarity_weight=sim_cfg["similarity_weight"],
            similarity_temperature=sim_cfg["temperature"],
            add_self_similarity=sim_cfg["add_self_similarity"],
            apply_outlier_suppression=apply_outlier_suppression,
            outlier_top_k=out_cfg["top_k"],
            contamination_temp=out_cfg["contamination_temp"],
            outlier_source_layers=tuple(out_cfg["suppression_layers"]),
            apply_self_attn_enhancement=apply_self_attn_enhancement,
            self_attn_strength=sa_cfg["enhancement_strength"],
            self_attn_threshold=sa_cfg["min_self_attn_threshold"],
            self_attn_mode=sa_cfg["mode"],
            self_attn_top_k=sa_cfg["top_k"],
            apply_layer_fusion=apply_layer_fusion,
            layer_fusion_lambda=layer_fusion_lambda,
            layer_fusion_threshold=layer_fusion_threshold,
            apply_som=apply_som,
            som_consensus_threshold=som["consensus_threshold"],
            som_detection_mode=som["detection_mode"],
            som_self_sufficiency_ratio=som["self_sufficiency_ratio"],
        )

        self.ignore_residual = ignore_residual
        self.logit_scale = float(logit_scale)
        self.prob_thd = float(prob_thd)
        self.slide_stride = slide_stride
        self.slide_crop = slide_crop
        self.cls_token_lambda = float(cls_token_lambda)
        self.global_debias_factor = float(global_debias_factor)
        self.bg_idx = int(bg_idx)
        self.pred_dtype = jnp.int32 if pred_dtype is None else jnp.dtype(pred_dtype)
        self.apply_ctd = apply_ctd
        self.ctd_cfg = {"max_points": 8192, "metric": "euclidean",
                        "eps": 1.1, "min_samples": 11}
        self.ctd_cfg.update(ctd_cfg or {})
        self.apply_cross_tile_fusion = apply_cross_tile_fusion
        self.ctf_cfg = CrossTileFusionConfig(**(cross_tile_fusion_cfg or {}))
        self.result_dir = result_dir
        self.heatmap_dir = heatmap_dir
        self.tile_chunk = tile_chunk
        self.shape_bucket = shape_bucket or int(
            os.environ.get("RS_OV_SHAPE_BUCKET", "0"))
        self.mesh = mesh
        self.gem_depth = gem_depth
        self.ss_attn_iter = ss_attn_iter
        self.ss_attn_temp = ss_attn_temp
        if (model_type == "GEM" or self.is_blip) and (
                self.global_debias_factor != 0.0
                or self.cls_token_lambda != 0.0 or apply_ctd):
            # GEM/BLIP return patch tokens only (reference gem_utils.py:199,
            # segmentor.py:289-292); the CLS-dependent stages cannot run (the
            # reference SegmentorEx would crash unpacking them — :309)
            raise ValueError("GEM/BLIP paths are incompatible with "
                             "global_debias/cls_token_lambda/CTD (no CLS token)")

        # ---- SimFeatUp upsampler ----
        self.apply_sim_feat_up = apply_sim_feat_up
        self.upsampler_name = (sim_feat_up_cfg or {}).get("model_name", "jbu_one")
        # JBU stage count. Default 2 = certified fast mode: classify at the
        # 4x grid, bilinear-resize the cheap Q-channel logits the final 4x
        # (3.97x JBU phase vs 4-stage). Certified against the reference's
        # TRAINED jbu_stack checkpoint over all 17 configs at BOTH reduced
        # counts: stages=3 0.99994 mean pixel agreement 16/17 identical
        # (benchmarks/fastmode_agreement_realjbu.json); stages=2 0.99972
        # mean, 16/17 identical, the one differing config +0.015 mIoU in
        # fast mode's favor (benchmarks/fastmode_agreement_realjbu_s2.json).
        # num_stages=4 restores strict reference semantics (reference
        # simfeatup_dev/upsamplers.py:304-325 is a fixed 4-stage 16x) — use
        # it for bit-level parity gates; checkpointed eval runs auto-pin it
        # (eval.build_model_overrides). Env RS_OV_JBU_STAGES overrides.
        self.jbu_stages = int(os.environ.get(
            "RS_OV_JBU_STAGES",
            (sim_feat_up_cfg or {}).get("num_stages", 2)))
        if not 1 <= self.jbu_stages <= 4:
            raise ValueError(f"jbu stages must be in [1, 4], got {self.jbu_stages}")
        self.upsampler_params = None
        self._upsample_fn_nhwc = None
        self._upsample_classify_nhwc = None
        if apply_sim_feat_up:
            from rs_ov.upsample.jbu import get_upsampler_nhwc, get_upsampler_nhwc_classify

            self.feat_dim = self.cfg.embed_dim
            fwd, init = get_upsampler(self.upsampler_name, stages=self.jbu_stages)
            self._upsample_fn = fwd
            self._upsample_fn_nhwc = get_upsampler_nhwc(
                self.upsampler_name, stages=self.jbu_stages)
            self._upsample_classify_nhwc = get_upsampler_nhwc_classify(
                self.upsampler_name, stages=self.jbu_stages)
            model_path = (sim_feat_up_cfg or {}).get("model_path")
            if upsampler_params is not None:
                self.upsampler_params = cast_floating(upsampler_params, param_dtype)
            elif model_path and os.path.exists(model_path):
                sd = load_torch_state_dict(model_path)
                self.upsampler_params = cast_floating(
                    jbu_params_from_state_dict(sd, self.upsampler_name), param_dtype)
            else:
                self.upsampler_params = cast_floating(
                    init(jax.random.PRNGKey(seed + 1), self.feat_dim), param_dtype)

        self._jit_cache: dict = {}

    # ------------------------------------------------------------------
    # the fused per-image program
    # ------------------------------------------------------------------

    def _decontam_and_classify(self, tokens, cls_norm, cls_logits, tiles,
                               grid_hw, pads, tile_hw):
        """tokens [T, P, C] -> per-tile logits [T, Q, th, tw] (tile size)."""
        from rs_ov.utils.resize import resize_bilinear

        gh, gw = grid_hw
        t = tokens.shape[0]

        if self.global_debias_factor != 0.0:
            tokens = global_debias(tokens, cls_norm, self.global_debias_factor)

        if self.apply_ctd:
            _, labels = cluster_patch_tokens_dbscan(tokens, (gh, gw), self.ctd_cfg)
            tokens = adaptive_debiasing(tokens, labels, cls_norm, factor=-1.5)

        logits = None
        if self.apply_sim_feat_up:
            ph, pw = tiles.shape[-2], tiles.shape[-1]
            nhwc_ok = (self._upsample_fn_nhwc is not None
                       and tokens.dtype == jnp.bfloat16
                       and jax.default_backend() not in ("cpu",)
                       # kill-switch: RS_OV_JBU_FUSED=0 reverts the NHWC /
                       # fused-classify routes to the split channel-first
                       # kernels as well (docs/fused_epilogue.md)
                       and os.environ.get("RS_OV_JBU_FUSED", "1") != "0")
            if (nhwc_ok and self._upsample_classify_nhwc is not None
                    # the fused classifier holds Q on the lane axis
                    # (kernels/jbu_epilogue.py asserts q <= 128); larger
                    # vocabularies fall through to the unfused nhwc path
                    and self.query_features.shape[0] <= 128):
                # fully-fused tail: the last JBU stage's kernel also runs
                # the final-fixup conv, L2 norm and cosine classifier and
                # emits [T, H, W, Q] logits — the [T, HW, C] upsampled
                # features never reach HBM (kernels/jbu_epilogue.py)
                src = tokens.reshape(t, gh, gw, tokens.shape[-1])
                lg = self._upsample_classify_nhwc(
                    self.upsampler_params, src, tiles, self.query_features)
                ph, pw = lg.shape[1], lg.shape[2]
                logits = lg.reshape(t, ph * pw, lg.shape[-1])
            elif nhwc_ok:
                # channel-last path: tokens are [T, HW, C] already — reshape
                # is free on both ends, the [T,C,H,W]<->[T,H,W,C] passes
                # around the upsampler disappear (upsample/jbu.py nhwc docs)
                src = tokens.reshape(t, gh, gw, tokens.shape[-1])
                up = self._upsample_fn_nhwc(self.upsampler_params, src, tiles)
                ph, pw = up.shape[1], up.shape[2]
                feats = up.reshape(t, ph * pw, up.shape[-1])
            else:
                feats = tokens.transpose(0, 2, 1).reshape(t, -1, gh, gw)
                feats = self._upsample_fn(self.upsampler_params, feats, tiles)
                c = feats.shape[1]
                ph, pw = feats.shape[-2], feats.shape[-1]
                feats = feats.reshape(t, c, ph * pw).transpose(0, 2, 1)  # [T, HW, C]
            out_hw = (ph, pw)
        else:
            feats = tokens
            out_hw = (gh, gw)

        if logits is None:
            f32 = feats.astype(jnp.float32)
            f32 = f32 / jnp.maximum(jnp.linalg.norm(f32, axis=-1, keepdims=True), 1e-12)
            if self.param_dtype == jnp.bfloat16:
                # bf16 operands, fp32 accumulation: halves the HBM read of the
                # [T, HW, C] normalised features. The reference computes these
                # cosine logits in fp16 (10 mantissa bits); bf16's 8 total bits
                # on unit-norm values keeps |err| ~2^-8 per product, fp32-summed
                logits = jnp.einsum("tnc,qc->tnq", f32.astype(jnp.bfloat16),
                                    self.query_features.astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
            else:
                logits = jnp.einsum("tnc,qc->tnq", f32, self.query_features,
                                    preferred_element_type=jnp.float32)
        if self.cls_token_lambda != 0.0:
            logits = logits + cls_logits[:, None, :] * self.cls_token_lambda

        q = logits.shape[-1]
        logits = logits.transpose(0, 2, 1).reshape(t, q, out_hw[0], out_hw[1])
        # resize to the PADDED tile size, then cut the pad margin
        pad_h = tile_hw[0] + pads[2] + pads[3]
        pad_w = tile_hw[1] + pads[0] + pads[1]
        logits = resize_bilinear(logits, (pad_h, pad_w))
        if any(pads):
            left, _, top, _ = pads
            logits = logits[:, :, top:top + tile_hw[0], left:left + tile_hw[1]]
        return logits

    def _build_blip_classifier(self, query_words, templates, vocab_path):
        """Prompt-ensemble queries through the BLIP BERT tower
        (reference segmentor.py:160-166: CLS pool -> text_proj -> normalise,
        then the usual per-word prompt mean + renormalise)."""
        from rs_ov.nn.blip import blip_encode_text
        from rs_ov.text.wordpiece import WordPieceTokenizer

        if vocab_path is None:
            raise ValueError(
                "clip_type='BLIP' needs blip_vocab_path (a BERT vocab.txt) or "
                "precomputed query_features — no implicit downloads")
        tok = WordPieceTokenizer(vocab_path)
        encode = jax.jit(lambda p, ids, mask: blip_encode_text(
            p, ids, mask, self.cfg, normalize=True))
        feats = []
        for qw in query_words:
            batch = tok([t.format(qw) for t in templates], max_length=35)
            f = encode(self.params, jnp.asarray(batch["input_ids"]),
                       jnp.asarray(batch["attention_mask"])).astype(jnp.float32)
            mean = f.mean(axis=0)
            mean = mean / jnp.maximum(jnp.linalg.norm(mean), 1e-12)
            feats.append(mean[None])
        return jnp.concatenate(feats, axis=0)

    def _fuse_tiles(self, tokens, grid_hw, grid_p, n_images):
        """Cross-tile fusion, per image: with cross-image batching the flat
        [N*T, ...] token batch is regrouped so fusion never crosses image
        boundaries (reference cross-tile caches are per forward_slide call,
        i.e. per image)."""
        if n_images == 1:
            return fuse_tile_grid(tokens, grid_hw, grid_p, self.ctf_cfg)
        t = tokens.shape[0] // n_images
        grouped = tokens.reshape((n_images, t) + tokens.shape[1:])
        fused = jax.vmap(
            lambda tk: fuse_tile_grid(tk, grid_hw, grid_p, self.ctf_cfg))(grouped)
        return fused.reshape(tokens.shape)

    def _forward_tiles(self, params, tiles, grid_hw, pads, tile_hw,
                       n_images: int = 1):
        """tiles [T, 3, ch, cw] (padded) -> per-tile logits [T, Q, th, tw].

        n_images>1: tiles is the CONCATENATION of n_images same-geometry
        images' tile batches — everything here is per-tile except cross-tile
        fusion, which regroups per image."""
        if self.is_blip:
            from rs_ov.nn.blip import blip_encode_image
            from rs_ov.utils.resize import resize_bilinear

            s = self.cfg.vision.image_size
            # reference resizes the IMAGE to the trained resolution instead of
            # interpolating the pos-embed (segmentor.py:290)
            tiles = resize_bilinear(tiles, (s, s))
            tokens = blip_encode_image(params, tiles, self.cfg,
                                       ignore_residual=self.ignore_residual)
            t = tokens.shape[0]
            cls_norm = jnp.zeros((t, tokens.shape[-1]), jnp.float32)
            cls_logits = jnp.zeros((t, self.query_features.shape[0]), jnp.float32)
            gh_p = s // self.patch_size
            gw_p = s // self.patch_size
            if self.apply_cross_tile_fusion:
                tokens = self._fuse_tiles(tokens, grid_hw, (gh_p, gw_p), n_images)
            return self._chunked_decontam(tokens, cls_norm, cls_logits,
                                          tiles, (gh_p, gw_p), pads, tile_hw)
        if self.model_type == "GEM":
            from rs_ov.nn.gem import gem_vit_forward

            tokens = gem_vit_forward(
                params["visual"], tiles, self.cfg.vision, depth=self.gem_depth,
                ss_attn_iter=self.ss_attn_iter, ss_attn_temp=self.ss_attn_temp,
                ignore_residual=self.ignore_residual,
                quick_gelu_act=self.cfg.quick_gelu)
            t = tokens.shape[0]
            cls_norm = jnp.zeros((t, tokens.shape[-1]), jnp.float32)
            cls_logits = jnp.zeros((t, self.query_features.shape[0]), jnp.float32)
        else:
            pooled, tokens = vit_forward(params["visual"], tiles,
                                         self.cfg.vision, self.call)
            p32 = pooled.astype(jnp.float32)
            cls_norm = p32 / jnp.maximum(
                jnp.linalg.norm(p32, axis=-1, keepdims=True), 1e-12)
            cls_logits = cls_norm @ self.query_features.T  # [T, Q]

        if self.apply_cross_tile_fusion:
            gh_p = tiles.shape[-2] // self.patch_size
            gw_p = tiles.shape[-1] // self.patch_size
            tokens = self._fuse_tiles(tokens, grid_hw, (gh_p, gw_p), n_images)

        gh_p = tiles.shape[-2] // self.patch_size
        gw_p = tiles.shape[-1] // self.patch_size
        return self._chunked_decontam(tokens, cls_norm, cls_logits, tiles,
                                      (gh_p, gw_p), pads, tile_hw)

    def _chunked_decontam(self, tokens, cls_norm, cls_logits, tiles,
                          grid_p, pads, tile_hw):
        """Run decontam+JBU+classify in tile chunks via lax.map — the 16x
        upsample holds several [c, 512, 224, 224] fp32 temps per chunk, so
        bounding the chunk bounds peak HBM while the ViT still runs fully
        batched."""
        t = tokens.shape[0]
        chunk = self.tile_chunk or int(os.environ.get(
            "RS_OV_TILE_CHUNK", "2" if self.apply_sim_feat_up else "0"))
        if not chunk or t <= chunk:
            return self._decontam_and_classify(tokens, cls_norm, cls_logits,
                                               tiles, grid_p, pads, tile_hw)
        pad = (-t) % chunk
        if pad:
            def pad0(x):
                return jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
            tokens, cls_norm, cls_logits, tiles = map(
                pad0, (tokens, cls_norm, cls_logits, tiles))
        n_chunks = tokens.shape[0] // chunk

        def reshape(x):
            return x.reshape((n_chunks, chunk) + x.shape[1:])

        def body(args):
            tok, cn, cl, ti = args
            return self._decontam_and_classify(tok, cn, cl, ti, grid_p,
                                               pads, tile_hw)

        out = jax.lax.map(body, (reshape(tokens), reshape(cls_norm),
                                 reshape(cls_logits), reshape(tiles)))
        out = out.reshape((n_chunks * chunk,) + out.shape[2:])
        return out[:t]

    def _build_image_fn(self, h_img: int, w_img: int,
                        ori_shape: tuple[int, int] | None, raw: bool = False,
                        n_images: int = 1):
        """Compile the full slide-inference program for one image geometry.

        n_images>1 (cross-image batching, predict_batch_raw): the program
        takes [N, ...] images, runs ONE flat [N*T]-tile decontam pipeline
        (full MXU batches; on a mesh the union tile batch shards evenly
        where a single image's T tiles cannot), and vmaps the cheap
        stitch/resize/postprocess tail per image.

        ori_shape=None stops at the stitched logit canvas [Q, h_img, w_img]
        (the shape-bucketing path finishes crop/resize/postprocess in a
        separate tiny program).

        raw=True: the program takes the decoded [H, W, 3] uint8 RGB image and
        fuses the SegDataPreProcessor mean/std normalisation on device
        (reference segmentor.py:64-67 — mmengine also normalises on device).
        This quarters the host->device transfer (uint8 HWC vs fp32 CHW),
        which matters through the tunnelled-TPU's ~7 MB/ms upload path."""
        from rs_ov.utils.resize import resize_bilinear

        if self.slide_crop > 0:
            coords, grid_shape = tile_grid(h_img, w_img, self.slide_stride, self.slide_crop)
        else:
            coords, grid_shape = ((0, 0, h_img, w_img),), (1, 1)
        ch = coords[0][2] - coords[0][0]
        cw = coords[0][3] - coords[0][1]
        pads = compute_padsize(ch, cw, self.patch_size)

        n_tiles = len(coords)
        mean = jnp.asarray(PREPROC_MEAN, jnp.float32)
        std = jnp.asarray(PREPROC_STD, jnp.float32)

        def shard_tiles(tiles):
            if self.mesh is None:
                return tiles
            # tile/spatial parallelism: shard the tile batch over the
            # 'data' mesh axis — GSPMD partitions the whole decontam
            # pipeline across chips (uneven tile counts are padded
            # internally) and inserts any cross-tile collectives (e.g.
            # for cross-tile fusion) over ICI
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.lax.with_sharding_constraint(
                tiles, NamedSharding(self.mesh, P("data")))

        def finish(preds):
            preds = resize_bilinear(preds, ori_shape)
            return postprocess_logits(preds, self._onehot,
                                      logit_scale=self.logit_scale,
                                      prob_thd=self.prob_thd, bg_idx=self.bg_idx,
                                      pred_dtype=self.pred_dtype)

        def image_fn(params, upsampler_params, query_features, img):
            del upsampler_params, query_features  # closed over via self
            if raw:
                img = ((img.astype(jnp.float32) - mean) / std).transpose(2, 0, 1)
            tiles = extract_tiles(img, coords)  # [T, 3, ch, cw]
            if any(pads):
                l, r, tp, b = pads
                tiles = jnp.pad(tiles, ((0, 0), (0, 0), (tp, b), (l, r)))
            tiles = shard_tiles(tiles.astype(self.param_dtype))
            tile_logits = self._forward_tiles(params, tiles,
                                              grid_shape, pads, (ch, cw))
            preds = stitch(tile_logits, coords, h_img, w_img)  # [Q, H, W]
            if ori_shape is None:
                return preds
            return finish(preds)

        def batch_fn(params, upsampler_params, query_features, imgs):
            del upsampler_params, query_features  # closed over via self
            if raw:
                imgs = ((imgs.astype(jnp.float32) - mean) / std
                        ).transpose(0, 3, 1, 2)
            tiles = jax.vmap(lambda im: extract_tiles(im, coords))(imgs)
            tiles = tiles.reshape((n_images * n_tiles,) + tiles.shape[2:])
            if any(pads):
                l, r, tp, b = pads
                tiles = jnp.pad(tiles, ((0, 0), (0, 0), (tp, b), (l, r)))
            tiles = shard_tiles(tiles.astype(self.param_dtype))
            tile_logits = self._forward_tiles(params, tiles, grid_shape,
                                              pads, (ch, cw),
                                              n_images=n_images)
            tile_logits = tile_logits.reshape(
                (n_images, n_tiles) + tile_logits.shape[1:])
            preds = jax.vmap(
                lambda tl: stitch(tl, coords, h_img, w_img))(tile_logits)
            if ori_shape is None:
                return preds
            return jax.vmap(finish)(preds)

        return jax.jit(image_fn if n_images == 1 else batch_fn)

    def _build_finish_fn(self, h: int, w: int, ori_shape: tuple[int, int]):
        """Crop a bucket-padded logit canvas back to the true extent, resize
        to ori_shape and postprocess — a tiny per-shape program (the heavy
        program is shared per bucket)."""
        from rs_ov.utils.resize import resize_bilinear

        def finish_fn(canvas):
            preds = resize_bilinear(canvas[:, :h, :w], ori_shape)
            return postprocess_logits(preds, self._onehot,
                                      logit_scale=self.logit_scale,
                                      prob_thd=self.prob_thd, bg_idx=self.bg_idx,
                                      pred_dtype=self.pred_dtype)

        return jax.jit(finish_fn)

    def _predict_bucketed(self, img: np.ndarray, ori_shape: tuple[int, int],
                          raw: bool = False):
        """Pad the image up to the shape bucket so heterogeneous-size
        datasets share one heavy program per bucket. Tiles that straddle the
        zero-padded margin see padded context, so stitched logits near the
        right/bottom edge can differ slightly from the exact-shape program
        (why this is opt-in; the reference always compiles per shape).
        raw=True: [H, W, 3] uint8 input, normalisation fused in-program (the
        pad margin is uint8-zero, i.e. normalised -mean/std)."""
        h, w = (img.shape[0], img.shape[1]) if raw else (img.shape[-2], img.shape[-1])
        b = self.shape_bucket
        hb = max(-(-h // b) * b, self.slide_crop or 0)
        wb = max(-(-w // b) * b, self.slide_crop or 0)
        key = ("bucket", hb, wb, raw)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build_image_fn(hb, wb, None, raw=raw)
        pad_hw = ((0, hb - h), (0, wb - w))
        pad_spec = pad_hw + ((0, 0),) if raw else ((0, 0),) * (img.ndim - 2) + pad_hw
        padded = jnp.pad(jnp.asarray(img), pad_spec)
        canvas = self._jit_cache[key](
            self.params, self.upsampler_params, self.query_features, padded)
        fkey = ("finish", hb, wb, h, w, ori_shape)
        if fkey not in self._jit_cache:
            self._jit_cache[fkey] = self._build_finish_fn(h, w, ori_shape)
        return self._jit_cache[fkey](canvas)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def forward_feature(self, img, logit_size=None):
        """Single-shot (non-slide) per-pixel logits for img [B, 3, H, W]."""
        img = jnp.asarray(img)
        h, w = img.shape[-2], img.shape[-1]
        pads = compute_padsize(h, w, self.patch_size)
        tiles = img
        if any(pads):
            l, r, tp, b = pads
            tiles = jnp.pad(tiles, ((0, 0), (0, 0), (tp, b), (l, r)))
        logits = self._forward_tiles(self.params, tiles.astype(self.param_dtype),
                                     (1, 1), pads, (h, w))
        if logit_size is not None:
            from rs_ov.utils.resize import resize_bilinear
            logits = resize_bilinear(logits, tuple(logit_size))
        return logits

    def predict_raw(self, inputs, data_samples=None):
        """predict() on decoded-but-unnormalised images.

        inputs: [B, H, W, 3] uint8 RGB (the decoder's output layout). The
        mean/std normalisation + HWC->CHW run INSIDE the per-image program
        (the reference also normalises on device: its mmengine
        SegDataPreProcessor, reference segmentor.py:64-67), so the host
        uploads a quarter of the bytes of the fp32 CHW contract — measured
        ~15 ms/image faster through the tunnelled chip's upload path.

        Shape-bucketing note: bucket padding here pads the *uint8* image
        with 0, which normalises to -mean/std, while :meth:`predict` pads
        the normalised image with 0.0 (= the dataset mean). Padded rows are
        cropped before stitching either way, so only tiles straddling the
        pad edge can differ marginally between the raw and non-raw routes."""
        inputs = np.asarray(inputs)
        results = []
        for i in range(inputs.shape[0]):
            meta = (data_samples[i] if data_samples is not None else None) or {}
            ori_shape = tuple(meta.get("ori_shape", inputs.shape[1:3]))[:2]
            h, w = inputs.shape[1], inputs.shape[2]
            if self.shape_bucket:
                probs, pred = self._predict_bucketed(inputs[i], ori_shape,
                                                     raw=True)
            else:
                key = ("raw", h, w, ori_shape)
                if key not in self._jit_cache:
                    self._jit_cache[key] = self._build_image_fn(h, w, ori_shape,
                                                                raw=True)
                probs, pred = self._jit_cache[key](
                    self.params, self.upsampler_params, self.query_features,
                    jnp.asarray(inputs[i]))
            result = {"seg_logits": probs, "pred_sem_seg": pred}
            results.append(result)
            self._maybe_dump(result, meta, i)
        return results

    def predict_batch_raw(self, inputs, data_samples=None):
        """Cross-image batched predict_raw: ONE fused program processes the
        union tile batch of N same-geometry images ([N*T] tiles — full MXU
        batches per dispatch; on a mesh the union batch load-balances where
        a single image's T tiles leave chips idle at the margin). The
        idiomatic upgrade of the reference's per-image forward_slide loop
        (reference segmentor.py:394-451).

        inputs: [N, H, W, 3] uint8 RGB. All images must share H, W and
        ori_shape (eval datasets are fixed-size per config; the eval runner
        groups by shape). Predictions are identical to per-image
        predict_raw — same math, bigger batch."""
        inputs = np.asarray(inputs)
        n, h, w = inputs.shape[0], inputs.shape[1], inputs.shape[2]
        metas = list(data_samples) if data_samples is not None else [{}] * n
        ori_shape = tuple(metas[0].get("ori_shape", (h, w)))[:2]
        if n == 1:
            return self.predict_raw(inputs, metas)
        for m in metas[1:]:
            assert tuple(m.get("ori_shape", (h, w)))[:2] == ori_shape, \
                "predict_batch_raw needs a shape-homogeneous batch"
        key = ("rawN", n, h, w, ori_shape)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build_image_fn(
                h, w, ori_shape, raw=True, n_images=n)
        probs, preds = self._jit_cache[key](
            self.params, self.upsampler_params, self.query_features,
            jnp.asarray(inputs))
        results = []
        for i in range(n):
            result = {"seg_logits": probs[i], "pred_sem_seg": preds[i]}
            results.append(result)
            self._maybe_dump(result, metas[i], i)
        return results

    def predict(self, inputs, data_samples=None):
        """inputs: [B, 3, H, W] preprocessed (mean/std-normalised RGB) —
        numpy, or an already-uploaded jax device array (no host round-trip).

        Returns a list of dicts: {'seg_logits': [C, oh, ow], 'pred_sem_seg':
        [1, oh, ow]} per image (the mmengine PixelData contract, flattened).
        """
        if not isinstance(inputs, jax.Array):
            inputs = np.asarray(inputs)
        results = []
        for i in range(inputs.shape[0]):
            meta = (data_samples[i] if data_samples is not None else None) or {}
            ori_shape = tuple(meta.get("ori_shape", inputs.shape[-2:]))[:2]
            h, w = inputs.shape[-2], inputs.shape[-1]
            if self.shape_bucket:
                probs, pred = self._predict_bucketed(inputs[i], ori_shape)
            else:
                key = (h, w, ori_shape)
                if key not in self._jit_cache:
                    self._jit_cache[key] = self._build_image_fn(h, w, ori_shape)
                probs, pred = self._jit_cache[key](
                    self.params, self.upsampler_params, self.query_features,
                    jnp.asarray(inputs[i]))
            result = {"seg_logits": probs, "pred_sem_seg": pred}
            results.append(result)
            self._maybe_dump(result, meta, i)
        return results

    # ------------------------------------------------------------------

    def _maybe_dump(self, result, meta, i):
        if not (self.result_dir or self.heatmap_dir):
            return
        from rs_ov.data.palette import colorize_mask, confidence_heatmap

        stem = None
        for key in ("img_path", "ori_path", "filename", "ori_filename"):
            if meta.get(key):
                stem = os.path.splitext(os.path.basename(meta[key]))[0]
                break
        stem = stem or f"sample_{i}"
        if self.result_dir:
            os.makedirs(self.result_dir, exist_ok=True)
            colorize_mask(np.asarray(result["pred_sem_seg"])[0],
                          self.num_classes, self.bg_idx,
                          os.path.join(self.result_dir, f"{stem}.png"))
        if self.heatmap_dir:
            os.makedirs(self.heatmap_dir, exist_ok=True)
            conf = np.asarray(result["seg_logits"]).max(axis=0)
            confidence_heatmap(conf, os.path.join(self.heatmap_dir, f"{stem}.png"))


class Segmentor(SegmentorEx):
    """The plain SegEarth-OV variant (reference segearth_segmentor.py:23-373):
    same pipeline without the CTD/outlier/similarity/layer-fusion hooks."""

    def __init__(self, clip_type="CLIP", vit_type="ViT-B/16", model_type="SegEarth",
                 name_path="", **kwargs):
        for banned in ("apply_ctd", "apply_outlier_suppression",
                       "apply_self_attn_enhancement", "apply_layer_fusion",
                       "apply_similarity_enhancement"):
            kwargs.pop(banned, None)
        super().__init__(clip_type=clip_type, vit_type=vit_type,
                         model_type=model_type, name_path=name_path, **kwargs)
