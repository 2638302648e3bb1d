#!/usr/bin/env python
"""One-command numerical-parity certification vs the reference pipeline.

The north-star acceptance (BASELINE.md) is mIoU parity +-0.1 with real
checkpoints, which cannot be demonstrated in this zero-egress image. This
tool makes that a single invocation the day weights exist, and locks the
harness itself with committed fixtures meanwhile:

    # tiny random weights, per-stage diff vs the reference's own torch
    # modules + committed fixture stats (regression lock, runs in CI)
    python tools/parity_check.py

    # real weights: same per-stage certification on the full-size model
    python tools/parity_check.py --checkpoint ViT-B-16.pt \
        [--jbu-checkpoint xclip_jbu_one_million_aid.ckpt]

    # ADVICE follow-up: bf16 production route vs fp32 strict-parity route
    python tools/parity_check.py --checkpoint ... --precision-ab

Stages checked (fp32, CPU platform, fixed seeded input):
  1 query_features   text tower + 80-prompt ensemble (reference
                     segmentor.py:157-174)
  2 vit_tokens       decontaminating ViT forward, Experimental +
                     sim-enhance + outlier top-k + CLS (transformer.py:538-775)
  3 debias_tokens    global CLS debias 0.2 (segmentor.py:322-336)
  4 jbu_feats        SimFeatUp jbu_one 16x (upsamplers.py:304-325)
  5 logits           L2-norm + cosine classifier (segmentor.py:374-375)
  6 pred             slide + postprocess argmax agreement (segmentor.py:394-532)

Path-coverage stages (every clip_type / attention path the reference ships —
reference segmentor.py:69-129 — same weights, disable with --no-paths):
  attn:<mode> x10    each custom-attn mode vs the reference torch forward
                     (transformer.py custom_attn: vanilla MaskCLIP SCLIP
                     SegEarth SFP Experimental ClearCLIP NACLIP NOnly GAV)
  gem_stream         GEM surgery + dual-stream forward vs the reference's
                     modified_vit_forward (gem/gem_utils.py)
  blip_qq            BLIP ViT last-block q@q attention vs a torch oracle of
                     BLIP/models/vit.py:43-224 (weight-shared tiny net)
  ctd_cluster        production DBSCAN token clustering vs reference CTD.py
  ctd_debias         adaptive per-cluster debiasing vs reference CTD.py
  xtile:weighted/attention  batched cross-tile fusion vs the reference's
                     sequential cache walk (cross_tile_fusion.py)
  som                spec invariants (the reference ships SOM tests + spec
                     docs but no module): planted outliers detected,
                     non-outliers bit-preserved, fixture-locked stats

Then `eval_all.py --checkpoint <ckpt>` over converted datasets produces the
per-config mIoU table to diff against the reference run (see BASELINE.md).
Exit code 0 iff every stage is within tolerance.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

FIXTURES = os.path.join(REPO, "tools", "parity_fixtures.json")

# tiny-arch used in fixture mode (mirrors tests/test_e2e_pipeline.py)
IMAGE, PATCH, WIDTH, LAYERS, HEADS, EMBED = 64, 16, 64, 4, 2, 32
T_WIDTH, T_HEADS, T_LAYERS, CTX = 48, 2, 2, 77
WORDS = ("road", "building", "tree")

TOL = {  # fp32 max-abs tolerances per stage
    "query_features": 2e-5,
    "vit_tokens": 5e-4,
    "debias_tokens": 5e-4,
    "jbu_feats": 2e-3,
    "logits": 2e-3,
    "gem_stream": 1e-3,
    "blip_qq": 2e-5,
    "ctd_debias": 1e-5,
    "xtile:weighted": 5e-5,
    "xtile:attention": 5e-5,
    "outlier_src:[-2]": 5e-4,
    "outlier_src:[-2,-3]": 5e-4,
}
for _m in ("vanilla", "MaskCLIP", "SCLIP", "SegEarth", "SFP", "Experimental",
           "ClearCLIP", "NACLIP", "NOnly", "GAV"):
    TOL[f"attn:{_m}"] = 5e-4
ATTN_MODES = ("vanilla", "MaskCLIP", "SCLIP", "SegEarth", "SFP",
              "Experimental", "ClearCLIP", "NACLIP", "NOnly", "GAV")


def _stats(x: np.ndarray) -> dict:
    x = np.asarray(x, np.float64)
    return {"mean": float(x.mean()), "std": float(x.std()),
            "min": float(x.min()), "max": float(x.max())}


def build_towers(checkpoint: str | None):
    """(torch vit, text, jbu, torch state dict) with either tiny seeded
    random weights or a real checkpoint loaded into the reference modules."""
    import torch

    from ref_shim import load_reference_module, load_reference_transformer

    tmod = load_reference_transformer()
    ups = load_reference_module("upsamplers")
    sim_mod = load_reference_module("similarity_enhancement")
    os_mod = load_reference_module("outlier_suppression")

    class _Shim:
        @staticmethod
        def apply(inp, filt):
            return ups.adaptive_conv_py_simple(inp, filt)

    ups.AdaptiveConv = _Shim

    if checkpoint:
        from rs_ov.core.checkpoint import (infer_clip_config_from_state_dict,
                                           load_torch_state_dict)

        sd_np = load_torch_state_dict(checkpoint)
        cfg = infer_clip_config_from_state_dict(sd_np, quick_gelu=True)
        v = cfg.vision
        vit = tmod.VisionTransformer(
            image_size=v.image_size, patch_size=v.patch_size, width=v.width,
            layers=v.layers, heads=v.heads, mlp_ratio=v.mlp_ratio,
            output_dim=v.output_dim, act_layer=_quickgelu())
        text = tmod.TextTransformer(
            context_length=cfg.text.context_length,
            vocab_size=cfg.text.vocab_size, width=cfg.text.width,
            heads=cfg.text.heads, layers=cfg.text.layers,
            output_dim=cfg.text.output_dim, act_layer=_quickgelu())
        sd_t = {k: torch.from_numpy(np.asarray(val)) for k, val in sd_np.items()}
        vit.load_state_dict({k[len("visual."):]: val for k, val in sd_t.items()
                             if k.startswith("visual.")}, strict=False)
        text.load_state_dict({k: val for k, val in sd_t.items()
                              if not k.startswith(("visual.", "logit_scale"))},
                             strict=False)
    else:
        cfg = _tiny_cfg()
        torch.manual_seed(0)
        vit = tmod.VisionTransformer(image_size=IMAGE, patch_size=PATCH,
                                     width=WIDTH, layers=LAYERS, heads=HEADS,
                                     mlp_ratio=4.0, output_dim=EMBED)
        text = tmod.TextTransformer(context_length=CTX, vocab_size=49408,
                                    width=T_WIDTH, heads=T_HEADS,
                                    layers=T_LAYERS, output_dim=EMBED)
        with torch.no_grad():
            for m in (vit, text):
                for p_ in m.parameters():
                    p_.add_(torch.randn_like(p_) * 0.01)

    vit.similarity_enhancer = sim_mod.SimilarityEnhancementModule(
        similarity_weight=1.0, temperature=1.0, add_self_similarity=True)
    vit.outlier_suppressor = os_mod.OutlierSuppressionModule(
        top_k=4 if not checkpoint else 30)

    jbu = ups.JBUOne(cfg.embed_dim)
    jbu_ckpt = None
    if checkpoint and _ARGS.jbu_checkpoint:
        sd = torch.load(_ARGS.jbu_checkpoint, map_location="cpu")
        sd = sd.get("state_dict", sd)
        jbu.load_state_dict({k[10:]: v for k, v in sd.items()}, strict=False)
        jbu_ckpt = _ARGS.jbu_checkpoint
    elif not checkpoint:
        torch.manual_seed(1)
        with torch.no_grad():
            for p_ in jbu.parameters():
                p_.add_(torch.randn_like(p_) * 0.01)
    for m in (vit, text, jbu):
        m.eval()
    return cfg, vit, text, jbu, jbu_ckpt


def _quickgelu():
    import torch

    class QuickGELU(torch.nn.Module):
        def forward(self, x):
            return x * torch.sigmoid(1.702 * x)

    return QuickGELU


def _tiny_cfg():
    from rs_ov.core.config import CLIPConfig, TextConfig, VisionConfig

    return CLIPConfig(
        embed_dim=EMBED,
        vision=VisionConfig(image_size=IMAGE, patch_size=PATCH, width=WIDTH,
                            layers=LAYERS, head_width=WIDTH // HEADS,
                            output_dim=EMBED),
        text=TextConfig(context_length=CTX, width=T_WIDTH, heads=T_HEADS,
                        layers=T_LAYERS, output_dim=EMBED),
        quick_gelu=False,
    )


def run_path_stages(cfg, vit_t, quick, img_np, check, report):
    """Certify every clip_type / attention path the reference ships
    (reference segmentor.py:69-129) with the same weights as the flagship
    stages. Appends to `report` via the shared `check` closure."""
    import copy

    import torch

    import jax.numpy as jnp

    from ref_shim import load_reference_module
    from rs_ov.core.checkpoint import vision_params_from_state_dict
    from rs_ov.decontam.cross_tile import CrossTileFusionConfig, fuse_tile_grid
    from rs_ov.decontam.ctd import adaptive_debiasing, cluster_patch_tokens_dbscan
    from rs_ov.decontam.som import suppress_outlier_module
    from rs_ov.nn.blip_vit import blip_vit_forward
    from rs_ov.nn.gem import gem_vit_forward
    from rs_ov.nn.vit import VitCallConfig, vit_forward

    img_t = torch.from_numpy(img_np)

    # bare attention paths: decontamination hooks off on both sides
    saved = (vit_t.similarity_enhancer, vit_t.outlier_suppressor)
    vit_t.similarity_enhancer = None
    vit_t.outlier_suppressor = None
    sd = {k: v.detach().numpy() for k, v in vit_t.state_dict().items()}
    vparams = vision_params_from_state_dict(sd, prefix="")
    try:
        # 10 custom-attn modes (reference transformer.py custom_attn)
        for mode in ATTN_MODES:
            with torch.no_grad():
                _, tok_t = vit_t(img_t, model_type=mode, ignore_residual=True,
                                 output_cls_token=True)
            _, tok = vit_forward(
                vparams, jnp.asarray(img_np), cfg.vision,
                VitCallConfig(model_type=mode, ignore_residual=True,
                              output_cls_token=True, quick_gelu=quick))
            check(f"attn:{mode}", tok, tok_t.numpy())

        # GEM dual-stream (reference gem/gem_utils.py, gem_wrapper.py:24-45)
        from ref_shim import load_reference_transformer
        tmod = load_reference_transformer()
        gem_utils = load_reference_module("gem_utils")
        gvit = copy.deepcopy(vit_t)
        depth = 3
        for i in range(1, depth):
            blk = gvit.transformer.resblocks[-i]
            num_heads = blk.attn.num_heads
            dim = blk.attn.head_dim * num_heads
            ss = gem_utils.SelfSelfAttention(dim=dim, num_heads=num_heads,
                                             qkv_bias=True)
            ss.qkv.weight.data = blk.attn.in_proj_weight.clone()
            ss.qkv.bias.data = blk.attn.in_proj_bias.clone()
            ss.proj.weight.data = blk.attn.out_proj.weight.clone()
            ss.proj.bias.data = blk.attn.out_proj.bias.clone()
            blk.attn = ss
            gvit.transformer.resblocks[-i] = gem_utils.GEMResidualBlock(
                blk, True)
        gvit.forward = gem_utils.modified_vit_forward.__get__(
            gvit, tmod.VisionTransformer)
        gvit.eval()
        with torch.no_grad():
            gem_t = gvit(img_t).numpy()
        gem_j = gem_vit_forward(vparams, jnp.asarray(img_np), cfg.vision,
                                depth=depth, ignore_residual=True,
                                quick_gelu_act=quick)
        check("gem_stream", gem_j, gem_t)
    finally:
        vit_t.similarity_enhancer, vit_t.outlier_suppressor = saved

    # BLIP q@q last-block path (reference BLIP/models/vit.py:43-224);
    # weight-shared tiny net — BLIP ships its own checkpoint family, so this
    # certifies the code path, not the flagship weights
    from test_blip import build_tiny_blip_vit
    oracle, bparams, bcfg = build_tiny_blip_vit()
    bimg = np.random.RandomState(2).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        blip_t = oracle(torch.from_numpy(bimg), ignore_residual=True).numpy()
    blip_j = blip_vit_forward(bparams, jnp.asarray(bimg), bcfg,
                              ignore_residual=True)
    check("blip_qq", blip_j, blip_t)

    # CTD: production DBSCAN clustering (reference segmentor.py:343-352)
    ctd_ref = load_reference_module("CTD")
    rng = np.random.RandomState(0)
    base = np.where(np.arange(196)[:, None] < 98,
                    rng.randn(1, 64) * 0.1 + 2.0,
                    rng.randn(1, 64) * 0.1 - 2.0)
    toks = (base + rng.randn(196, 64) * 0.05).astype(np.float32)[None]
    dcfg = {"max_points": 8192, "metric": "euclidean", "eps": 1.1,
            "min_samples": 11}
    _, ref_labels = ctd_ref.cluster_patch_tokens_dbscan(
        torch.from_numpy(toks), grid_hw=(14, 14), cfg_dict=dcfg)
    _, labels = cluster_patch_tokens_dbscan(jnp.asarray(toks), (14, 14), dcfg)
    labels = np.asarray(labels)[0]
    ref_labels = ref_labels.numpy()[0]
    ok = bool(np.array_equal(labels, ref_labels))
    report.append({"stage": "ctd_cluster", "ok": ok,
                   "ours": _stats(labels.astype(np.float64))})
    print(f"  {'ctd_cluster':15s} label agreement "
          f"{float(np.mean(labels == ref_labels)):.4f}  "
          f"{'OK' if ok else 'FAIL'}")

    # CTD: adaptive per-cluster debiasing (reference CTD.py)
    rng = np.random.RandomState(1)
    items = rng.randn(1, 20, 6).astype(np.float32)
    lab = np.array([[0, 0, 0, 1, 1, -1, 2, 2, 2, 2,
                     1, 1, 0, -1, 2, 0, 1, 2, 0, 1]], dtype=np.int64)
    bias = rng.randn(1, 6).astype(np.float32)
    with torch.no_grad():
        deb_t = ctd_ref.adaptive_debiasing(
            items=torch.from_numpy(items.copy()), labels=torch.from_numpy(lab),
            bias=torch.from_numpy(bias), factor=-1.5).numpy()
    deb_j = adaptive_debiasing(jnp.asarray(items), jnp.asarray(lab),
                               jnp.asarray(bias), factor=-1.5)
    check("ctd_debias", deb_j, deb_t)

    # cross-tile fusion, both modes, vs the reference's sequential cache walk
    ctf_mod = load_reference_module("cross_tile_fusion")
    gh, gw, ph, pw, c = 3, 4, 6, 6, 16
    rng = np.random.RandomState(0)
    tiles = rng.randn(gh * gw, ph * pw, c).astype(np.float32)
    for fmode in ("weighted", "attention"):
        ref = ctf_mod.CrossTileFusion(fusion_mode=fmode,
                                      cache_boundary_width=2,
                                      fusion_strength=0.3,
                                      adaptive_fusion=True)
        ref_out = np.zeros_like(tiles)
        with torch.no_grad():
            t = 0
            for hh in range(gh):
                for ww in range(gw):
                    cur = torch.from_numpy(tiles[t:t + 1].copy())
                    ref_out[t] = ref(cur, hh, ww, ph, pw).numpy()[0]
                    t += 1
        xcfg = CrossTileFusionConfig(fusion_mode=fmode, cache_boundary_width=2,
                                     fusion_strength=0.3, adaptive_fusion=True)
        got = fuse_tile_grid(jnp.asarray(tiles), (gh, gw), (ph, pw), xcfg)
        check(f"xtile:{fmode}", got, ref_out)

    # SOM spec invariants (the reference ships tests + spec docs, no module):
    # planted CLS-leaning outliers detected, non-outliers bit-preserved
    rng = np.random.RandomState(0)
    b, sgh, sgw, sc = 1, 4, 4, 768
    p_tok = sgh * sgw
    s_toks = rng.randn(b, p_tok, sc).astype(np.float32)
    attn = rng.rand(b, 12, p_tok + 1, p_tok + 1).astype(np.float32) * 0.01
    # healthy tokens: strongly self-sufficient; planted: CLS-leaning
    for j in range(p_tok + 1):
        attn[:, :, j, j] = 0.5
    planted = [5, 10]
    for idx in planted:
        attn[:, :, idx + 1, idx + 1] = 0.01
        attn[:, :, 0, idx + 1] = 0.5
    attn = attn / attn.sum(-1, keepdims=True)
    purified, mask, _ = suppress_outlier_module(
        jnp.asarray(s_toks), jnp.asarray(attn), sgh, sgw)
    purified = np.asarray(purified)
    flat = np.asarray(mask).reshape(b, p_tok)
    detected = set(np.nonzero(flat[0])[0].tolist())
    keep = ~flat[0]
    ok = (detected == set(planted)
          and np.array_equal(purified[0, keep], s_toks[0, keep])
          and not np.allclose(purified[0, flat[0]], s_toks[0, flat[0]]))
    report.append({"stage": "som", "ok": bool(ok), "ours": _stats(purified)})
    print(f"  {'som':15s} planted detected={sorted(detected)} "
          f"{'OK' if ok else 'FAIL'}")


def run(checkpoint: str | None, precision_ab: bool, update_fixtures: bool,
        paths: bool = True):
    import torch

    import jax
    import jax.numpy as jnp

    from rs_ov.core.checkpoint import (jbu_params_from_state_dict,
                                       text_params_from_state_dict,
                                       vision_params_from_state_dict)
    from rs_ov.decontam.global_debias import global_debias
    from rs_ov.nn.vit import VitCallConfig, vit_forward
    from rs_ov.text.templates import OPENAI_IMAGENET_TEMPLATES
    from rs_ov.text.tokenizer import tokenize
    from rs_ov.text.encoder import text_forward
    from rs_ov.upsample.jbu import jbu_one_forward

    cfg, vit_t, text_t, jbu_t, jbu_ckpt = build_towers(checkpoint)
    quick = bool(checkpoint)  # OpenAI-style checkpoints use QuickGELU

    # same weights on the jax side, via the framework's own converters
    sd = {k: v.detach().numpy() for k, v in vit_t.state_dict().items()}
    vparams = vision_params_from_state_dict(sd, prefix="")
    sd = {k: v.detach().numpy() for k, v in text_t.state_dict().items()}
    tparams = text_params_from_state_dict(sd, prefix="")
    sd = {"upsampler." + k: v.detach().numpy()
          for k, v in jbu_t.state_dict().items()}
    jparams = jbu_params_from_state_dict(sd, "jbu_one")

    report = []

    def check(stage, ours, theirs):
        ours = np.asarray(ours, np.float32)
        theirs = np.asarray(theirs, np.float32)
        d = float(np.max(np.abs(ours - theirs)))
        ok = d <= TOL[stage]
        report.append({"stage": stage, "max_abs_diff": d, "tol": TOL[stage],
                       "ok": ok, "ours": _stats(ours)})
        print(f"  {stage:15s} max|d|={d:.3e}  tol={TOL[stage]:.0e}  "
              f"{'OK' if ok else 'FAIL'}")
        return ours

    print(f"[parity] weights: {checkpoint or 'tiny random (fixture mode)'}"
          + (f" + jbu {jbu_ckpt}" if jbu_ckpt else ""))

    # 1 - query features
    qf_t = []
    with torch.no_grad():
        for qw in WORDS:
            ids = torch.from_numpy(
                tokenize([t.format(qw) for t in OPENAI_IMAGENET_TEMPLATES],
                         cfg.text.context_length)).long()
            f = text_t(ids)
            f = f / f.norm(dim=-1, keepdim=True)
            f = f.mean(0)
            qf_t.append((f / f.norm())[None])
    qf_t = torch.cat(qf_t, 0)

    ids = np.stack([tokenize([t.format(qw) for t in OPENAI_IMAGENET_TEMPLATES],
                             cfg.text.context_length) for qw in WORDS])
    emb = text_forward(tparams, jnp.asarray(ids.reshape(-1, ids.shape[-1])),
                       cfg.text, quick_gelu_act=quick, normalize=True)
    emb = emb.reshape(len(WORDS), -1, cfg.embed_dim)
    qf = jnp.mean(emb, axis=1)
    qf = qf / jnp.linalg.norm(qf, axis=-1, keepdims=True)
    qf = check("query_features", qf, qf_t.numpy())

    # 2 - ViT forward (flagship decontamination recipe)
    size = cfg.vision.image_size
    img_np = np.random.RandomState(7).randn(1, 3, size, size).astype(np.float32)
    img_t = torch.from_numpy(img_np)
    top_k = 4 if not checkpoint else 30
    with torch.no_grad():
        cls_t, tok_t = vit_t(img_t, model_type="Experimental",
                             ignore_residual=True, output_cls_token=True,
                             apply_similarity_enhancement=True)
    call = VitCallConfig(model_type="Experimental", ignore_residual=True,
                         output_cls_token=True, quick_gelu=quick,
                         apply_similarity_enhancement=True,
                         apply_outlier_suppression=True, outlier_top_k=top_k)
    pooled, tokens = vit_forward(vparams, jnp.asarray(img_np), cfg.vision, call)
    check("vit_tokens", tokens, tok_t.numpy())

    # 2b - configurable outlier-attention source layers (the reference
    # set_outlier_suppressor(suppression_layers=...) surface,
    # transformer.py:446-469). layers=[-2] resolves to the same block the
    # reference forward hardcodes (transformer.py:609), so it must match the
    # default-path reference output above.
    import dataclasses as _dc
    _, tok_m2 = vit_forward(vparams, jnp.asarray(img_np), cfg.vision,
                            _dc.replace(call, outlier_source_layers=(-2,)))
    check("outlier_src:[-2]", tok_m2, tok_t.numpy())

    # layers=[-2,-3]: the reference's forward ignores the stored list, so the
    # oracle realizes the documented semantics on the reference model itself —
    # forward-pre-hooks capture each listed block's input, a need_weights
    # re-run yields that block's head-averaged map, and their MEAN is
    # substituted at the suppressor consumption point (transformer.py:721-735).
    n_blk = len(vit_t.transformer.resblocks)
    hook_in, hooks = {}, []
    for li in (n_blk - 2, n_blk - 3):
        hooks.append(vit_t.transformer.resblocks[li].register_forward_pre_hook(
            lambda mod, args, li=li: hook_in.__setitem__(li, args[0].detach().clone())))
    with torch.no_grad():
        vit_t(img_t, model_type="Experimental", ignore_residual=True,
              output_cls_token=True, apply_similarity_enhancement=True)
    for h_ in hooks:
        h_.remove()
    with torch.no_grad():
        maps = [vit_t.transformer.resblocks[li](hook_in[li], need_weights=True)[1]
                for li in (n_blk - 2, n_blk - 3)]
    attn_mean_t = torch.stack(maps).mean(0)
    orig_sup = vit_t.outlier_suppressor

    class _SubstituteAttn(torch.nn.Module):
        top_k = orig_sup.top_k

        def forward(self, feats, attn, gh, gw):
            return orig_sup(feats, attn_mean_t, gh, gw)

    vit_t.outlier_suppressor = _SubstituteAttn()
    with torch.no_grad():
        _, tok_t23 = vit_t(img_t, model_type="Experimental",
                           ignore_residual=True, output_cls_token=True,
                           apply_similarity_enhancement=True)
    vit_t.outlier_suppressor = orig_sup
    _, tok_m23 = vit_forward(vparams, jnp.asarray(img_np), cfg.vision,
                             _dc.replace(call, outlier_source_layers=(-2, -3)))
    check("outlier_src:[-2,-3]", tok_m23, tok_t23.numpy())

    # 3 - global debias
    with torch.no_grad():
        cls_n = cls_t / cls_t.norm(dim=-1, keepdim=True)
        s = ((tok_t / tok_t.norm(dim=-1, keepdim=True)) * cls_n.unsqueeze(1)).sum(-1)
        deb_t = tok_t - cls_n.unsqueeze(1) * (s.unsqueeze(-1) * 0.2)
    p32 = np.asarray(pooled, np.float32)
    cls_norm = p32 / np.linalg.norm(p32, axis=-1, keepdims=True)
    deb = global_debias(tokens, jnp.asarray(cls_norm), 0.2)
    deb = check("debias_tokens", deb, deb_t.numpy())

    # 4 - JBU 16x
    g = size // cfg.vision.patch_size
    with torch.no_grad():
        fmap_t = torch.from_numpy(deb).permute(0, 2, 1).view(1, cfg.embed_dim, g, g)
        up_t = jbu_t(fmap_t, img_t)
    fmap = jnp.asarray(deb).transpose(0, 2, 1).reshape(1, cfg.embed_dim, g, g)
    up = jbu_one_forward(jparams, fmap, jnp.asarray(img_np))
    up = check("jbu_feats", up, up_t.numpy())

    # 5 - cosine logits
    with torch.no_grad():
        f_t = torch.from_numpy(up).view(1, cfg.embed_dim, -1).permute(0, 2, 1)
        f_t = f_t / f_t.norm(dim=-1, keepdim=True)
        log_t = f_t @ torch.from_numpy(qf).T
    f = jnp.asarray(up).reshape(1, cfg.embed_dim, -1).transpose(0, 2, 1)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
    logits = jnp.einsum("tnc,qc->tnq", f, jnp.asarray(qf))
    logits = check("logits", logits, log_t.numpy())

    # 6 - argmax agreement
    agree = float(np.mean(np.argmax(logits, -1) == np.argmax(log_t.numpy(), -1)))
    ok = agree >= 0.999
    report.append({"stage": "pred", "argmax_agreement": agree, "ok": ok})
    print(f"  {'pred':15s} argmax agreement {agree:.4f}  "
          f"{'OK' if ok else 'FAIL'}")

    # optional bf16 production-route A/B (ADVICE: attention operand dtype)
    if precision_ab:
        call_b = call
        vp16 = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, vparams)
        _, tok_b = vit_forward(vp16, jnp.asarray(img_np).astype(jnp.bfloat16),
                               cfg.vision, call_b)
        d = float(np.max(np.abs(np.asarray(tok_b, np.float32)
                                - np.asarray(tokens, np.float32))))
        rel = d / (float(np.max(np.abs(np.asarray(tokens, np.float32)))) + 1e-9)
        report.append({"stage": "bf16_ab_vit_tokens", "max_abs_diff": d,
                       "rel": rel, "ok": True})
        print(f"  {'bf16 A/B':15s} vit tokens max|d|={d:.3e} (rel {rel:.2%}) "
              "- informational; certify via mIoU A/B on real data")

    # path coverage: every clip_type / attention path (same weights)
    if paths:
        run_path_stages(cfg, vit_t, quick, img_np, check, report)

    # fixture lock (tiny mode only: stats of every stage are committed)
    if checkpoint is None:
        stats = {r["stage"]: r.get("ours") for r in report if "ours" in r}
        if update_fixtures or not os.path.exists(FIXTURES):
            with open(FIXTURES, "w") as fh:
                json.dump(stats, fh, indent=1)
            print(f"[parity] fixtures written: {FIXTURES}")
        else:
            with open(FIXTURES) as fh:
                want = json.load(fh)
            for stage, st in stats.items():
                if stage not in want:
                    report.append({"stage": f"fixture:{stage}", "ok": False,
                                   "got": st, "want": "MISSING (re-run with "
                                   "--update-fixtures and commit)"})
                    print(f"  fixture missing for {stage} FAIL")
                    continue
                for k, v in want[stage].items():
                    d = abs(st[k] - v)
                    scale = max(abs(v), 1e-3)
                    if d > 1e-3 * scale + 1e-5:
                        report.append({"stage": f"fixture:{stage}.{k}",
                                       "ok": False, "got": st[k], "want": v})
                        print(f"  fixture drift {stage}.{k}: {st[k]:.6g} "
                              f"vs {v:.6g} FAIL")
            print("[parity] fixture comparison done")

    failed = [r["stage"] for r in report if not r["ok"]]
    print(json.dumps({"checkpoint": checkpoint, "failed": failed,
                      "n_stages": len(report)}))
    return 1 if failed else 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--jbu-checkpoint", default=None)
    ap.add_argument("--precision-ab", action="store_true")
    ap.add_argument("--update-fixtures", action="store_true")
    ap.add_argument("--no-paths", action="store_true",
                    help="skip the per-clip_type path-coverage stages")
    _ARGS = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("RS_OV_NO_COMPILE_CACHE", "1")
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.exit(run(_ARGS.checkpoint, _ARGS.precision_ab, _ARGS.update_fixtures,
                 paths=not _ARGS.no_paths))
