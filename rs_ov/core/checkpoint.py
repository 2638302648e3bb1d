"""Checkpoint IO: torch/OpenAI/npz state dicts -> rs_ov param pytrees.

Covers the reference's four load mechanisms (reference factory.py:127-162,
openai.py:24-90, big_vision.py:9, segmentor.py:281-283) as pure name-mapping —
weights keep torch's (out, in) layout so no transposes are needed (see
rs_ov.core.params).

torch is only imported when actually reading a ``.pt``/``.ckpt`` file; the
mapping functions work on plain dicts of numpy arrays.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

from rs_ov.core.config import CLIPConfig

__all__ = [
    "save_pytree",
    "load_pytree",
    "load_torch_state_dict",
    "clip_params_from_state_dict",
    "vision_params_from_state_dict",
    "text_params_from_state_dict",
    "jbu_params_from_state_dict",
    "infer_clip_config_from_state_dict",
    "vision_params_from_big_vision_npz", "siglip_params_from_big_vision_npz",
    "vision_params_from_timm_state_dict",
    "detect_timm_vision_prefix",
]


def save_pytree(tree, path: str) -> None:
    """Save a param pytree to .npz (portable write path; the reference has no
    checkpoint-writing at all — SURVEY.md §5). Keys are '/'-joined paths,
    list indices encoded as '#i'."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, Mapping):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else str(k), v)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(f"{prefix}/#{i}", v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", tree)
    np.savez(path, **flat)


def load_pytree(path: str, dtype=None):
    """Inverse of save_pytree."""
    data = np.load(path)
    root: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        arr = data[key]
        node[parts[-1]] = jnp.asarray(arr, dtype) if (
            dtype and np.issubdtype(arr.dtype, np.floating)) else jnp.asarray(arr)

    def listify(node):
        if isinstance(node, dict):
            if node and all(k.startswith("#") for k in node):
                return [listify(node[f"#{i}"]) for i in range(len(node))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(root)


def _np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor
    return x.detach().cpu().float().numpy()


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a torch checkpoint file into {name: np.ndarray} (fp32).

    Handles raw state dicts, {'state_dict': ...} wrappers, TorchScript
    archives (OpenAI JIT .pt files — reference openai.py:40-58), and
    .safetensors files (the format HF-hub CLIP weights ship in; reference
    factory.py:145-150 prefers them when the safetensors package exists).
    """
    if path.endswith(".safetensors"):
        from rs_ov.utils.safetensors import load_safetensors

        return {k: np.asarray(v, np.float32) if v.dtype.kind == "f"
                or v.dtype.name == "bfloat16" else np.asarray(v)
                for k, v in load_safetensors(path).items()}
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        try:
            obj = torch.load(path, map_location="cpu", weights_only=False)
        except Exception:
            # OpenAI ships TorchScript archives
            obj = torch.jit.load(path, map_location="cpu").state_dict()
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if not isinstance(obj, Mapping):
        obj = obj.state_dict()
    return {k: _np(v) for k, v in obj.items()}


def _ln(sd, prefix, dtype):
    return {
        "scale": jnp.asarray(sd[f"{prefix}.weight"], dtype),
        "bias": jnp.asarray(sd[f"{prefix}.bias"], dtype),
    }


def _block(sd, prefix, dtype):
    blk = {
        "ln_1": _ln(sd, f"{prefix}.ln_1", dtype),
        "attn": {
            "in_proj_w": jnp.asarray(sd[f"{prefix}.attn.in_proj_weight"], dtype),
            "in_proj_b": jnp.asarray(sd[f"{prefix}.attn.in_proj_bias"], dtype),
            "out_proj_w": jnp.asarray(sd[f"{prefix}.attn.out_proj.weight"], dtype),
            "out_proj_b": jnp.asarray(sd[f"{prefix}.attn.out_proj.bias"], dtype),
        },
        "ln_2": _ln(sd, f"{prefix}.ln_2", dtype),
        "mlp": {
            "c_fc_w": jnp.asarray(sd[f"{prefix}.mlp.c_fc.weight"], dtype),
            "c_fc_b": jnp.asarray(sd[f"{prefix}.mlp.c_fc.bias"], dtype),
            "c_proj_w": jnp.asarray(sd[f"{prefix}.mlp.c_proj.weight"], dtype),
            "c_proj_b": jnp.asarray(sd[f"{prefix}.mlp.c_proj.bias"], dtype),
        },
    }
    # open_clip LayerScale blocks (ls_init_value archs, e.g. ViT-M-16-alt)
    for ls in ("ls_1", "ls_2"):
        if f"{prefix}.{ls}.gamma" in sd:
            blk[ls] = jnp.asarray(sd[f"{prefix}.{ls}.gamma"], dtype)
    return blk


def _count_blocks(sd, prefix):
    n = 0
    while f"{prefix}.{n}.ln_1.weight" in sd:
        n += 1
    return n


def vision_params_from_state_dict(sd: Mapping[str, np.ndarray], prefix: str = "visual.",
                                  dtype=jnp.float32) -> dict:
    """Map an open_clip VisionTransformer state dict to an rs_ov pytree."""
    p = prefix
    n = _count_blocks(sd, f"{p}transformer.resblocks")
    return {
        "conv1_w": jnp.asarray(sd[f"{p}conv1.weight"], dtype),
        "class_embedding": jnp.asarray(sd[f"{p}class_embedding"], dtype),
        "positional_embedding": jnp.asarray(sd[f"{p}positional_embedding"], dtype),
        "ln_pre": _ln(sd, f"{p}ln_pre", dtype),
        "blocks": [_block(sd, f"{p}transformer.resblocks.{i}", dtype) for i in range(n)],
        "ln_post": _ln(sd, f"{p}ln_post", dtype),
        "proj": jnp.asarray(sd[f"{p}proj"], dtype),
    }


def text_params_from_state_dict(sd: Mapping[str, np.ndarray], prefix: str = "",
                                dtype=jnp.float32) -> dict:
    """Map the CLIP text-tower state dict (reference model.py:220-270 naming)."""
    p = prefix
    n = _count_blocks(sd, f"{p}transformer.resblocks")
    params = {
        "token_embedding": jnp.asarray(sd[f"{p}token_embedding.weight"], dtype),
        "positional_embedding": jnp.asarray(sd[f"{p}positional_embedding"], dtype),
        "blocks": [_block(sd, f"{p}transformer.resblocks.{i}", dtype) for i in range(n)],
        "ln_final": _ln(sd, f"{p}ln_final", dtype),
    }
    if f"{p}text_projection.weight" in sd:
        # nn.Linear projection (open_clip proj_bias towers, e.g. SigLIP):
        # torch (out, in) -> the classic [width, embed] param orientation
        params["text_projection"] = jnp.asarray(
            np.asarray(sd[f"{p}text_projection.weight"]).T, dtype)
        if f"{p}text_projection.bias" in sd:
            params["text_projection_b"] = jnp.asarray(
                sd[f"{p}text_projection.bias"], dtype)
    else:
        params["text_projection"] = jnp.asarray(sd[f"{p}text_projection"], dtype)
    return params


# ---------------------------------------------------------------------------
# timm-flavoured ViT state dicts (capability subset of the reference's
# timm_model.py adapter: RemoteCLIP/GeoRSCLIP-adjacent exports where the
# underlying arch is a plain ViT but the names are timm's)
# ---------------------------------------------------------------------------

_TIMM_VISION_PREFIXES = ("", "visual.", "visual.trunk.", "module.visual.trunk.",
                         "image_encoder.", "vision_model.")


def detect_timm_vision_prefix(sd: Mapping[str, np.ndarray]) -> str | None:
    """Prefix under which timm ViT names live, or None if not timm-named."""
    for p in _TIMM_VISION_PREFIXES:
        if f"{p}patch_embed.proj.weight" in sd:
            return p
    return None


def _timm_block(sd, prefix, dtype):
    d = sd[f"{prefix}.attn.qkv.weight"].shape[1]
    if f"{prefix}.attn.qkv.bias" in sd:
        qkv_b = sd[f"{prefix}.attn.qkv.bias"]
    elif f"{prefix}.attn.q_bias" in sd:
        # EVA/BLIP-style: separate q/v bias, no k bias
        qkv_b = np.concatenate([sd[f"{prefix}.attn.q_bias"],
                                np.zeros((d,), np.float32),
                                sd[f"{prefix}.attn.v_bias"]])
    else:
        qkv_b = np.zeros((3 * d,), np.float32)
    return {
        "ln_1": _ln(sd, f"{prefix}.norm1", dtype),
        "attn": {
            "in_proj_w": jnp.asarray(sd[f"{prefix}.attn.qkv.weight"], dtype),
            "in_proj_b": jnp.asarray(qkv_b, dtype),
            "out_proj_w": jnp.asarray(sd[f"{prefix}.attn.proj.weight"], dtype),
            "out_proj_b": jnp.asarray(sd[f"{prefix}.attn.proj.bias"], dtype),
        },
        "ln_2": _ln(sd, f"{prefix}.norm2", dtype),
        "mlp": {
            "c_fc_w": jnp.asarray(sd[f"{prefix}.mlp.fc1.weight"], dtype),
            "c_fc_b": jnp.asarray(sd[f"{prefix}.mlp.fc1.bias"], dtype),
            "c_proj_w": jnp.asarray(sd[f"{prefix}.mlp.fc2.weight"], dtype),
            "c_proj_b": jnp.asarray(sd[f"{prefix}.mlp.fc2.bias"], dtype),
        },
    }


def vision_params_from_timm_state_dict(sd: Mapping[str, np.ndarray],
                                       prefix: str | None = None,
                                       dtype=jnp.float32) -> dict:
    """Map a timm-named plain-ViT state dict onto the nn/vit.py pytree.

    Name translation (timm -> rs_ov): patch_embed.proj -> conv1_w,
    cls_token -> class_embedding, pos_embed -> positional_embedding
    (zero CLS row prepended when the export has none), norm_pre -> ln_pre
    (identity when absent), blocks.N.{norm1,attn.qkv,attn.proj,norm2,
    mlp.fc1,mlp.fc2} -> block fields, norm/fc_norm -> ln_post,
    head.proj -> proj (identity when the export carries no CLIP head).
    """
    p = detect_timm_vision_prefix(sd) if prefix is None else prefix
    if p is None:
        raise KeyError("not a timm-named ViT state dict "
                       "(no patch_embed.proj.weight under known prefixes)")
    conv1 = sd[f"{p}patch_embed.proj.weight"]
    width = conv1.shape[0]
    n = 0
    while f"{p}blocks.{n}.norm1.weight" in sd:
        n += 1

    pos = np.asarray(sd[f"{p}pos_embed"])
    if pos.ndim == 3:
        pos = pos[0]
    if f"{p}cls_token" in sd:
        cls = np.asarray(sd[f"{p}cls_token"]).reshape(width)
    else:
        cls = np.zeros((width,), np.float32)
    grid = int(round(pos.shape[0] ** 0.5))
    if grid * grid == pos.shape[0]:  # CLS-less pos table: give CLS a zero row
        pos = np.concatenate([np.zeros((1, width), pos.dtype), pos], 0)

    if f"{p}norm_pre.weight" in sd:
        ln_pre = _ln(sd, f"{p}norm_pre", dtype)
    else:
        ln_pre = {"scale": jnp.ones((width,), dtype),
                  "bias": jnp.zeros((width,), dtype)}
    post_name = "norm" if f"{p}norm.weight" in sd else "fc_norm"
    if f"{p}{post_name}.weight" in sd:
        ln_post = _ln(sd, f"{p}{post_name}", dtype)
    else:
        ln_post = {"scale": jnp.ones((width,), dtype),
                   "bias": jnp.zeros((width,), dtype)}

    for head in (f"{p}head.proj.weight", "visual.head.proj.weight"):
        if head in sd:  # open_clip timm wrapper linear proj [E, D]
            proj = jnp.asarray(np.asarray(sd[head]).T, dtype)
            break
    else:
        proj = jnp.eye(width, dtype=dtype)

    params = {
        "conv1_w": jnp.asarray(conv1, dtype),
        "class_embedding": jnp.asarray(cls, dtype),
        "positional_embedding": jnp.asarray(pos, dtype),
        "ln_pre": ln_pre,
        "blocks": [_timm_block(sd, f"{p}blocks.{i}", dtype) for i in range(n)],
        "ln_post": ln_post,
        "proj": proj,
    }
    for i in range(n):  # timm LayerScale (gamma_1/gamma_2 or ls1/ls2)
        for ours, theirs in (("ls_1", ("gamma_1", "ls1.gamma")),
                             ("ls_2", ("gamma_2", "ls2.gamma"))):
            for t in theirs:
                if f"{p}blocks.{i}.{t}" in sd:
                    params["blocks"][i][ours] = jnp.asarray(
                        sd[f"{p}blocks.{i}.{t}"], dtype)
    return params


def _hwio(a):
    """torch OIHW conv weight -> HWIO (the nn/timm_tower.py NHWC layout)."""
    return np.asarray(a).transpose(2, 3, 1, 0)


def timm_tower_params_from_state_dict(sd: Mapping[str, np.ndarray],
                                      timm_model_name: str,
                                      prefix: str = "visual.",
                                      dtype=jnp.float32) -> dict:
    """Map an open_clip TimmModel export (``visual.trunk.*`` timm names +
    ``visual.head.*`` adapter head, reference timm_model.py:66-109) onto the
    nn/timm_tower.py trees for the ConvNeXt / SigLIP-ViT / EVA families."""
    from rs_ov.nn.timm_tower import timm_arch

    arch = timm_arch(timm_model_name)
    t = prefix + "trunk."

    def ln(name):
        return _ln(sd, name, dtype)

    def arr(name):
        return jnp.asarray(sd[name], dtype)

    if arch.family == "convnext":
        trunk = {
            "stem_conv_w": jnp.asarray(_hwio(sd[t + "stem.0.weight"]), dtype),
            "stem_conv_b": arr(t + "stem.0.bias"),
            "stem_norm": ln(t + "stem.1"),
            "head_norm": ln(t + "head.norm"),
            "stages": [],
        }
        for i in range(len(arch.depths)):
            st = {"blocks": []}
            if i > 0:
                st["downsample"] = {
                    "norm": ln(t + f"stages.{i}.downsample.0"),
                    "conv_w": jnp.asarray(
                        _hwio(sd[t + f"stages.{i}.downsample.1.weight"]), dtype),
                    "conv_b": arr(t + f"stages.{i}.downsample.1.bias"),
                }
            for j in range(arch.depths[i]):
                pre = t + f"stages.{i}.blocks.{j}."
                st["blocks"].append({
                    "conv_dw_w": jnp.asarray(_hwio(sd[pre + "conv_dw.weight"]), dtype),
                    "conv_dw_b": arr(pre + "conv_dw.bias"),
                    "norm": ln(pre + "norm"),
                    "fc1_w": arr(pre + "mlp.fc1.weight"),
                    "fc1_b": arr(pre + "mlp.fc1.bias"),
                    "fc2_w": arr(pre + "mlp.fc2.weight"),
                    "fc2_b": arr(pre + "mlp.fc2.bias"),
                    "gamma": arr(pre + "gamma"),
                })
            trunk["stages"].append(st)
    elif arch.family == "siglip_vit":
        n = 0
        while t + f"blocks.{n}.norm1.weight" in sd:
            n += 1
        trunk = {
            "patch_embed_w": arr(t + "patch_embed.proj.weight"),
            "patch_embed_b": arr(t + "patch_embed.proj.bias"),
            "pos_embed": jnp.asarray(np.asarray(sd[t + "pos_embed"]).reshape(
                -1, arch.width), dtype),
            "blocks": [_timm_block(sd, t + f"blocks.{i}", dtype)
                       for i in range(n)],
            "norm": ln(t + "norm"),
            "attn_pool": {
                "latent": jnp.asarray(np.asarray(sd[t + "attn_pool.latent"])
                                      .reshape(-1, arch.width), dtype),
                "q_w": arr(t + "attn_pool.q.weight"),
                "q_b": arr(t + "attn_pool.q.bias"),
                "kv_w": arr(t + "attn_pool.kv.weight"),
                "kv_b": arr(t + "attn_pool.kv.bias"),
                "proj_w": arr(t + "attn_pool.proj.weight"),
                "proj_b": arr(t + "attn_pool.proj.bias"),
                "norm": ln(t + "attn_pool.norm"),
                "mlp": {"c_fc_w": arr(t + "attn_pool.mlp.fc1.weight"),
                        "c_fc_b": arr(t + "attn_pool.mlp.fc1.bias"),
                        "c_proj_w": arr(t + "attn_pool.mlp.fc2.weight"),
                        "c_proj_b": arr(t + "attn_pool.mlp.fc2.bias")},
            },
        }
    else:  # eva
        w = arch.width
        blocks = []
        for i in range(arch.depth):
            pre = t + f"blocks.{i}."
            blk = {"ln_1": ln(pre + "norm1"), "ln_2": ln(pre + "norm2")}
            if arch.fused_qkv:
                if pre + "attn.q_bias" in sd:  # eva fused: no k bias
                    b = np.concatenate([np.asarray(sd[pre + "attn.q_bias"]),
                                        np.zeros((w,), np.float32),
                                        np.asarray(sd[pre + "attn.v_bias"])])
                else:
                    b = np.asarray(sd[pre + "attn.qkv.bias"])
                blk.update({"in_proj_w": arr(pre + "attn.qkv.weight"),
                            "in_proj_b": jnp.asarray(b, dtype)})
            else:
                blk.update({"q_w": arr(pre + "attn.q_proj.weight"),
                            "q_b": arr(pre + "attn.q_proj.bias"),
                            "k_w": arr(pre + "attn.k_proj.weight"),
                            "v_w": arr(pre + "attn.v_proj.weight"),
                            "v_b": arr(pre + "attn.v_proj.bias")})
            if arch.scale_attn_inner:
                blk["inner_norm"] = ln(pre + "attn.norm")
            blk.update({"out_proj_w": arr(pre + "attn.proj.weight"),
                        "out_proj_b": arr(pre + "attn.proj.bias")})
            if arch.swiglu:
                m = {"fc1g_w": arr(pre + "mlp.fc1_g.weight"),
                     "fc1g_b": arr(pre + "mlp.fc1_g.bias"),
                     "fc1x_w": arr(pre + "mlp.fc1_x.weight"),
                     "fc1x_b": arr(pre + "mlp.fc1_x.bias"),
                     "fc2_w": arr(pre + "mlp.fc2.weight"),
                     "fc2_b": arr(pre + "mlp.fc2.bias")}
            else:
                m = {"fc1_w": arr(pre + "mlp.fc1.weight"),
                     "fc1_b": arr(pre + "mlp.fc1.bias"),
                     "fc2_w": arr(pre + "mlp.fc2.weight"),
                     "fc2_b": arr(pre + "mlp.fc2.bias")}
            if arch.scale_mlp:
                m["mlp_norm"] = ln(pre + "mlp.norm")
            blk["mlp"] = m
            blocks.append(blk)
        trunk = {
            "patch_embed_w": arr(t + "patch_embed.proj.weight"),
            "patch_embed_b": arr(t + "patch_embed.proj.bias"),
            "cls_token": jnp.asarray(np.asarray(sd[t + "cls_token"]).reshape(w),
                                     dtype),
            "pos_embed": jnp.asarray(np.asarray(sd[t + "pos_embed"]).reshape(-1, w),
                                     dtype),
            "blocks": blocks,
            "norm": ln(t + "norm"),
            "head_w": arr(t + "head.weight"),
            "head_b": arr(t + "head.bias"),
        }

    params = {"trunk": trunk}
    h = prefix + "head."
    if h + "proj.weight" in sd:
        params["head"] = {"proj_w": arr(h + "proj.weight")}
        if h + "proj.bias" in sd:
            params["head"]["proj_b"] = arr(h + "proj.bias")
    elif h + "mlp.fc1.weight" in sd:
        params["head"] = {"mlp": {"c_fc_w": arr(h + "mlp.fc1.weight"),
                                  "c_fc_b": arr(h + "mlp.fc1.bias"),
                                  "c_proj_w": arr(h + "mlp.fc2.weight"),
                                  "c_proj_b": arr(h + "mlp.fc2.bias")}}
    return params


def clip_params_from_state_dict(sd: Mapping[str, np.ndarray], dtype=jnp.float32,
                                timm_model_name: str | None = None) -> dict:
    if timm_model_name and ("visual.trunk.stem.0.weight" in sd
                            or "visual.trunk.patch_embed.proj.weight" in sd):
        visual = timm_tower_params_from_state_dict(sd, timm_model_name,
                                                   dtype=dtype)
    elif "visual.conv1.weight" in sd:
        visual = vision_params_from_state_dict(sd, "visual.", dtype)
    else:  # timm-flavoured vision tower export
        visual = vision_params_from_timm_state_dict(sd, dtype=dtype)
    # CustomTextCLIP exports nest the text tower under 'text.'
    text_prefix = "text." if "text.token_embedding.weight" in sd else ""
    params = {
        "visual": visual,
        "text": text_params_from_state_dict(sd, text_prefix, dtype),
        "logit_scale": jnp.asarray(sd.get("logit_scale", np.log(1 / 0.07)),
                                   dtype),
    }
    if "logit_bias" in sd:
        params["logit_bias"] = jnp.asarray(sd["logit_bias"], dtype)
    return params


def infer_clip_config_from_state_dict(sd: Mapping[str, np.ndarray],
                                      quick_gelu: bool = True) -> CLIPConfig:
    """Infer the architecture from a checkpoint, like the reference's
    ``build_model_from_openai_state_dict`` (reference model.py:470-526)."""
    from rs_ov.core.config import TextConfig, VisionConfig

    if "visual.conv1.weight" in sd:
        v_width = sd["visual.conv1.weight"].shape[0]
        patch = sd["visual.conv1.weight"].shape[-1]
        v_layers = _count_blocks(sd, "visual.transformer.resblocks")
        grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
        embed_dim = sd["visual.proj"].shape[1]
    else:  # timm-flavoured export
        p = detect_timm_vision_prefix(sd)
        if p is None:
            raise KeyError("state dict has neither open_clip nor timm "
                           "vision-tower names")
        conv1 = sd[f"{p}patch_embed.proj.weight"]
        v_width, patch = conv1.shape[0], conv1.shape[-1]
        v_layers = 0
        while f"{p}blocks.{v_layers}.norm1.weight" in sd:
            v_layers += 1
        pos = np.asarray(sd[f"{p}pos_embed"])
        npos = pos.shape[-2]
        grid = int(round(npos ** 0.5))
        if grid * grid != npos:
            grid = int(round((npos - 1) ** 0.5))
        embed_dim = (sd[f"{p}head.proj.weight"].shape[0]
                     if f"{p}head.proj.weight" in sd else v_width)
    image_size = grid * patch
    if "ln_final.weight" not in sd:  # vision-only export
        return CLIPConfig(
            embed_dim=embed_dim,
            vision=VisionConfig(image_size=image_size, patch_size=patch,
                                width=v_width, layers=v_layers,
                                output_dim=embed_dim),
            text=TextConfig(output_dim=embed_dim),
            quick_gelu=quick_gelu,
        )
    t_width = sd["ln_final.weight"].shape[0]
    t_layers = _count_blocks(sd, "transformer.resblocks")
    ctx = sd["positional_embedding"].shape[0]
    vocab = sd["token_embedding.weight"].shape[0]
    heads = t_width // 64
    return CLIPConfig(
        embed_dim=embed_dim,
        vision=VisionConfig(image_size=image_size, patch_size=patch,
                            width=v_width, layers=v_layers, output_dim=embed_dim),
        text=TextConfig(context_length=ctx, vocab_size=vocab, width=t_width,
                        heads=heads, layers=t_layers, output_dim=embed_dim),
        quick_gelu=quick_gelu,
    )


# ---------------------------------------------------------------------------
# big_vision JAX .npz checkpoints (the reference loads SigLIP-style npz via
# open_clip/big_vision.py:9; here the ViT weights map natively — they were
# JAX arrays to begin with)
# ---------------------------------------------------------------------------

def vision_params_from_big_vision_npz(path: str, dtype=jnp.float32) -> dict:
    """Map a big_vision ViT (params/img/... naming) to an rs_ov vision pytree.

    Supports classic ViT layout: embedding conv, cls token (zeros if the
    source is a pooled SigLIP tower without one), posembed, encoderblocks
    with fused-qkv reconstruction, encoder_norm as ln_post. The projection
    head ('head/kernel' or identity) maps to `proj`.
    """
    w = np.load(path)

    def find(*names):
        for n in names:
            for prefix in ("params/img/", "img/", ""):
                key = prefix + n
                if key in w:
                    return w[key]
        raise KeyError(f"none of {names} in {path}")

    emb_k = find("embedding/kernel")  # [ph, pw, 3, width]
    width = emb_k.shape[-1]
    conv1 = jnp.asarray(emb_k.transpose(3, 2, 0, 1), dtype)
    pos = find("Transformer/posembed_input/pos_embedding")[0]  # [N(+1), width]

    try:
        cls = find("cls")[0, 0]
        has_cls = True
    except KeyError:
        cls = np.zeros((width,), np.float32)
        has_cls = False
    if not has_cls:
        pos = np.concatenate([np.zeros((1, width), pos.dtype), pos], axis=0)

    blocks = []
    i = 0
    while True:
        pre = f"Transformer/encoderblock_{i}/"
        try:
            ln1s = find(pre + "LayerNorm_0/scale")
        except KeyError:
            break
        attn_pre = pre + "MultiHeadDotProductAttention_1/"
        q = find(attn_pre + "query/kernel").reshape(width, -1)
        k = find(attn_pre + "key/kernel").reshape(width, -1)
        v = find(attn_pre + "value/kernel").reshape(width, -1)
        qb = find(attn_pre + "query/bias").reshape(-1)
        kb = find(attn_pre + "key/bias").reshape(-1)
        vb = find(attn_pre + "value/bias").reshape(-1)
        out_k = find(attn_pre + "out/kernel").reshape(-1, width)
        blocks.append({
            "ln_1": {"scale": jnp.asarray(ln1s, dtype),
                     "bias": jnp.asarray(find(pre + "LayerNorm_0/bias"), dtype)},
            "attn": {
                # torch (out, in) orientation: transpose the flax kernels
                "in_proj_w": jnp.asarray(
                    np.concatenate([q.T, k.T, v.T], axis=0), dtype),
                "in_proj_b": jnp.asarray(np.concatenate([qb, kb, vb]), dtype),
                "out_proj_w": jnp.asarray(out_k.T, dtype),
                "out_proj_b": jnp.asarray(find(attn_pre + "out/bias"), dtype),
            },
            "ln_2": {"scale": jnp.asarray(find(pre + "LayerNorm_2/scale"), dtype),
                     "bias": jnp.asarray(find(pre + "LayerNorm_2/bias"), dtype)},
            "mlp": {
                "c_fc_w": jnp.asarray(find(pre + "MlpBlock_3/Dense_0/kernel").T, dtype),
                "c_fc_b": jnp.asarray(find(pre + "MlpBlock_3/Dense_0/bias"), dtype),
                "c_proj_w": jnp.asarray(find(pre + "MlpBlock_3/Dense_1/kernel").T, dtype),
                "c_proj_b": jnp.asarray(find(pre + "MlpBlock_3/Dense_1/bias"), dtype),
            },
        })
        i += 1

    try:
        proj = jnp.asarray(find("head/kernel"), dtype)
    except KeyError:
        proj = jnp.eye(width, dtype=dtype)

    return {
        "conv1_w": conv1,
        "class_embedding": jnp.asarray(cls, dtype),
        "positional_embedding": jnp.asarray(pos, dtype),
        "ln_pre": {"scale": jnp.ones((width,), dtype),
                   "bias": jnp.zeros((width,), dtype)},
        "blocks": blocks,
        "ln_post": {"scale": jnp.asarray(find("Transformer/encoder_norm/scale"), dtype),
                    "bias": jnp.asarray(find("Transformer/encoder_norm/bias"), dtype)},
        "proj": proj,
    }


def _bv_find(w, path: str, *names):
    for n in names:
        for prefix in ("params/", ""):
            if prefix + n in w:
                return w[prefix + n]
    raise KeyError(f"none of {names} in {path}")


def _bv_blocks(w, path, base, width, dtype):
    """big_vision encoderblock_i stack -> rs_ov block list (fused-qkv).
    The stack lives under Transformer/ (vision) or Encoder_0/ (text)."""
    stack = f"{base}/Transformer"
    try:
        _bv_find(w, path, stack + "/encoderblock_0/LayerNorm_0/scale")
    except KeyError:
        stack = f"{base}/Encoder_0"
    blocks = []
    i = 0
    while True:
        pre = f"{stack}/encoderblock_{i}/"
        try:
            ln1s = _bv_find(w, path, pre + "LayerNorm_0/scale")
        except KeyError:
            break
        attn_pre = pre + "MultiHeadDotProductAttention_1/"
        try:
            _bv_find(w, path, attn_pre + "query/kernel")
        except KeyError:
            attn_pre = pre + "MultiHeadDotProductAttention_0/"
        q = _bv_find(w, path, attn_pre + "query/kernel").reshape(width, -1)
        k = _bv_find(w, path, attn_pre + "key/kernel").reshape(width, -1)
        v = _bv_find(w, path, attn_pre + "value/kernel").reshape(width, -1)
        blocks.append({
            "ln_1": {"scale": jnp.asarray(ln1s, dtype),
                     "bias": jnp.asarray(_bv_find(w, path, pre + "LayerNorm_0/bias"), dtype)},
            "attn": {
                "in_proj_w": jnp.asarray(np.concatenate([q.T, k.T, v.T], 0), dtype),
                "in_proj_b": jnp.asarray(np.concatenate(
                    [_bv_find(w, path, attn_pre + n + "/bias").reshape(-1)
                     for n in ("query", "key", "value")]), dtype),
                "out_proj_w": jnp.asarray(
                    _bv_find(w, path, attn_pre + "out/kernel").reshape(-1, width).T, dtype),
                "out_proj_b": jnp.asarray(_bv_find(w, path, attn_pre + "out/bias"), dtype),
            },
            "ln_2": {"scale": jnp.asarray(_bv_find(w, path, pre + "LayerNorm_1/scale",
                                                   pre + "LayerNorm_2/scale"), dtype),
                     "bias": jnp.asarray(_bv_find(w, path, pre + "LayerNorm_1/bias",
                                                  pre + "LayerNorm_2/bias"), dtype)},
            "mlp": {
                "c_fc_w": jnp.asarray(_bv_find(w, path, pre + "MlpBlock_3/Dense_0/kernel").T, dtype),
                "c_fc_b": jnp.asarray(_bv_find(w, path, pre + "MlpBlock_3/Dense_0/bias"), dtype),
                "c_proj_w": jnp.asarray(_bv_find(w, path, pre + "MlpBlock_3/Dense_1/kernel").T, dtype),
                "c_proj_b": jnp.asarray(_bv_find(w, path, pre + "MlpBlock_3/Dense_1/bias"), dtype),
            },
        })
        i += 1
    return blocks


def siglip_params_from_big_vision_npz(path: str, dtype=jnp.float32) -> dict:
    """Map a big_vision SigLIP .npz onto the NATIVE towers: the CLS-less
    MAP-head vision trunk (nn/timm_tower.py siglip family) and the 'last'-
    pooled text tower — no fake-CLS approximation (cf.
    vision_params_from_big_vision_npz, which targets the classic ViT tree).

    Returns {'visual': {'trunk': ...}, 'text': ..., 'logit_scale',
    'logit_bias'} matching a ViT-*-SigLIP registry config."""
    w = np.load(path)

    emb_k = _bv_find(w, path, "img/embedding/kernel")
    width = emb_k.shape[-1]
    pos = _bv_find(w, path, "img/Transformer/posembed_input/pos_embedding")[0]
    map_pre = "img/MAPHead_0/"
    mha = map_pre + "MultiHeadDotProductAttention_0/"
    q_k = _bv_find(w, path, mha + "query/kernel").reshape(width, -1)
    k_k = _bv_find(w, path, mha + "key/kernel").reshape(width, -1)
    v_k = _bv_find(w, path, mha + "value/kernel").reshape(width, -1)
    trunk = {
        "patch_embed_w": jnp.asarray(emb_k.transpose(3, 2, 0, 1), dtype),
        "patch_embed_b": jnp.asarray(_bv_find(w, path, "img/embedding/bias"), dtype),
        "pos_embed": jnp.asarray(pos, dtype),
        "blocks": _bv_blocks(w, path, "img", width, dtype),
        "norm": {"scale": jnp.asarray(_bv_find(w, path, "img/Transformer/encoder_norm/scale"), dtype),
                 "bias": jnp.asarray(_bv_find(w, path, "img/Transformer/encoder_norm/bias"), dtype)},
        "attn_pool": {
            "latent": jnp.asarray(_bv_find(w, path, map_pre + "probe")[0], dtype),
            "q_w": jnp.asarray(q_k.T, dtype),
            "q_b": jnp.asarray(_bv_find(w, path, mha + "query/bias").reshape(-1), dtype),
            "kv_w": jnp.asarray(np.concatenate([k_k.T, v_k.T], 0), dtype),
            "kv_b": jnp.asarray(np.concatenate(
                [_bv_find(w, path, mha + "key/bias").reshape(-1),
                 _bv_find(w, path, mha + "value/bias").reshape(-1)]), dtype),
            "proj_w": jnp.asarray(
                _bv_find(w, path, mha + "out/kernel").reshape(-1, width).T, dtype),
            "proj_b": jnp.asarray(_bv_find(w, path, mha + "out/bias"), dtype),
            "norm": {"scale": jnp.asarray(_bv_find(w, path, map_pre + "LayerNorm_0/scale"), dtype),
                     "bias": jnp.asarray(_bv_find(w, path, map_pre + "LayerNorm_0/bias"), dtype)},
            "mlp": {
                "c_fc_w": jnp.asarray(_bv_find(w, path, map_pre + "MlpBlock_0/Dense_0/kernel").T, dtype),
                "c_fc_b": jnp.asarray(_bv_find(w, path, map_pre + "MlpBlock_0/Dense_0/bias"), dtype),
                "c_proj_w": jnp.asarray(_bv_find(w, path, map_pre + "MlpBlock_0/Dense_1/kernel").T, dtype),
                "c_proj_b": jnp.asarray(_bv_find(w, path, map_pre + "MlpBlock_0/Dense_1/bias"), dtype),
            },
        },
    }

    t_width = _bv_find(w, path, "txt/Embed_0/embedding").shape[-1]
    text = {
        "token_embedding": jnp.asarray(_bv_find(w, path, "txt/Embed_0/embedding"), dtype),
        "positional_embedding": jnp.asarray(
            _bv_find(w, path, "txt/pos_embedding")[0], dtype),
        "blocks": _bv_blocks(w, path, "txt", t_width, dtype),
        "ln_final": {"scale": jnp.asarray(_bv_find(w, path, "txt/Encoder_0/encoder_norm/scale",
                                                   "txt/Transformer/encoder_norm/scale"), dtype),
                     "bias": jnp.asarray(_bv_find(w, path, "txt/Encoder_0/encoder_norm/bias",
                                                  "txt/Transformer/encoder_norm/bias"), dtype)},
        "text_projection": jnp.asarray(_bv_find(w, path, "txt/head/kernel"), dtype),
        "text_projection_b": jnp.asarray(_bv_find(w, path, "txt/head/bias"), dtype),
    }
    params = {"visual": {"trunk": trunk}, "text": text}
    try:
        params["logit_scale"] = jnp.asarray(_bv_find(w, path, "t"), dtype)
        params["logit_bias"] = jnp.asarray(_bv_find(w, path, "b"), dtype)
    except KeyError:
        pass
    return params


# ---------------------------------------------------------------------------
# SimFeatUp / JBU checkpoints (reference segmentor.py:281-283 strips 'upsampler.'
# -> keys like 'up.range_proj.0.weight'; JBUStack uses up1..up4)
# ---------------------------------------------------------------------------

def _jbu_module_from_sd(sd, prefix, dtype):
    return {
        "range_temp": jnp.asarray(sd[f"{prefix}.range_temp"], dtype),
        "sigma_spatial": jnp.asarray(sd[f"{prefix}.sigma_spatial"], dtype),
        "range_proj": {
            "w0": jnp.asarray(sd[f"{prefix}.range_proj.0.weight"], dtype),
            "b0": jnp.asarray(sd[f"{prefix}.range_proj.0.bias"], dtype),
            "w1": jnp.asarray(sd[f"{prefix}.range_proj.3.weight"], dtype),
            "b1": jnp.asarray(sd[f"{prefix}.range_proj.3.bias"], dtype),
        },
        "fixup_proj": {
            "w0": jnp.asarray(sd[f"{prefix}.fixup_proj.0.weight"], dtype),
            "b0": jnp.asarray(sd[f"{prefix}.fixup_proj.0.bias"], dtype),
            "w1": jnp.asarray(sd[f"{prefix}.fixup_proj.3.weight"], dtype),
            "b1": jnp.asarray(sd[f"{prefix}.fixup_proj.3.bias"], dtype),
        },
    }


def jbu_params_from_state_dict(sd: Mapping[str, np.ndarray], model_name: str,
                               dtype=jnp.float32, strip_prefix: str = "upsampler.") -> dict:
    """Map a SimFeatUp checkpoint ('jbu_one' or 'jbu_stack') to a pytree."""
    if strip_prefix:
        sd = {(k[len(strip_prefix):] if k.startswith(strip_prefix) else k): v
              for k, v in sd.items()}
    if model_name == "jbu_one":
        return {
            "up": _jbu_module_from_sd(sd, "up", dtype),
            "final_fixup": {
                "w": jnp.asarray(sd["fixup_proj.1.weight"], dtype),
                "b": jnp.asarray(sd["fixup_proj.1.bias"], dtype),
            },
        }
    if model_name == "jbu_stack":
        return {
            "ups": [_jbu_module_from_sd(sd, f"up{i}", dtype) for i in (1, 2, 3, 4)],
            "final_fixup": {
                "w": jnp.asarray(sd["fixup_proj.1.weight"], dtype),
                "b": jnp.asarray(sd["fixup_proj.1.bias"], dtype),
            },
        }
    raise ValueError(f"Unknown SimFeatUp model '{model_name}'")


def coca_params_from_state_dict(sd: Mapping[str, np.ndarray],
                                dtype=jnp.float32) -> dict:
    """Map an open_clip CoCa state dict (reference coca_model.py:80-131
    naming: visual.* with attn_pool, text.* with cls_emb, text_decoder.*
    MultimodalTransformer) to an rs_ov.nn.coca pytree."""
    def pool(prefix):
        return {
            "query": jnp.asarray(sd[f"{prefix}.query"], dtype),
            "ln_q": _ln(sd, f"{prefix}.ln_q", dtype),
            "ln_k": _ln(sd, f"{prefix}.ln_k", dtype),
            "q_proj_w": jnp.asarray(sd[f"{prefix}.attn.q_proj_weight"], dtype),
            "k_proj_w": jnp.asarray(sd[f"{prefix}.attn.k_proj_weight"], dtype),
            "v_proj_w": jnp.asarray(sd[f"{prefix}.attn.v_proj_weight"], dtype),
            "in_proj_b": jnp.asarray(sd[f"{prefix}.attn.in_proj_bias"], dtype),
            "out_proj_w": jnp.asarray(sd[f"{prefix}.attn.out_proj.weight"], dtype),
            "out_proj_b": jnp.asarray(sd[f"{prefix}.attn.out_proj.bias"], dtype),
        }

    visual = vision_params_from_state_dict(sd, prefix="visual.", dtype=dtype)
    visual["attn_pool"] = pool("visual.attn_pool")

    if "text.transformer.embeddings.word_embeddings.weight" in sd:
        # HF text tower (coca_roberta-*): text.transformer.* RobertaModel +
        # text.proj.* head (reference hf_model.py:121-154)
        from rs_ov.nn.hf_text import hf_text_params_from_state_dict

        import jax

        text = jax.tree.map(lambda x: x.astype(dtype),
                            hf_text_params_from_state_dict(sd, prefix="text."))
    else:
        text = text_params_from_state_dict(sd, prefix="text.", dtype=dtype)
        text["cls_emb"] = jnp.asarray(sd["text.cls_emb"], dtype)

    n = _count_blocks(sd, "text_decoder.resblocks")
    cross = []
    for i in range(n):
        blk = _block(sd, f"text_decoder.cross_attn.{i}", dtype)
        blk["ln_1_kv"] = _ln(sd, f"text_decoder.cross_attn.{i}.ln_1_kv", dtype)
        cross.append(blk)
    multimodal = {
        "blocks": [_block(sd, f"text_decoder.resblocks.{i}", dtype)
                   for i in range(n)],
        "cross_blocks": cross,
        "ln_final": _ln(sd, "text_decoder.ln_final", dtype),
        "text_projection": jnp.asarray(sd["text_decoder.text_projection"], dtype),
    }
    return {"visual": visual, "text": text, "multimodal": multimodal,
            "logit_scale": jnp.asarray(sd["logit_scale"], dtype)}
