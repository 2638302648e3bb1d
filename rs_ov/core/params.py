"""Parameter pytrees for the CLIP towers.

Params are plain nested dicts of jnp arrays (no framework classes) so they
round-trip cleanly through ``jax.jit`` / ``pjit`` / orbax and map 1:1 onto the
torch state-dict naming of the reference checkpoints (see
``rs_ov.core.checkpoint`` for the name map; reference naming comes from
open_clip/transformer.py module structure).

Layout:
  clip = {
    'visual': {
      'conv1_w': (width, 3, p, p),
      'class_embedding': (width,),
      'positional_embedding': (grid*grid+1, width),
      'ln_pre': {'scale','bias'},
      'blocks': [ { 'ln_1': {...},
                    'attn': {'in_proj_w': (3w, w), 'in_proj_b': (3w,),
                             'out_proj_w': (w, w), 'out_proj_b': (w,)},
                    'ln_2': {...},
                    'mlp': {'c_fc_w': (4w, w), 'c_fc_b', 'c_proj_w': (w, 4w), 'c_proj_b'} } ... ],
      'ln_post': {...},
      'proj': (width, embed_dim),
    },
    'text': {
      'token_embedding': (vocab, width),
      'positional_embedding': (ctx, width),
      'blocks': [...same...],
      'ln_final': {...},
      'text_projection': (width, embed_dim),
    },
    'logit_scale': (),
  }

Linear weights keep torch's (out, in) orientation; forward code multiplies by
the transpose. That keeps checkpoint loading a pure reshape-free rename.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rs_ov.core.config import CLIPConfig, TextConfig, VisionConfig

__all__ = ["init_clip_params", "init_vision_params", "init_text_params", "cast_floating"]


def _ln(width: int, dtype) -> dict:
    return {"scale": jnp.ones((width,), dtype), "bias": jnp.zeros((width,), dtype)}


def _block(key, width: int, mlp_ratio: float, dtype, ls_init_value=None) -> dict:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mlp_width = int(width * mlp_ratio)
    attn_std = width ** -0.5
    proj_std = attn_std * 0.5
    fc_std = (2 * width) ** -0.5
    return {
        "ln_1": _ln(width, dtype),
        "attn": {
            "in_proj_w": (jax.random.normal(k1, (3 * width, width)) * attn_std).astype(dtype),
            "in_proj_b": jnp.zeros((3 * width,), dtype),
            "out_proj_w": (jax.random.normal(k2, (width, width)) * proj_std).astype(dtype),
            "out_proj_b": jnp.zeros((width,), dtype),
        },
        "ln_2": _ln(width, dtype),
        "mlp": {
            "c_fc_w": (jax.random.normal(k3, (mlp_width, width)) * fc_std).astype(dtype),
            "c_fc_b": jnp.zeros((mlp_width,), dtype),
            "c_proj_w": (jax.random.normal(k4, (width, mlp_width)) * proj_std).astype(dtype),
            "c_proj_b": jnp.zeros((width,), dtype),
        },
        **({} if ls_init_value is None else {
            "ls_1": jnp.full((width,), ls_init_value, dtype),
            "ls_2": jnp.full((width,), ls_init_value, dtype),
        }),
    }


def init_vision_params(key, cfg: VisionConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, cfg.layers + 4)
    scale = cfg.width ** -0.5
    gh, gw = cfg.grid_size
    return {
        "conv1_w": (jax.random.normal(keys[0], (cfg.width, 3, cfg.patch_size, cfg.patch_size))
                    * scale).astype(dtype),
        "class_embedding": (jax.random.normal(keys[1], (cfg.width,)) * scale).astype(dtype),
        "positional_embedding": (jax.random.normal(keys[2], (gh * gw + 1, cfg.width))
                                 * scale).astype(dtype),
        "ln_pre": _ln(cfg.width, dtype),
        "blocks": [_block(keys[4 + i], cfg.width, cfg.mlp_ratio, dtype,
                          ls_init_value=getattr(cfg, "ls_init_value", None))
                   for i in range(cfg.layers)],
        "ln_post": _ln(cfg.width, dtype),
        "proj": (jax.random.normal(keys[3], (cfg.width, cfg.output_dim)) * scale).astype(dtype),
    }


def init_text_params(key, cfg: TextConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, cfg.layers + 3)
    return {
        "token_embedding": (jax.random.normal(keys[0], (cfg.vocab_size, cfg.width))
                            * 0.02).astype(dtype),
        "positional_embedding": (jax.random.normal(keys[1], (cfg.context_length, cfg.width))
                                 * 0.01).astype(dtype),
        "blocks": [_block(keys[3 + i], cfg.width, cfg.mlp_ratio, dtype)
                   for i in range(cfg.layers)],
        "ln_final": _ln(cfg.width, dtype),
        "text_projection": (jax.random.normal(keys[2], (cfg.width, cfg.output_dim))
                            * cfg.width ** -0.5).astype(dtype),
        **({"text_projection_b": jnp.zeros((cfg.output_dim,), dtype)}
           if getattr(cfg, "proj_bias", False) else {}),
    }


def _init_clip_params_impl(key, cfg: CLIPConfig, dtype) -> dict:
    kv, kt = jax.random.split(key)
    return {
        "visual": init_vision_params(kv, cfg.vision, dtype),
        "text": init_text_params(kt, cfg.text, dtype),
        "logit_scale": jnp.asarray(np.log(1 / 0.07), dtype),
    }


# one compiled (and persistently cached) program instead of ~60 individual
# jax.random.normal dispatches — through the axon tunnel the eager version
# costs ~36s of SegmentorEx startup, the jitted one <2s warm
_init_clip_params_jit = jax.jit(
    _init_clip_params_impl, static_argnums=(1,), static_argnames=("dtype",))


def init_clip_params(key, cfg: CLIPConfig, dtype=jnp.float32) -> dict:
    return _init_clip_params_jit(key, cfg, dtype=np.dtype(dtype).name)


def cast_floating(tree, dtype):
    """Cast all floating-point leaves of a pytree to `dtype`."""

    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)
