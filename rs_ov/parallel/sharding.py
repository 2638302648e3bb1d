"""Parameter partition specs: tensor-parallel CLIP over the 'model' axis.

Megatron-style head/width sharding for both towers (the reference has NO
tensor parallelism — SURVEY.md §2.10 — this is the TPU-native upgrade):

  * attention in_proj  (3w, w): rows sharded — each chip holds a head subset
    for q, k and v (the 3w dim is three w-blocks, each head-divisible)
  * attention out_proj (w, w):  cols sharded (contract over the head subset,
    psum inserted by GSPMD)
  * MLP c_fc (4w, w): rows sharded; c_proj (w, 4w): cols sharded
  * embeddings / LayerNorms / projections: replicated

With PartitionSpec annotations + jit, XLA GSPMD inserts the all-reduces the
reference would have hand-written with NCCL.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["clip_param_shardings", "shard_params"]


def _block_spec():
    return {
        "ln_1": {"scale": P(), "bias": P()},
        "attn": {
            "in_proj_w": P("model", None),
            "in_proj_b": P("model"),
            "out_proj_w": P(None, "model"),
            "out_proj_b": P(),
        },
        "ln_2": {"scale": P(), "bias": P()},
        "mlp": {
            "c_fc_w": P("model", None),
            "c_fc_b": P("model"),
            "c_proj_w": P(None, "model"),
            "c_proj_b": P(),
        },
    }


def clip_param_shardings(params: dict) -> dict:
    """PartitionSpec pytree with the SAME structure as the param pytree."""

    def tower(tp: dict) -> dict:
        out = {k: jax.tree_util.tree_map(lambda _: P(), v)
               for k, v in tp.items() if k != "blocks"}
        out["blocks"] = [_block_spec() for _ in tp["blocks"]]
        return out

    spec: dict = {}
    if "visual" in params:
        spec["visual"] = tower(params["visual"])
    if "text" in params:
        spec["text"] = tower(params["text"])
    if "logit_scale" in params:
        spec["logit_scale"] = P()
    if "logit_bias" in params:
        spec["logit_bias"] = P()
    return spec


def shard_params(params: dict, mesh: Mesh, spec: dict | None = None) -> dict:
    """Place a param pytree onto the mesh with tensor-parallel shardings."""
    spec = spec or clip_param_shardings(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, spec)
