"""CTD — Cluster-Then-Debias, with a fully on-device DBSCAN.

Re-design of reference ``CTD.py``: the reference shells out to cuML/sklearn
DBSCAN on ≤8192 L2-normalised patch tokens (CTD.py:84-144) then applies
per-cluster CLS-similarity-scaled debiasing (CTD.py:297-366). On TPU the
token count per tile is tiny (N ≤ 1024), so the N x N distance matrix is
materialised in VMEM and DBSCAN becomes:

  1. neighbour graph  A[i,j] = ||x_i - x_j|| <= eps
  2. core points      deg(i) >= min_samples (self included — sklearn rule)
  3. clusters         connected components of the core-core subgraph via
                      iterated min-label propagation (jax.lax.while_loop)
  4. border points    adopt the label of their lowest-index core neighbour
  5. labels renumbered by component discovery order (sklearn numbering)

Noise = -1. The only divergence from sklearn is tie-breaking when a border
point is within eps of TWO clusters (sklearn: BFS arrival order; here: lowest
core index) — a measure-zero event for real features.

Reference quirks reproduced deliberately:
  * `_normalize` uses eps=1.1 (CTD.py:63) — features are divided by
    (norm + 1.1), NOT unit-normalised, before the second exact normalise
    inside dbscan (CTD.py:103).
  * `adaptive_debiasing` normalises prototypes and CLS with the same
    eps=1.1 (CTD.py:358-361), so the "cosine" is strongly shrunk.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["DBSCANConfig", "dbscan", "cluster_patch_tokens_dbscan", "adaptive_debiasing"]


@dataclasses.dataclass(frozen=True)
class DBSCANConfig:
    eps: float = 1.1
    min_samples: int = 8
    metric: str = "cosine"  # 'cosine' | 'euclidean'
    use_spatial: bool = False
    spatial_weight: float = 0.25
    feat_weight: float = 1.0
    max_points: int = 4096
    refine_tokens: bool = False
    cls_subtract: bool = False
    cls_subtract_scale: float = 1.0
    cls_subtract_use_unit_cls: bool = True


def _normalize_ref(x: jnp.ndarray, eps: float = 1.1) -> jnp.ndarray:
    """The reference's quirky eps=1.1 'normalisation' (CTD.py:63-64)."""
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def dbscan(points: jnp.ndarray, *, eps: float, min_samples: int,
           metric: str = "euclidean") -> jnp.ndarray:
    """On-device DBSCAN. points: [N, D]. Returns int32 labels [N] (-1 noise).

    Points are L2-normalised first (reference dbscan CTD.py:103), then the
    neighbour graph is built with the requested metric.
    """
    n = points.shape[0]
    p = points.astype(jnp.float32)
    p = p / (jnp.linalg.norm(p, axis=-1, keepdims=True) + 1e-8)

    if metric == "euclidean":
        sq = jnp.sum(p * p, axis=-1)
        d2 = sq[:, None] + sq[None, :] - 2.0 * (p @ p.T)
        adj = d2 <= eps * eps
    elif metric == "cosine":
        dist = 1.0 - p @ p.T
        adj = dist <= eps
    else:
        raise ValueError(f"Unsupported metric: {metric}")

    deg = jnp.sum(adj, axis=-1)
    core = deg >= min_samples

    idx = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(n)
    labels0 = jnp.where(core, idx, big)
    core_adj = adj & core[:, None] & core[None, :]

    def cond(state):
        labels, changed = state
        return changed

    def body(state):
        labels, _ = state
        # min over core neighbours of their labels
        nbr_labels = jnp.where(core_adj, labels[None, :], big)
        prop = jnp.min(nbr_labels, axis=-1)
        new = jnp.minimum(labels, prop)
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(cond, body, (labels0, jnp.bool_(True)))

    # border points: lowest-index core neighbour's label
    core_nbr = jnp.where(adj & core[None, :], idx[None, :], big)
    first_core = jnp.min(core_nbr, axis=-1)  # [N], big if none
    has_core_nbr = first_core < big
    labels_ext = jnp.concatenate([labels, jnp.array([big], jnp.int32)])
    border_label = labels_ext[jnp.minimum(first_core, big)]
    roots = jnp.where(core, labels, jnp.where(has_core_nbr, border_label, big))

    # renumber components by discovery (ascending root index) like sklearn
    is_root = core & (labels == idx)
    rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1  # rank of each root index
    rank_ext = jnp.concatenate([rank, jnp.array([-1], jnp.int32)])
    final = rank_ext[jnp.minimum(roots, big)]
    return jnp.where(roots < big, final, -1).astype(jnp.int32)


def _segment_mean(values: jnp.ndarray, labels: jnp.ndarray, num_segments: int):
    """Per-cluster mean; labels -1 routed to a trash segment."""
    seg = jnp.where(labels >= 0, labels, num_segments)
    sums = jax.ops.segment_sum(values, seg, num_segments=num_segments + 1)[:num_segments]
    counts = jax.ops.segment_sum(jnp.ones_like(labels, jnp.float32), seg,
                                 num_segments=num_segments + 1)[:num_segments]
    return sums / jnp.clip(counts, 1.0, None)[:, None]


def cluster_patch_tokens_dbscan(patch_tokens: jnp.ndarray, grid_hw: tuple[int, int],
                                cfg: DBSCANConfig | dict | None = None,
                                cls_token: jnp.ndarray | None = None):
    """Cluster per-image patch tokens; optional refinement / CLS subtraction.

    patch_tokens: [B, N, C]. Returns (refined_tokens, labels [B, N] or None).
    Skip guards (shape / max_points) resolve at trace time — shapes are static.
    """
    if isinstance(cfg, dict) or cfg is None:
        base = DBSCANConfig()
        if cfg:
            base = dataclasses.replace(base, **{k: v for k, v in cfg.items()
                                                if hasattr(base, k)})
        cfg = base

    if patch_tokens.ndim != 3:
        return patch_tokens, None
    b, n, c = patch_tokens.shape
    hp, wp = int(grid_hw[0]), int(grid_hw[1])
    if hp * wp != n or n > int(cfg.max_points):
        return patch_tokens, None

    def prep(feats):
        if cfg.metric == "cosine":
            return feats.astype(jnp.float32)
        f = _normalize_ref(feats.astype(jnp.float32))
        if cfg.use_spatial:
            yy, xx = jnp.meshgrid(jnp.linspace(0.0, 1.0, hp),
                                  jnp.linspace(0.0, 1.0, wp), indexing="ij")
            xy = jnp.stack([xx, yy], axis=-1).reshape(n, 2)
            return jnp.concatenate([cfg.feat_weight * f, cfg.spatial_weight * xy], axis=-1)
        return cfg.feat_weight * f

    def one(feats, cls_b):
        labels = dbscan(prep(feats), eps=cfg.eps, min_samples=cfg.min_samples,
                        metric=cfg.metric)
        refined = feats
        if cfg.refine_tokens:
            means = _segment_mean(feats.astype(jnp.float32), labels, n)
            replaced = means[jnp.clip(labels, 0, n - 1)]
            refined = jnp.where((labels >= 0)[:, None],
                                replaced.astype(feats.dtype), refined)
        if cfg.cls_subtract and cls_b is not None:
            cls_f = cls_b.astype(jnp.float32)
            cls_vec = _normalize_ref(cls_f) if cfg.cls_subtract_use_unit_cls else cls_f
            protos = _segment_mean(feats.astype(jnp.float32), labels, n)
            proto_u = _normalize_ref(protos)
            cls_u = _normalize_ref(cls_f)
            sims = jnp.clip(jnp.sum(proto_u * cls_u[None], axis=-1), -1.0, 1.0)
            sub = sims[jnp.clip(labels, 0, n - 1)][:, None] * cls_vec[None] \
                * cfg.cls_subtract_scale
            refined = jnp.where((labels >= 0)[:, None],
                                (refined.astype(jnp.float32) - sub).astype(refined.dtype),
                                refined)
        return refined, labels

    if cls_token is not None and cls_token.ndim == 1:
        cls_token = jnp.broadcast_to(cls_token[None], (b, cls_token.shape[0]))
    if cls_token is None:
        refined, labels = jax.vmap(lambda f: one(f, None))(patch_tokens)
    else:
        refined, labels = jax.vmap(one)(patch_tokens, cls_token)
    return refined, labels


def adaptive_debiasing(items: jnp.ndarray, labels: jnp.ndarray | None,
                       bias: jnp.ndarray, *, factor: float,
                       eps: float = 1.1) -> jnp.ndarray:
    """Clustered CLS addition (reference CTD.py:297-366):
        x_i <- x_i + cos_eps(M_k, cls) * factor * cls   for i in cluster k
    where M_k is the cluster mean and cos_eps uses the reference's
    (norm + 1.1) pseudo-normalisation. Noise (-1) unchanged.

    items: [B, N, Q]; labels: [B, N]; bias: [B, Q].
    """
    if labels is None or items.ndim != 3 or labels.ndim != 2 or bias.ndim != 2:
        return items
    b, n, q = items.shape
    if labels.shape != (b, n) or bias.shape != (b, q) or factor == 0.0:
        return items

    def one(items_b, labels_b, bias_b):
        protos = _segment_mean(items_b.astype(jnp.float32), labels_b, n)
        proto_u = protos / (jnp.linalg.norm(protos, axis=-1, keepdims=True) + eps)
        cls_f = bias_b.astype(jnp.float32)
        cls_u = cls_f / (jnp.linalg.norm(cls_f, axis=-1, keepdims=True) + eps)
        sims = jnp.clip(jnp.sum(proto_u * cls_u[None], axis=-1), -1.0, 1.0)  # [n]
        add = sims[jnp.clip(labels_b, 0, n - 1)][:, None] * (factor * cls_f)[None]
        out = jnp.where((labels_b >= 0)[:, None],
                        items_b.astype(jnp.float32) + add, items_b.astype(jnp.float32))
        return out.astype(items_b.dtype)

    return jax.vmap(one)(items, labels, bias)
