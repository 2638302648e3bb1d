"""Cross-tile semantic fusion — wired for real, batch-parallel.

The reference designed this module (reference cross_tile_fusion.py) but never
connected it to the segmentor (forward_feature ignores its tile indices —
reference segmentor.py:286, :433). Here it is an actual pipeline stage.

Key observations enabling TPU parallelism (verified against the reference's
sequential cache walk in tests/test_cross_tile.py):
  * In raster order only the TOP and LEFT neighbours exist in the cache.
  * The reference's boundary strips are torch ``reshape`` results of slices
    of a view of the features, so view-vs-copy semantics leak into the math:
      - TOP/BOTTOM strips (contiguous row slices) are ALWAYS views — a
        tile's own fusion writes mutate its cached bottom strip, and the next
        row fuses against that POST-fusion bottom;
      - LEFT/RIGHT strips (column slices) are views only when bw == 1 (the
        singleton dim drops without copying); for bw > 1 torch copies them,
        i.e. they stay RAW snapshots taken at forward entry.
    Both regimes are reproduced exactly, keyed on bw.
  * Given that, rows carry the only dependency: one short static loop over
    grid rows, each row fully vectorised over columns (a per-column exact
    fallback covers the bw == 1 & pw <= 2 geometry where a left write could
    alias the right strip).

Both fusion modes are implemented:
  * 'weighted' — adaptive cosine-similarity threshold mu+sigma, squared-margin
    weights (reference :185-236; std is torch's UNBIASED std)
  * 'attention' — parameter-free joint attention (reference :143-183)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

__all__ = ["CrossTileFusionConfig", "fuse_tile_grid"]


@dataclasses.dataclass(frozen=True)
class CrossTileFusionConfig:
    fusion_mode: str = "weighted"  # 'weighted' | 'attention'
    cache_boundary_width: int = 2
    fusion_strength: float = 0.3
    adaptive_fusion: bool = True
    similarity_threshold: float | None = None


def _fuse_attention(current: jnp.ndarray, neighbor: jnp.ndarray,
                    strength: float) -> jnp.ndarray:
    """current [..., Nc, C], neighbor [..., Nn, C] (reference :143-183)."""
    c = current.shape[-1]
    combined = jnp.concatenate([current, neighbor], axis=-2)
    scale = c ** 0.5
    attn = jnp.einsum("...ic,...jc->...ij", current.astype(jnp.float32),
                      combined.astype(jnp.float32),
                      preferred_element_type=jnp.float32) / scale
    attn = jax.nn.softmax(attn, axis=-1)
    fused = jnp.einsum("...ij,...jc->...ic", attn, combined.astype(jnp.float32))
    out = current.astype(jnp.float32) * (1 - strength) + fused * strength
    return out.astype(current.dtype)


def _fuse_weighted(current: jnp.ndarray, neighbor: jnp.ndarray, *,
                   strength: float, adaptive: bool,
                   threshold: float | None, eps: float = 1e-6) -> jnp.ndarray:
    """Similarity-threshold weighted fusion (reference :185-236)."""
    cur32 = current.astype(jnp.float32)
    nb32 = neighbor.astype(jnp.float32)
    cn = cur32 / (jnp.linalg.norm(cur32, axis=-1, keepdims=True) + eps)
    nn_ = nb32 / (jnp.linalg.norm(nb32, axis=-1, keepdims=True) + eps)
    sim = jnp.einsum("...ic,...jc->...ij", cn, nn_,
                     preferred_element_type=jnp.float32)  # [..., Nc, Nn]

    if adaptive or threshold is None:
        mean = jnp.mean(sim, axis=-1, keepdims=True)
        std = jnp.std(sim, axis=-1, keepdims=True, ddof=1)  # torch unbiased std
        thr = mean + std
        margin = jax.nn.relu(sim - thr)
        raw = margin ** 2
        weights = raw / (jnp.sum(raw, axis=-1, keepdims=True) + eps)
        local_strength = jnp.clip(jnp.mean(margin, axis=-1, keepdims=True), 0.0, 1.0)
    else:
        mask = (sim > threshold).astype(jnp.float32)
        masked = sim * mask
        weights = masked / (jnp.sum(masked, axis=-1, keepdims=True) + eps)
        local_strength = jnp.ones_like(weights[..., :1])

    agg = jnp.einsum("...ij,...jc->...ic", weights, nb32,
                     preferred_element_type=jnp.float32)
    fs = strength * local_strength
    out = cur32 * (1 - fs) + agg * fs
    return out.astype(current.dtype)


def _fuse(current, neighbor, cfg: CrossTileFusionConfig):
    if cfg.fusion_mode == "attention":
        return _fuse_attention(current, neighbor, cfg.fusion_strength)
    return _fuse_weighted(current, neighbor, strength=cfg.fusion_strength,
                          adaptive=cfg.adaptive_fusion,
                          threshold=cfg.similarity_threshold)


def fuse_tile_grid(tile_features: jnp.ndarray, grid_shape: tuple[int, int],
                   patch_hw: tuple[int, int],
                   cfg: CrossTileFusionConfig) -> jnp.ndarray:
    """Fuse boundaries of a full tile grid in one batched pass.

    tile_features: [T, N, C] with T = GH*GW tiles in raster order,
    N = ph*pw patches per tile. Equivalent to the reference's sequential
    cache walk (see module docstring). Returns fused [T, N, C].
    """
    gh, gw = grid_shape
    ph, pw = patch_hw
    t, n, c = tile_features.shape
    assert t == gh * gw and n == ph * pw
    bw = cfg.cache_boundary_width

    grid = tile_features.reshape(gh, gw, ph, pw, c)

    lr_strips_are_views = (bw == 1 or bw == pw)  # torch view condition

    prev_bottom = None  # previous row's POST-fusion bottom strips [gw, bw*pw, c]
    out_rows = []
    for h in range(gh):
        raw_row = grid[h]  # [gw, ph, pw, c] — RAW features of this row
        row = raw_row
        # TOP fusion first (reference direction order), against the previous
        # row's post-fusion bottom strips; the top strip is read before any
        # write so it is raw.
        if prev_bottom is not None:
            raw_top = row[:, :bw].reshape(gw, bw * pw, c)
            fused_top = _fuse(raw_top, prev_bottom, cfg)
            row = row.at[:, :bw].set(fused_top.reshape(gw, bw, pw, c))

        # LEFT fusion: strips come from the post-top-write row when torch
        # views them (bw == 1), from the raw snapshot otherwise (torch copy).
        lr_src = row if lr_strips_are_views else raw_row
        if gw > 1 and (not lr_strips_are_views or pw > 2 * bw):
            left_s = lr_src[:, :, :bw].reshape(gw, ph * bw, c)
            right_s = lr_src[:, :, -bw:].reshape(gw, ph * bw, c)
            fused_left = _fuse(left_s[1:], right_s[:-1], cfg)
            row = row.at[1:, :, :bw].set(fused_left.reshape(gw - 1, ph, bw, c))
        elif gw > 1:
            # bw == 1 with tiny pw: a left write may alias the right strip —
            # walk columns exactly like the reference
            for w in range(1, gw):
                nb_right = row[w - 1, :, -bw:].reshape(1, ph * bw, c)
                cur_left = row[w, :, :bw].reshape(1, ph * bw, c)
                fused_left = _fuse(cur_left, nb_right, cfg)
                row = row.at[w, :, :bw].set(fused_left.reshape(ph, bw, c))

        prev_bottom = row[:, -bw:].reshape(gw, bw * pw, c)
        out_rows.append(row)

    return jnp.stack(out_rows, axis=0).reshape(t, n, c)
