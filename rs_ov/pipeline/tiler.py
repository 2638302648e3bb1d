"""Sliding-window tiling as a static, batched, jit-friendly program.

The reference loops tiles one-by-one in Python and accumulates on the GPU
(reference segmentor.py:394-451). Here the tile grid is computed once per
image shape (trace-time constants), every tile is extracted with static
slices into ONE batched array [T, 3, ch, cw], the whole decontaminating ViT
runs batched over T, and stitching is a set of static dynamic-update-slice
adds — one fused XLA program per image geometry, no host round-trips.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

__all__ = ["compute_padsize", "tile_grid", "extract_tiles", "stitch"]


def compute_padsize(h: int, w: int, patch_size: int):
    """(left, right, top, bottom) pads to the next patch multiple
    (reference segmentor.py:534-546)."""
    l = r = t = b = 0
    if w % patch_size:
        lr = patch_size - (w % patch_size)
        l = lr // 2
        r = lr - l
    if h % patch_size:
        tb = patch_size - (h % patch_size)
        t = tb // 2
        b = tb - t
    return l, r, t, b


@functools.lru_cache(maxsize=None)
def tile_grid(h_img: int, w_img: int, stride: int, crop: int):
    """Static (y1, x1, y2, x2) tuples of the overlapping crop grid
    (reference segmentor.py:411-423)."""
    h_grids = max(h_img - crop + stride - 1, 0) // stride + 1
    w_grids = max(w_img - crop + stride - 1, 0) // stride + 1
    coords = []
    for h_idx in range(h_grids):
        for w_idx in range(w_grids):
            y1 = h_idx * stride
            x1 = w_idx * stride
            y2 = min(y1 + crop, h_img)
            x2 = min(x1 + crop, w_img)
            y1 = max(y2 - crop, 0)
            x1 = max(x2 - crop, 0)
            coords.append((y1, x1, y2, x2))
    return tuple(coords), (h_grids, w_grids)


def extract_tiles(img: jnp.ndarray, coords) -> jnp.ndarray:
    """img: [3, H, W] -> [T, 3, ch, cw] (all crops share one static shape)."""
    tiles = [img[:, y1:y2, x1:x2] for (y1, x1, y2, x2) in coords]
    return jnp.stack(tiles, axis=0)


def stitch(tile_logits: jnp.ndarray, coords, h_img: int, w_img: int) -> jnp.ndarray:
    """Overlap-average stitching. tile_logits: [T, Q, ch, cw] -> [Q, H, W]."""
    q = tile_logits.shape[1]
    preds = jnp.zeros((q, h_img, w_img), jnp.float32)
    count = jnp.zeros((1, h_img, w_img), jnp.float32)
    for t, (y1, x1, y2, x2) in enumerate(coords):
        preds = preds.at[:, y1:y2, x1:x2].add(tile_logits[t].astype(jnp.float32))
        count = count.at[:, y1:y2, x1:x2].add(1.0)
    return preds / count
