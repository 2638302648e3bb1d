"""Batched cross-tile fusion vs the reference's sequential cache walk."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ref_shim import load_reference_module
from rs_ov.decontam.cross_tile import CrossTileFusionConfig, fuse_tile_grid


@pytest.mark.parametrize("mode", ["weighted", "attention"])
def test_matches_reference_sequential(mode):
    ctf_mod = load_reference_module("cross_tile_fusion")
    gh, gw = 3, 4
    ph, pw, c = 6, 6, 16
    rng = np.random.RandomState(0)
    tiles = rng.randn(gh * gw, ph * pw, c).astype(np.float32)

    ref = ctf_mod.CrossTileFusion(fusion_mode=mode, cache_boundary_width=2,
                                  fusion_strength=0.3, adaptive_fusion=True)
    ref_out = np.zeros_like(tiles)
    with torch.no_grad():
        t = 0
        for h in range(gh):
            for w in range(gw):
                cur = torch.from_numpy(tiles[t:t + 1].copy())
                ref_out[t] = ref(cur, h, w, ph, pw).numpy()[0]
                t += 1

    cfg = CrossTileFusionConfig(fusion_mode=mode, cache_boundary_width=2,
                                fusion_strength=0.3, adaptive_fusion=True)
    got = np.asarray(fuse_tile_grid(jnp.asarray(tiles), (gh, gw), (ph, pw), cfg))
    np.testing.assert_allclose(got, ref_out, atol=3e-5, rtol=3e-4)


def test_fixed_threshold_mode():
    ctf_mod = load_reference_module("cross_tile_fusion")
    gh, gw, ph, pw, c = 2, 2, 4, 4, 8
    rng = np.random.RandomState(1)
    tiles = rng.randn(gh * gw, ph * pw, c).astype(np.float32)

    ref = ctf_mod.CrossTileFusion(fusion_mode="weighted", cache_boundary_width=1,
                                  fusion_strength=0.5, adaptive_fusion=False,
                                  similarity_threshold=0.1)
    ref_out = np.zeros_like(tiles)
    with torch.no_grad():
        t = 0
        for h in range(gh):
            for w in range(gw):
                ref_out[t] = ref(torch.from_numpy(tiles[t:t + 1].copy()), h, w, ph, pw).numpy()[0]
                t += 1

    cfg = CrossTileFusionConfig(fusion_mode="weighted", cache_boundary_width=1,
                                fusion_strength=0.5, adaptive_fusion=False,
                                similarity_threshold=0.1)
    got = np.asarray(fuse_tile_grid(jnp.asarray(tiles), (gh, gw), (ph, pw), cfg))
    np.testing.assert_allclose(got, ref_out, atol=3e-5, rtol=3e-4)
