"""EVA / EVA02 numerical oracle.

The reference runs the EVA family through timm (reference
open_clip/timm_model.py:29-73; 7 of the 60 arch configs are EVA*). No timm
package exists in this image, so this file carries an *independent*
from-scratch torch float64 implementation of the EVA02 block semantics as
published (EVA-02: A Visual Representation for Neon Genesis, arXiv:2303.11331):

- separate q/k/v projections, k without bias;
- 2-D axial rotary position embedding on the patch tokens (CLS excluded),
  theta=10000, head_dim//4 frequency bands per axis, y-angles then x-angles,
  optionally rescaled to a reference feature grid;
- SwiGLU MLP (silu-gated) with an inner LayerNorm before the down-projection;
- optional LayerNorm on the attention output before the out-projection;
- pre-norm blocks, or the post-norm variant (EVA02-E / eva_giant lineage)
  where the LayerNorm wraps each sublayer *output* inside the residual.

The oracle is deliberately structured differently from rs_ov's JAX version:
rotary is complex multiplication (torch.view_as_complex / torch.polar) rather
than the (even, odd) lane-pair rotation, patchify is a real conv2d rather
than extract+matmul, and everything runs in float64 — so a shared bug would
have to be a shared misreading of the published semantics, not shared code.

Every flag combination `nn/timm_tower.py` supports is golden-tested here the
same way ConvNeXt/SigLIP are oracle-tested in test_timm_towers.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from rs_ov.nn import timm_tower as tt  # noqa: E402


# ---------------------------------------------------------------------------
# torch float64 oracle
# ---------------------------------------------------------------------------

def _j2t(a):
    return torch.from_numpy(np.asarray(a)).to(torch.float64)


def _oracle_rope_angles(head_dim, gh, gw, ref_hw):
    """[N, head_dim//2] rotation angles: y-axis bands then x-axis bands."""
    nb = head_dim // 4
    freqs = 10000.0 ** (-torch.arange(nb, dtype=torch.float64) / nb)
    ys = torch.arange(gh, dtype=torch.float64)
    xs = torch.arange(gw, dtype=torch.float64)
    if ref_hw is not None:
        ys = ys * (ref_hw[0] / gh)
        xs = xs * (ref_hw[1] / gw)
    yy, xx = torch.meshgrid(ys, xs, indexing="ij")
    ay = yy.reshape(-1, 1) * freqs  # [N, nb]
    ax = xx.reshape(-1, 1) * freqs  # [N, nb]
    return torch.cat([ay, ax], dim=-1)


def _oracle_apply_rope(t, ang):
    """t [..., N, hd]; consecutive lane pairs as complex, multiply e^{i*ang}."""
    tc = torch.view_as_complex(
        t.reshape(*t.shape[:-1], t.shape[-1] // 2, 2).contiguous())
    rot = torch.polar(torch.ones_like(ang), ang)
    return torch.view_as_real(tc * rot).reshape(t.shape)


def _oracle_ln(x, p, eps=1e-6):
    return F.layer_norm(x, (x.shape[-1],), p["scale"], p["bias"], eps)


def _oracle_attn(x, blk, arch, ang):
    b, n, w = x.shape
    heads = arch.heads
    hd = w // heads
    if arch.fused_qkv:
        qkv = F.linear(x, blk["in_proj_w"], blk["in_proj_b"])
        q, k, v = qkv.chunk(3, dim=-1)
    else:
        q = F.linear(x, blk["q_w"], blk["q_b"])
        k = F.linear(x, blk["k_w"])  # no bias
        v = F.linear(x, blk["v_w"], blk["v_b"])
    q = q.view(b, n, heads, hd).permute(0, 2, 1, 3)
    k = k.view(b, n, heads, hd).permute(0, 2, 1, 3)
    v = v.view(b, n, heads, hd).permute(0, 2, 1, 3)
    if ang is not None:
        q = torch.cat([q[:, :, :1], _oracle_apply_rope(q[:, :, 1:], ang)], 2)
        k = torch.cat([k[:, :, :1], _oracle_apply_rope(k[:, :, 1:], ang)], 2)
    attn = torch.softmax(q @ k.transpose(-2, -1) / hd ** 0.5, dim=-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(b, n, w)
    if arch.scale_attn_inner:
        out = _oracle_ln(out, blk["inner_norm"])
    return F.linear(out, blk["out_proj_w"], blk["out_proj_b"])


def _oracle_mlp(x, m, arch):
    if arch.swiglu:
        h = F.silu(F.linear(x, m["fc1g_w"], m["fc1g_b"])) \
            * F.linear(x, m["fc1x_w"], m["fc1x_b"])
    else:
        h = F.gelu(F.linear(x, m["fc1_w"], m["fc1_b"]))
    if arch.scale_mlp:
        h = _oracle_ln(h, m["mlp_norm"])
    return F.linear(h, m["fc2_w"], m["fc2_b"])


def oracle_eva_forward(tp, img, arch, embed_dim):
    """Independent torch float64 EVA forward. tp: torch-ified param pytree."""
    b = img.shape[0]
    gh, gw = img.shape[2] // arch.patch, img.shape[3] // arch.patch
    x = F.conv2d(img, tp["patch_embed_w"].view(arch.width, 3, arch.patch,
                                               arch.patch),
                 tp["patch_embed_b"], stride=arch.patch)
    x = x.flatten(2).transpose(1, 2)  # [B, N, W]
    cls = tp["cls_token"].view(1, 1, -1).expand(b, 1, arch.width)
    x = torch.cat([cls, x], dim=1)
    x = x + tp["pos_embed"].unsqueeze(0)
    ang = (_oracle_rope_angles(arch.width // arch.heads, gh, gw,
                               arch.ref_feat_hw) if arch.rope else None)
    for blk in tp["blocks"]:
        if arch.post_norm:
            x = x + _oracle_ln(_oracle_attn(x, blk, arch, ang), blk["ln_1"])
            x = x + _oracle_ln(_oracle_mlp(x, blk["mlp"], arch), blk["ln_2"])
        else:
            x = x + _oracle_attn(_oracle_ln(x, blk["ln_1"]), blk, arch, ang)
            x = x + _oracle_mlp(_oracle_ln(x, blk["ln_2"]), blk["mlp"], arch)
    x = _oracle_ln(x, tp["norm"])
    return F.linear(x[:, 0], tp["head_w"], tp["head_b"])


# ---------------------------------------------------------------------------
# parity harness
# ---------------------------------------------------------------------------

def _randomized_params(arch, image_size, embed_dim, seed):
    """init_eva_params but with every zero-init tensor randomized so that
    biases / cls-token bugs can't hide behind zeros."""
    params = tt.init_eva_params(jax.random.PRNGKey(seed), arch, image_size,
                                embed_dim)
    rng = np.random.RandomState(seed + 1)

    def jitter(leaf):
        a = np.asarray(leaf)
        return jnp.asarray(a + rng.randn(*a.shape).astype(a.dtype) * 0.05)

    return jax.tree_util.tree_map(jitter, params)


def _check(arch, image_size=16, embed_dim=12, seed=0, atol=5e-5):
    params = _randomized_params(arch, image_size, embed_dim, seed)
    tp = jax.tree_util.tree_map(_j2t, params)
    img = np.random.RandomState(seed + 7).randn(2, 3, image_size,
                                                image_size).astype(np.float32)
    with torch.no_grad():
        want = oracle_eva_forward(tp, torch.from_numpy(img).double(), arch,
                                  embed_dim).numpy()
    got = np.asarray(tt.eva_forward(params, jnp.asarray(img), arch,
                                    embed_dim=embed_dim))
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)


def test_eva_giant_style_fused_qkv_plain_mlp():
    # eva_giant_patch14_224 lineage: fused qkv, no rope, gelu MLP, pre-norm
    _check(tt.EvaArch(patch=8, width=32, depth=3, heads=4, mlp_hidden=48),
           seed=0)


def test_eva02_style_full_flags():
    # eva02_{base,large}_clip: separate q/k/v (k bias-less), rope w/ ref grid,
    # SwiGLU + inner LN, attention inner LN
    _check(tt.EvaArch(patch=8, width=32, depth=3, heads=4, mlp_hidden=40,
                      swiglu=True, rope=True, scale_mlp=True,
                      scale_attn_inner=True, fused_qkv=False,
                      ref_feat_hw=(16, 16)), seed=1)


def test_eva02_rope_without_ref_grid():
    _check(tt.EvaArch(patch=8, width=32, depth=2, heads=4, mlp_hidden=40,
                      swiglu=True, rope=True, scale_mlp=True,
                      scale_attn_inner=True, fused_qkv=False), seed=2)


def test_eva02_enormous_style_post_norm():
    # eva02_enormous_clip: fused qkv, post-norm residuals
    _check(tt.EvaArch(patch=8, width=32, depth=3, heads=4, mlp_hidden=48,
                      post_norm=True), seed=3)


def test_eva_rope_with_fused_qkv():
    # flag cross: rope on a fused-qkv tower
    _check(tt.EvaArch(patch=8, width=32, depth=2, heads=4, mlp_hidden=48,
                      rope=True, ref_feat_hw=(4, 4)), seed=4)


def test_eva_swiglu_without_inner_norms():
    # flag cross: gated MLP without scale_mlp/scale_attn_inner
    _check(tt.EvaArch(patch=8, width=32, depth=2, heads=4, mlp_hidden=40,
                      swiglu=True, fused_qkv=False), seed=5)


def test_rope_table_matches_oracle_nonsquare():
    """The cached sin/cos tables equal the oracle's complex angles, including
    non-square grids and ref-grid rescale (pair duplication layout)."""
    for gh, gw, ref in [(3, 5, None), (4, 4, (16, 16)), (2, 7, (16, 16))]:
        sin, cos = tt._rope_tables(16, gh, gw, ref)
        ang = _oracle_rope_angles(16, gh, gw, ref).numpy()
        ang2 = np.repeat(ang, 2, axis=-1)  # one angle per (even, odd) pair
        np.testing.assert_allclose(sin, np.sin(ang2), atol=1e-6)
        np.testing.assert_allclose(cos, np.cos(ang2), atol=1e-6)


def test_full_size_eva02_base_config_one_block():
    """The real eva02_base arch table values, truncated to one block, at the
    native 224 grid — catches table/flag mistakes the tiny shapes can't."""
    full = tt.timm_arch("eva02_base_patch16_clip_224")
    arch = tt.EvaArch(patch=full.patch, width=full.width, depth=1,
                      heads=full.heads, mlp_hidden=full.mlp_hidden,
                      swiglu=full.swiglu, rope=full.rope,
                      scale_mlp=full.scale_mlp,
                      scale_attn_inner=full.scale_attn_inner,
                      fused_qkv=full.fused_qkv, ref_feat_hw=full.ref_feat_hw)
    assert (full.swiglu, full.rope, full.scale_mlp, full.scale_attn_inner,
            full.fused_qkv) == (True, True, True, True, False)
    assert full.mlp_hidden == int(768 * 8 / 3) and full.ref_feat_hw == (16, 16)
    _check(arch, image_size=224, embed_dim=512, seed=6, atol=2e-4)
