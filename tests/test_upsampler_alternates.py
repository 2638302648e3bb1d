"""Alternate upsamplers vs the reference torch modules."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ref_shim import load_reference_module


def test_resize_conv_parity():
    from rs_ov.upsample.alternates import resize_conv_forward

    ups = load_reference_module("upsamplers")
    torch.manual_seed(0)
    ref = ups.LayeredResizeConv(16, 1)
    ref.eval()
    sd = ref.state_dict()
    params = {"convs": [
        {"w": jnp.asarray(sd[f"conv{i}.weight"].numpy()),
         "b": jnp.asarray(sd[f"conv{i}.bias"].numpy())}
        for i in (1, 2, 3, 4)
    ]}
    rng = np.random.RandomState(1)
    src = rng.randn(1, 16, 4, 4).astype(np.float32)
    g = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        expect = ref(torch.from_numpy(src), torch.from_numpy(g)).numpy()
    got = np.asarray(resize_conv_forward(params, jnp.asarray(src), jnp.asarray(g)))
    np.testing.assert_allclose(got, expect, atol=1e-4, rtol=1e-3)


def test_ifa_parity():
    from rs_ov.upsample.alternates import ifa_forward

    ups = load_reference_module("upsamplers")
    torch.manual_seed(1)
    ref = ups.IFA(8, num_scales=20)
    ref.eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.add_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.add_(torch.rand_like(m.running_var) * 0.3)
    sd = ref.state_dict()
    params = {
        "w0": jnp.asarray(sd["mlp.0.weight"].numpy()),
        "b0": jnp.asarray(sd["mlp.0.bias"].numpy()),
        "bn": {"scale": jnp.asarray(sd["mlp.1.weight"].numpy()),
               "bias": jnp.asarray(sd["mlp.1.bias"].numpy()),
               "mean": jnp.asarray(sd["mlp.1.running_mean"].numpy()),
               "var": jnp.asarray(sd["mlp.1.running_var"].numpy())},
        "w1": jnp.asarray(sd["mlp.3.weight"].numpy()),
        "b1": jnp.asarray(sd["mlp.3.bias"].numpy()),
    }
    rng = np.random.RandomState(2)
    src = rng.randn(1, 8, 6, 6).astype(np.float32)
    g = rng.rand(1, 3, 12, 12).astype(np.float32)
    with torch.no_grad():
        expect = ref(torch.from_numpy(src), torch.from_numpy(g)).numpy()
    got = np.asarray(ifa_forward(params, jnp.asarray(src), jnp.asarray(g)))
    # the featurizer's sin/cos run at phases up to ~2e4 where fp32 sine is
    # ULP-chaotic (ours is evaluated in f64 — strictly more accurate than the
    # reference) — tolerate the resulting small divergence
    np.testing.assert_allclose(got, expect, atol=3e-2, rtol=3e-2)


def test_carafe_reassemble_oracle():
    """CARAFE reassembly vs a direct numpy oracle of the op's definition."""
    from rs_ov.upsample.alternates import carafe_reassemble

    rng = np.random.RandomState(3)
    b, c, h, w, scale, k = 1, 4, 5, 6, 2, 3
    x = rng.randn(b, c, h, w).astype(np.float32)
    masks = rng.rand(b, k * k, h * scale, w * scale).astype(np.float32)
    masks /= masks.sum(axis=1, keepdims=True)

    got = np.asarray(carafe_reassemble(jnp.asarray(x), jnp.asarray(masks),
                                       scale, k))
    r = k // 2
    xp = np.pad(x, ((0, 0), (0, 0), (r, r), (r, r)))
    expect = np.zeros((b, c, h * scale, w * scale), np.float32)
    for i in range(h * scale):
        for j in range(w * scale):
            si, sj = i // scale, j // scale
            for p in range(k):
                for q in range(k):
                    expect[:, :, i, j] += (masks[:, p * k + q, i, j][:, None]
                                           * xp[:, :, si + p, sj + q])
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_carafe_forward_shapes():
    import jax

    from rs_ov.upsample.alternates import carafe_forward, init_carafe_params

    params = init_carafe_params(jax.random.PRNGKey(0), dim=8, compressed=16)
    src = np.random.RandomState(4).randn(1, 8, 4, 4).astype(np.float32)
    out = carafe_forward(params, jnp.asarray(src), None)
    assert out.shape == (1, 8, 64, 64)  # 16x total
    # masks are softmaxed -> output magnitudes bounded by local maxima
    assert np.isfinite(np.asarray(out)).all()


def _torch_sapa_sim(q, k, kernel, scale):
    """torch-unfold oracle of the external `sapa.sim` op (zero-pad window
    dot products; tap order (ky, kx) = F.unfold channel-block order)."""
    import torch.nn.functional as F

    b, hh, wh, e = q.shape
    _, hl, wl, _ = k.shape
    kw = F.unfold(k.permute(0, 3, 1, 2), kernel, padding=kernel // 2)
    kw = kw.reshape(b, e, kernel * kernel, hl, wl)
    kw = kw.repeat_interleave(scale, dim=3).repeat_interleave(scale, dim=4)
    return torch.einsum("bhwe,bethw->bhwt", q, kw)


def _torch_sapa_atn(attn, v, kernel, scale):
    import torch.nn.functional as F

    b, hl, wl, c = v.shape
    vw = F.unfold(v.permute(0, 3, 1, 2), kernel, padding=kernel // 2)
    vw = vw.reshape(b, c, kernel * kernel, hl, wl)
    vw = vw.repeat_interleave(scale, dim=3).repeat_interleave(scale, dim=4)
    return torch.einsum("bhwt,bcthw->bhwc", attn, vw)


def test_sapa_parity():
    """sapa_forward vs the reference SAPAUpsampler run with its own torch
    modules + an unfold oracle standing in for the external sapa CUDA ops
    (reference upsamplers.py:103-118 forward, :137-156 stack)."""
    from rs_ov.upsample.alternates import sapa_forward

    # SAPAModule._init_weights imports timm only for trunc_normal_ (absent
    # in this image) — provide torch's identical initialiser under that name
    import sys
    import types
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_layers = types.ModuleType("timm.models.layers")
        timm_layers.trunc_normal_ = torch.nn.init.trunc_normal_
        timm.models = timm_models
        timm_models.layers = timm_layers
        sys.modules.update({"timm": timm, "timm.models": timm_models,
                            "timm.models.layers": timm_layers})

    ups = load_reference_module("upsamplers")
    torch.manual_seed(5)
    ref = ups.SAPAUpsampler(dim_x=8)
    ref.eval()
    sd = ref.state_dict()
    params = {"stages": [
        {"norm_y": {"scale": jnp.asarray(sd[f"up{i}.norm_y.weight"].numpy()),
                    "bias": jnp.asarray(sd[f"up{i}.norm_y.bias"].numpy())},
         "norm_x": {"scale": jnp.asarray(sd[f"up{i}.norm_x.weight"].numpy()),
                    "bias": jnp.asarray(sd[f"up{i}.norm_x.bias"].numpy())},
         "q_w": jnp.asarray(sd[f"up{i}.q.weight"].numpy()),
         "q_b": jnp.asarray(sd[f"up{i}.q.bias"].numpy()),
         "k_w": jnp.asarray(sd[f"up{i}.k.weight"].numpy()),
         "k_b": jnp.asarray(sd[f"up{i}.k.bias"].numpy())}
        for i in (1, 2, 3, 4)
    ]}

    def module_forward(mod, y, x):
        y = y.permute(0, 2, 3, 1)
        x = x.permute(0, 2, 3, 1)
        y = mod.norm_y(y)
        x_n = mod.norm_x(x)
        q, k = mod.q(y), mod.k(x_n)
        attn = torch.softmax(_torch_sapa_sim(q, k, 5, 2), dim=-1)
        return _torch_sapa_atn(attn, x, 5, 2).permute(0, 3, 1, 2)

    rng = np.random.RandomState(6)
    src = rng.randn(1, 8, 4, 4).astype(np.float32)
    g = rng.rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(src)
        gt = torch.from_numpy(g)
        for i, mod in enumerate([ref.up1, ref.up2, ref.up3, ref.up4]):
            x = module_forward(mod, ref.adapt_guidance(x, gt), x)
        expect = x.numpy()
    got = np.asarray(sapa_forward(params, jnp.asarray(src), jnp.asarray(g)))
    assert got.shape == expect.shape == (1, 8, 64, 64)
    np.testing.assert_allclose(got, expect, atol=1e-4, rtol=1e-3)
