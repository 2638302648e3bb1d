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
