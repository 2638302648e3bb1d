"""Golden parity: rs_ov JBU upsampler vs reference SimFeatUp modules."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ref_shim import load_reference_module
from rs_ov.core.checkpoint import jbu_params_from_state_dict
from rs_ov.upsample.jbu import adaptive_conv, jbu_one_forward, jbu_stack_forward, unfold


@pytest.fixture(scope="module")
def ref_ups():
    mod = load_reference_module("upsamplers")

    class _AdaptiveConvShim:
        @staticmethod
        def apply(inp, filt):
            return mod.adaptive_conv_py_simple(inp, filt)

    mod.AdaptiveConv = _AdaptiveConvShim
    return mod


def test_unfold_matches_torch():
    x = np.random.RandomState(0).randn(2, 5, 12, 12).astype(np.float32)
    k = 3
    ref = torch.nn.Unfold(k)(torch.from_numpy(x)).view(2, 5, k * k, 10, 10).numpy()
    got = np.asarray(unfold(jnp.asarray(x), k))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_adaptive_conv_matches_reference(ref_ups):
    rng = np.random.RandomState(1)
    inp = rng.randn(1, 8, 20, 20).astype(np.float32)
    filt = rng.rand(1, 14, 14, 7, 7).astype(np.float32)
    ref = ref_ups.adaptive_conv_py_simple(torch.from_numpy(inp),
                                          torch.from_numpy(filt)).numpy()
    got = np.asarray(adaptive_conv(jnp.asarray(inp), jnp.asarray(filt)))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("name", ["jbu_one", "jbu_stack"])
def test_jbu_parity(ref_ups, name):
    torch.manual_seed(0)
    feat_dim = 16
    ref = (ref_ups.JBUOne if name == "jbu_one" else ref_ups.JBUStack)(feat_dim)
    # randomize learned scalars so defaults can't mask bugs
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jbu_params_from_state_dict(sd, name, strip_prefix="")

    rng = np.random.RandomState(3)
    source = rng.randn(1, feat_dim, 4, 4).astype(np.float32)
    guidance = rng.rand(1, 3, 64, 64).astype(np.float32)

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(source), torch.from_numpy(guidance)).numpy()
    fwd = jbu_one_forward if name == "jbu_one" else jbu_stack_forward
    got = np.asarray(fwd(params, jnp.asarray(source), jnp.asarray(guidance)))
    assert got.shape == ref_out.shape == (1, feat_dim, 64, 64)
    np.testing.assert_allclose(got, ref_out, atol=5e-4, rtol=5e-3)
