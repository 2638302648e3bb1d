"""ModifiedResNet tower + CoCa/Distill loss parity vs reference."""

import numpy as np
import torch

import jax.numpy as jnp

from ref_shim import load_reference_module


def test_modified_resnet_parity():
    from rs_ov.nn.modified_resnet import (ModifiedResNetConfig,
                                          modified_resnet_forward,
                                          resnet_params_from_state_dict)

    mrn = load_reference_module("modified_resnet")
    torch.manual_seed(0)
    ref = mrn.ModifiedResNet(layers=(1, 1, 1, 1), output_dim=32, heads=2,
                             image_size=32, width=16)
    ref.eval()
    # give BN running stats non-trivial values
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.add_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.add_(torch.rand_like(m.running_var) * 0.5)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = resnet_params_from_state_dict(sd)
    cfg = ModifiedResNetConfig(layers=(1, 1, 1, 1), output_dim=32, heads=2,
                               image_size=32, width=16)
    img = np.random.RandomState(1).randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        expect = ref(torch.from_numpy(img)).numpy()
    got = np.asarray(modified_resnet_forward(params, jnp.asarray(img), cfg))
    np.testing.assert_allclose(got, expect, atol=2e-4, rtol=2e-3)


def test_coca_loss_parity():
    from rs_ov.train.losses import coca_loss

    loss_mod = load_reference_module("loss")
    rng = np.random.RandomState(0)
    b, d, l, v = 6, 8, 10, 20
    img = rng.randn(b, d).astype(np.float32)
    txt = rng.randn(b, d).astype(np.float32)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    logits = rng.randn(b, l, v).astype(np.float32)
    labels = rng.randint(0, v, size=(b, l))
    labels[0, 7:] = 0  # pad

    ref = loss_mod.CoCaLoss(caption_loss_weight=2.0, clip_loss_weight=1.0, pad_id=0)
    with torch.no_grad():
        c_ref, cap_ref = ref(torch.from_numpy(img), torch.from_numpy(txt),
                             torch.from_numpy(logits), torch.from_numpy(labels),
                             torch.tensor(10.0))
    c, cap = coca_loss(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(logits),
                       jnp.asarray(labels), jnp.asarray(10.0),
                       caption_weight=2.0, clip_weight=1.0)
    np.testing.assert_allclose(float(c), float(c_ref), rtol=1e-5)
    np.testing.assert_allclose(float(cap), float(cap_ref), rtol=1e-5)


def test_distill_clip_loss_parity():
    from rs_ov.train.losses import distill_clip_loss

    loss_mod = load_reference_module("loss")
    rng = np.random.RandomState(1)
    b, d = 6, 8

    def unit(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    img, txt = unit(rng.randn(b, d)).astype(np.float32), unit(rng.randn(b, d)).astype(np.float32)
    dimg, dtxt = unit(rng.randn(b, d)).astype(np.float32), unit(rng.randn(b, d)).astype(np.float32)

    ref = loss_mod.DistillClipLoss()
    with torch.no_grad():
        c_ref, d_ref = ref(torch.from_numpy(img), torch.from_numpy(txt),
                           torch.tensor(10.0), torch.from_numpy(dimg),
                           torch.from_numpy(dtxt), torch.tensor(8.0))
    c, dist = distill_clip_loss(jnp.asarray(img), jnp.asarray(txt),
                                jnp.asarray(10.0), jnp.asarray(dimg),
                                jnp.asarray(dtxt), jnp.asarray(8.0))
    np.testing.assert_allclose(float(c), float(c_ref), rtol=1e-5)
    np.testing.assert_allclose(float(dist), float(d_ref), rtol=1e-5)
