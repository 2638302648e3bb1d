"""Multi-device tests on the 8-virtual-CPU mesh: tp/dp sharded training step,
collective losses, sharded inference, metric psum."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rs_ov.core.config import CLIPConfig, TextConfig, VisionConfig
from rs_ov.core.params import init_clip_params
from rs_ov.parallel.mesh import make_mesh
from rs_ov.parallel.sharding import shard_params
from rs_ov.train.losses import clip_loss, siglip_loss
from rs_ov.train.step import encode_image_train, encode_text_train, make_clip_train_step

TINY2 = CLIPConfig(
    embed_dim=32,
    vision=VisionConfig(image_size=64, patch_size=16, width=64, layers=2,
                        output_dim=32, head_width=32),
    text=TextConfig(context_length=77, vocab_size=49408, width=32, heads=2,
                    layers=1, output_dim=32),
)

TINY = CLIPConfig(
    embed_dim=32,
    vision=VisionConfig(image_size=32, patch_size=16, width=64, layers=2,
                        output_dim=32, head_width=32),
    text=TextConfig(context_length=16, vocab_size=128, width=32, heads=2,
                    layers=2, output_dim=32),
)


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_clip_loss_gather_matches_global():
    """all_gather formulation under shard_map == global formulation."""
    from jax.experimental.shard_map import shard_map

    mesh = make_mesh(data=8, model=1)
    rng = np.random.RandomState(0)
    img = rng.randn(16, 8).astype(np.float32)
    txt = rng.randn(16, 8).astype(np.float32)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    scale = jnp.asarray(10.0)

    global_loss = clip_loss(jnp.asarray(img), jnp.asarray(txt), scale)

    def local_fn(i, t):
        return clip_loss(i, t, scale, axis_name="data")[None]

    sharded = shard_map(local_fn, mesh=mesh,
                        in_specs=(P("data"), P("data")), out_specs=P("data"))
    per_dev = sharded(jnp.asarray(img), jnp.asarray(txt))
    np.testing.assert_allclose(np.asarray(per_dev), float(global_loss),
                               atol=1e-5, rtol=1e-5)


def test_siglip_ring_matches_global():
    """ppermute ring == single-device loss on the concatenated batch."""
    from jax.experimental.shard_map import shard_map

    mesh = make_mesh(data=8, model=1)
    rng = np.random.RandomState(1)
    img = rng.randn(16, 8).astype(np.float32)
    txt = rng.randn(16, 8).astype(np.float32)
    scale, bias = jnp.asarray(5.0), jnp.asarray(-2.0)

    def local_fn(i, t):
        return siglip_loss(i, t, scale, bias, axis_name="data")[None]

    sharded = shard_map(local_fn, mesh=mesh,
                        in_specs=(P("data"), P("data")), out_specs=P("data"))
    per_dev = np.asarray(sharded(jnp.asarray(img), jnp.asarray(txt)))

    # oracle: full pairwise matrix; per-shard loss sums its 2-row block over
    # ALL texts (diag labels on own block, negatives elsewhere), /local_b
    logits = 5.0 * img @ txt.T - 2.0
    labels = 2.0 * np.eye(16) - 1.0
    full = np.logaddexp(0.0, -labels * logits)  # softplus(-l*x)
    for d in range(8):
        rows = slice(2 * d, 2 * d + 2)
        expect = full[rows].sum() / 2.0
        np.testing.assert_allclose(per_dev[d], expect, rtol=1e-5)


def test_sharded_train_step_runs_and_matches_single_device():
    mesh = make_mesh(data=4, model=2)
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    step, init_opt = make_clip_train_step(TINY, mesh)
    import optax
    opt_state = init_opt(params)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))
    texts = np.zeros((8, 16), np.int32)
    for i in range(8):
        n = rng.randint(3, 16)
        texts[i, :n] = rng.randint(1, 127, size=n)
        texts[i, n - 1] = 127
    texts = jnp.asarray(texts)

    sharded_params = shard_params(params, mesh)
    new_params, _, loss = step(sharded_params, opt_state, images, texts)

    # single-device oracle
    def loss_fn(p):
        img_f = encode_image_train(p, images, TINY, remat=False)
        txt_f = encode_text_train(p, texts, TINY, remat=False)
        return clip_loss(img_f, txt_f, jnp.exp(p["logit_scale"]))

    expect = loss_fn(params)
    np.testing.assert_allclose(float(loss), float(expect), atol=1e-4, rtol=1e-4)
    # params actually moved
    assert not np.allclose(np.asarray(new_params["visual"]["proj"]),
                           np.asarray(params["visual"]["proj"]))


def test_sharded_inference_matches_single_device():
    """Tile batch sharded over 'data' reproduces unsharded predictions."""
    from rs_ov.core.params import init_vision_params
    from rs_ov.nn.vit import VitCallConfig, vit_forward

    vcfg = TINY.vision
    params = init_vision_params(jax.random.PRNGKey(1), vcfg)
    call = VitCallConfig(model_type="Experimental", ignore_residual=True,
                         output_cls_token=True,
                         apply_similarity_enhancement=True,
                         apply_outlier_suppression=True, outlier_top_k=2)
    tiles = jnp.asarray(np.random.RandomState(2).randn(8, 3, 32, 32)
                        .astype(np.float32))

    pooled_ref, tokens_ref = vit_forward(params, tiles, vcfg, call)

    mesh = make_mesh(data=8, model=1)
    sharded_tiles = jax.device_put(tiles, NamedSharding(mesh, P("data")))
    fn = jax.jit(lambda p, x: vit_forward(p, x, vcfg, call))
    pooled, tokens = fn(params, sharded_tiles)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(pooled_ref),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tokens), np.asarray(tokens_ref),
                               atol=1e-5, rtol=1e-4)


def test_metric_psum_reduction():
    """Confusion-state reduction over the mesh == host-side sum."""
    from jax.experimental.shard_map import shard_map
    from rs_ov.evalsuite.metrics import IoUMetric, confusion_update

    mesh = make_mesh(data=8, model=1)
    rng = np.random.RandomState(3)
    states = np.stack([
        confusion_update(rng.randint(0, 4, 100), rng.randint(0, 4, 100), 4)
        for _ in range(8)
    ]).astype(np.float32)

    def reduce_fn(s):
        return jax.lax.psum(s, "data")

    reduced = shard_map(reduce_fn, mesh=mesh, in_specs=P("data"),
                        out_specs=P())(jnp.asarray(states))
    np.testing.assert_allclose(np.asarray(reduced)[0], states.sum(0), rtol=1e-6)

    m = IoUMetric(4)
    m.merge(states.sum(0))
    r = m.compute()
    assert 0 <= r["mIoU"] <= 100


def test_segmentor_mesh_tile_sharding(tmp_path):
    """SegmentorEx(mesh=...) shards tiles over 'data'; predictions match the
    meshless run exactly."""
    from rs_ov.pipeline.segmentor import SegmentorEx

    cls = tmp_path / "cls.txt"
    cls.write_text("background\nbuilding")
    kwargs = dict(clip_type="CLIP", vit_type="ViT-B/16",
                  model_type="Experimental", name_path=str(cls),
                  clip_config=TINY2, param_dtype=jnp.float32,
                  apply_similarity_enhancement=True,
                  apply_outlier_suppression=True,
                  outlier_suppression_cfg={"top_k": 3},
                  slide_stride=32, slide_crop=64, seed=7)
    img = np.random.RandomState(0).randn(1, 3, 96, 96).astype(np.float32)
    meta = [{"ori_shape": (96, 96)}]

    base = SegmentorEx(**kwargs)
    ref = np.asarray(base.predict(img, meta)[0]["seg_logits"])

    mesh = make_mesh(data=8, model=1)
    sharded = SegmentorEx(mesh=mesh, **kwargs)
    got = np.asarray(sharded.predict(img, meta)[0]["seg_logits"])
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)


def test_train_loop_checkpoint_resume(tmp_path):
    """Loop runs, checkpoints, and resumes from the newest checkpoint."""
    from rs_ov.train.loop import latest_checkpoint, train_loop
    from rs_ov.train.step import make_clip_train_step

    mesh = make_mesh(data=4, model=2)
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    params = shard_params(params, mesh)
    step, init_opt = make_clip_train_step(TINY, mesh)
    opt_state = init_opt(params)

    rng = np.random.RandomState(0)

    def data_iter():
        while True:
            images = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))
            texts = np.zeros((8, 16), np.int32)
            for i in range(8):
                n = rng.randint(3, 16)
                texts[i, :n] = rng.randint(1, 127, size=n)
                texts[i, n - 1] = 127
            yield images, jnp.asarray(texts)

    ckpt_dir = str(tmp_path / "ckpts")
    params2, opt_state, hist = train_loop(
        step, params, opt_state, data_iter(), num_steps=3,
        ckpt_dir=ckpt_dir, ckpt_every=2, log_every=1)
    assert latest_checkpoint(ckpt_dir).endswith("step_3.npz")
    assert len(hist) == 3 and all(np.isfinite(h["loss"]) for h in hist)

    # resume: starts from step 3, runs to 5
    params3, _, hist2 = train_loop(
        step, params, opt_state, data_iter(), num_steps=5,
        ckpt_dir=ckpt_dir, ckpt_every=10, log_every=1)
    assert hist2[0]["step"] == 4


def test_mixed_precision_train_step():
    """bf16 compute_dtype: loss decreases on a fixed batch, master params
    stay fp32, and the first-step loss matches the fp32 step closely."""
    mesh = make_mesh(data=4, model=2)
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    step32, init_opt = make_clip_train_step(TINY, mesh)
    step16, _ = make_clip_train_step(TINY, mesh, compute_dtype=jnp.bfloat16)

    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))
    texts = np.zeros((8, 16), np.int32)
    for i in range(8):
        texts[i, :5] = rng.randint(1, 127, size=5)
        texts[i, 4] = 127
    texts = jnp.asarray(texts)

    sharded = shard_params(params, mesh)
    p32, o32, l32 = step32(sharded, init_opt(params), images, texts)
    p16, o16, l16 = step16(sharded, init_opt(params), images, texts)
    assert abs(float(l32) - float(l16)) < 0.05 * max(1.0, abs(float(l32)))

    # master params remain fp32 and keep moving; loss goes down
    assert p16["visual"]["proj"].dtype == jnp.float32
    losses = [float(l16)]
    for _ in range(4):
        p16, o16, l16 = step16(p16, o16, images, texts)
        losses.append(float(l16))
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("loss_name", ["clip", "siglip"])
def test_grad_accumulation_matches_full_batch(loss_name):
    """accum_steps=2 (feature-cache + per-micro regrad, open_clip
    --accum-freq semantics) must produce the SAME optimizer step as the
    plain full-batch step — including logit_scale/logit_bias, whose grad
    path is gated to micro-step 0 so it isn't counted twice."""
    import optax

    mesh = make_mesh(data=4, model=2)
    params = init_clip_params(jax.random.PRNGKey(1), TINY)
    if loss_name == "siglip":
        params = dict(params, logit_bias=jnp.asarray(-2.0, jnp.float32))
    # sgd(1.0): updated params = params - grads, so the assert compares RAW
    # gradients (adam would amplify fp32 summation-order noise on ~0 grads
    # into sign-level update differences)
    opt = optax.sgd(1.0)
    step1, init_opt = make_clip_train_step(TINY, mesh, optimizer=opt,
                                           loss=loss_name)
    step2, _ = make_clip_train_step(TINY, mesh, optimizer=opt,
                                    loss=loss_name, accum_steps=2)

    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))
    texts = np.zeros((8, 16), np.int32)
    for i in range(8):
        n = rng.randint(3, 16)
        texts[i, :n] = rng.randint(1, 127, size=n)
        texts[i, n - 1] = 127
    texts = jnp.asarray(texts)

    sp = shard_params(params, mesh)
    p1, _, l1 = step1(sp, init_opt(params), images, texts)
    p2, _, l2 = step2(sp, init_opt(params), images, texts)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5, atol=1e-6)
    g1 = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b), params, p1)
    g2 = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b), params, p2)
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(g2)}
    for k, v1 in jax.tree_util.tree_leaves_with_path(g1):
        np.testing.assert_allclose(
            v1, flat2[jax.tree_util.keystr(k)], rtol=1e-4, atol=1e-6,
            err_msg=f"grad {jax.tree_util.keystr(k)} diverged under accum")


def test_coca_train_step_runs_and_learns():
    """dp-sharded CoCa step: contrastive+caption loss finite, params move,
    and the loss decreases over a few steps on a fixed batch."""
    import optax

    from rs_ov.nn.coca import CoCaConfig, MultimodalConfig, init_coca_params
    from rs_ov.train.step import make_coca_train_step

    cfg = CoCaConfig(
        embed_dim=16,
        vision=VisionConfig(image_size=32, patch_size=16, width=24, layers=2,
                            output_dim=16, head_width=12),
        text=TextConfig(context_length=12, vocab_size=64, width=16, heads=2,
                        layers=2, output_dim=16, pool_type="last"),
        multimodal=MultimodalConfig(context_length=12, vocab_size=64,
                                    width=16, heads=2, layers=2),
        attn_pooler_queries=8, attn_pooler_heads=2,
    )
    mesh = make_mesh(data=8, model=1)
    params = init_coca_params(jax.random.PRNGKey(0), cfg)
    step, init_opt = make_coca_train_step(cfg, mesh,
                                          optimizer=optax.adam(3e-3))
    opt_state = init_opt(params)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(8, 3, 32, 32).astype(np.float32))
    texts = np.zeros((8, 12), np.int32)
    for i in range(8):
        n = rng.randint(4, 12)
        texts[i, :n] = rng.randint(1, 63, size=n)
    texts = jnp.asarray(texts)

    first = None
    for _ in range(5):
        params, opt_state, (con, cap) = step(params, opt_state, images, texts)
        total = float(con) + float(cap)
        assert np.isfinite(total)
        if first is None:
            first = total
    assert total < first, (first, total)
