#!/usr/bin/env python
"""BLIP training CLI on a TPU mesh — the reference's vendored train scripts'
role (reference BLIP/{train_retrieval,train_caption,train_vqa,train_nlvr,
pretrain}.py) over rs_ov's BLIP training stack.

Tasks:
  retrieval  ITC (momentum encoders + feature queue) + hard-negative ITM
             (train/blip_retrieval.py — reference blip_retrieval.py)
  pretrain   retrieval + caption LM through the weight-tied MED decoder
             (train/blip_pretrain.py — reference blip_pretrain.py)
  caption    image-conditioned LM loss (nn/blip_lm.blip_caption_loss —
             reference blip.py BLIP_Decoder / train_caption.py)
  vqa        question-grounded answer LM loss (nn/blip_lm.blip_vqa_loss —
             reference blip_vqa.py / train_vqa.py)
  nlvr       two-image entailment CE (nn/blip_lm.blip_nlvr_forward —
             reference blip_nlvr.py / train_nlvr.py)

Data: `--data <manifest>` of (image_path, caption) pairs (same formats as
train.py) for retrieval/pretrain/caption with `--vocab <bert vocab.txt>`
for WordPiece tokenization; `--synthetic` trains every task on random
batches (smoke / throughput — this zero-egress image ships no BLIP data).

Examples:
  python train_blip.py --task pretrain --tiny --synthetic --steps 4 \\
      --batch-size 8 --mesh 1,1
  python train_blip.py --task retrieval --data pairs.tsv --vocab vocab.txt \\
      --steps 1000 --batch-size 64 --mesh 4,1
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

TASKS = ("retrieval", "pretrain", "caption", "vqa", "nlvr")


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--task", choices=TASKS, default="retrieval")
    ap.add_argument("--vit", choices=("base", "large"), default="base",
                    help="BLIP vision tower size (reference create_vit)")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--pretrained", default=None,
                    help="BLIP .pth checkpoint to start from")
    ap.add_argument("--data", default=None,
                    help="(image, caption) manifest — see train.py formats")
    ap.add_argument("--vocab", default=None,
                    help="BERT vocab.txt for WordPiece tokenization")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--augment", action="store_true",
                    help="RandomAugment(2, 5) on manifest images (the "
                         "reference BLIP train pipelines' transform)")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--context-length", type=int, default=30)
    ap.add_argument("--queue-size", type=int, default=None,
                    help="retrieval/pretrain feature queue (default 16x "
                         "batch; reference 57600)")
    ap.add_argument("--alpha", type=float, default=0.4,
                    help="soft-target momentum-distillation weight, ramped "
                         "over --warmup steps (reference train scripts)")
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--wd", type=float, default=0.05)
    ap.add_argument("--warmup", type=int, default=200)
    ap.add_argument("--precision", choices=("fp32", "bf16"), default="bf16")
    ap.add_argument("--mesh", default="",
                    help="'DP,TP' mesh shape (default: all devices on data)")
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--evaluate", action="store_true",
                    help="retrieval only: skip training and run the ITC->ITM "
                         "rerank evaluation + recall@K (the reference "
                         "train_retrieval.py --evaluate mode)")
    ap.add_argument("--k-test", type=int, default=16,
                    help="ITM rerank shortlist size (reference k_test)")
    ap.add_argument("--eval-samples", type=int, default=64,
                    help="--evaluate set size (manifest rows or synthetic)")
    ap.add_argument("--tiny", action="store_true",
                    help="shrink the arch to a debug size (smoke tests)")
    return ap.parse_args(argv)


def _blip_cfg(args):
    import jax.numpy as jnp  # noqa: F401

    from rs_ov.nn.bert import BertConfig
    from rs_ov.nn.blip import BlipConfig

    cfg = (BlipConfig.large(args.image_size) if args.vit == "large"
           else BlipConfig.base(args.image_size))
    if args.tiny:
        cfg = BlipConfig(
            vision=dataclasses.replace(cfg.vision, image_size=32,
                                       patch_size=16, width=64, layers=2,
                                       heads=2),
            text=BertConfig(vocab_size=64, hidden_size=64, num_layers=2,
                            num_heads=2, intermediate_size=128,
                            max_position_embeddings=32),
            embed_dim=32)
    return cfg


def _tokenizer(args):
    if args.vocab:
        from rs_ov.text.wordpiece import WordPieceTokenizer

        return WordPieceTokenizer(args.vocab)
    sys.exit("--data needs --vocab <bert vocab.txt> for tokenization")


def _special_token_ids(args):
    """(bos, enc) token ids. Literals only for the tokenizer-free synthetic
    path (tiny-vocab stand-ins / the bert-base 30522-line vocab the
    reference appends [DEC]/[ENC] to, BLIP/models/blip.py:188-193); any
    real --data run derives them from its own vocab — a hardcoded 30523
    against a different vocab would silently gather bogus [ENC] embeddings
    (JAX clamps out-of-range indices)."""
    if args.synthetic:
        return (2, 3) if args.tiny else (30522, 30523)
    tok = _tokenizer(args)
    return tok.bos_token_id, tok.enc_token_id


def _synth_batches(args, cfg, rng):
    """Random host batches shaped per task."""
    b, s, ln = args.batch_size, cfg.vision.image_size, args.context_length
    v = cfg.text.vocab_size
    bos, enc = 2, 3  # stand-ins within the tiny vocab
    step = 0
    while True:
        imgs = rng.randn(b, 3, s, s).astype(np.float32)
        ids = rng.randint(4, v, size=(b, ln)).astype(np.int32)
        mask = np.ones((b, ln), np.int32)
        if args.task in ("retrieval", "pretrain"):
            yield {"images": imgs, "ids": ids, "mask": mask,
                   "idx": (np.arange(b) + step * b).astype(np.int32)}
        elif args.task == "caption":
            ids[:, 0] = bos
            yield {"images": imgs, "ids": ids, "mask": mask}
        elif args.task == "vqa":
            a_ids = rng.randint(4, v, size=(b, ln)).astype(np.int32)
            a_ids[:, 0] = bos
            ids[:, 0] = enc
            yield {"images": imgs, "ids": ids, "mask": mask,
                   "a_ids": a_ids, "a_mask": mask.copy(),
                   "a2q": np.arange(b, dtype=np.int32),
                   "w": np.ones((b,), np.float32)}
        else:  # nlvr — two scenes per text
            ids[:, 0] = enc
            yield {"images": rng.randn(2 * b, 3, s, s).astype(np.float32),
                   "ids": ids, "mask": mask,
                   "targets": rng.randint(0, 2, size=(b,)).astype(np.int32)}
        step += 1


def _pair_batches(args, cfg, rng):
    """(image, caption) manifest batches for retrieval/pretrain/caption."""
    from train import _read_manifest

    from rs_ov.data.transforms import load_image
    from rs_ov.utils.resize import resize_bicubic

    import jax.numpy as jnp

    tok = _tokenizer(args)
    pairs = _read_manifest(args.data)
    if not pairs:
        sys.exit(f"no (image, caption) pairs in {args.data}")
    print(f"[train_blip] {len(pairs)} image-text pairs", flush=True)
    aug = None
    if args.augment:
        from rs_ov.data.randaugment import RandomAugment

        # the reference train scripts' recipe: RandomAugment(2, 5, augs=[...])
        aug = RandomAugment(2, 5, isPIL=True,
                            augs=["Identity", "AutoContrast", "Brightness",
                                  "Sharpness", "Equalize", "ShearX",
                                  "ShearY", "TranslateX", "TranslateY",
                                  "Rotate"], seed=args.seed)
    mean = np.asarray((0.48145466, 0.4578275, 0.40821073), np.float32)
    std = np.asarray((0.26862954, 0.26130258, 0.27577711), np.float32)
    s = cfg.vision.image_size
    b = args.batch_size
    order = rng.permutation(len(pairs))
    i, step = 0, 0
    while True:
        imgs, caps, gids = [], [], []
        for _ in range(b):
            gid = int(order[i])
            img_path, cap = pairs[gid]
            raw = load_image(img_path)
            if aug is not None:
                raw = aug(raw)
            x = np.asarray(raw, np.float32) / 255.0
            x = np.asarray(resize_bicubic(jnp.asarray(x.transpose(2, 0, 1)),
                                          (s, s)))
            imgs.append((x - mean[:, None, None]) / std[:, None, None])
            caps.append(cap)
            gids.append(gid)
            i += 1
            if i == len(pairs):
                order = rng.permutation(len(pairs))
                i = 0
        t = tok(caps, max_length=args.context_length)
        batch = {"images": np.stack(imgs), "ids": t["input_ids"],
                 "mask": t["attention_mask"],
                 "idx": np.asarray(gids, np.int32)}
        if args.task == "caption":
            batch["ids"] = batch["ids"].copy()
            batch["ids"][:, 0] = tok.bos_token_id
            del batch["idx"]
        yield batch
        step += 1


def _run_retrieval_eval(args, cfg, params, rng):
    """The reference train_retrieval.py --evaluate flow: evaluation() ->
    itm_eval() -> metrics JSON (reference :289-302), on synthetic pairs or
    the --data manifest (i-th image <-> i-th caption)."""
    from rs_ov.evalsuite.retrieval import blip_retrieval_evaluation

    n = max(args.eval_samples, args.k_test)
    if args.synthetic:
        s = cfg.vision.image_size
        images = rng.randn(n, 3, s, s).astype(np.float32)
        ids = rng.randint(4, cfg.text.vocab_size,
                          (n, args.context_length)).astype(np.int32)
        mask = np.ones_like(ids)
    else:
        imgs, idss, masks, got = [], [], [], 0
        for batch in _pair_batches(args, cfg, rng):
            imgs.append(batch["images"])
            idss.append(batch["ids"])
            masks.append(batch["mask"])
            got += len(batch["images"])
            if got >= n:
                break
        images = np.concatenate(imgs)[:n]
        ids = np.concatenate(idss)[:n].astype(np.int32)
        mask = np.concatenate(masks)[:n].astype(np.int32)
    m = blip_retrieval_evaluation(
        params, cfg, images, ids, mask, _special_token_ids(args)[1],
        txt2img=list(range(len(images))),
        img2txt=[[i] for i in range(len(images))], k_test=args.k_test,
        log=lambda s: print(f"[eval] {s}", flush=True))
    print(json.dumps({k: round(v, 3) for k, v in m.items()}))
    return m


def main(argv=None):
    args = parse_args(argv)
    if not args.synthetic and not args.data:
        sys.exit("pass --data <manifest-or-dir> or --synthetic")
    if args.evaluate and args.task != "retrieval":
        sys.exit("--evaluate is the retrieval-task eval mode")
    if args.data and args.task in ("vqa", "nlvr"):
        sys.exit(f"--data for {args.task} needs task-specific annotation "
                 "formats; use --synthetic (smoke) or the library API")

    import jax

    # this image force-prepends the 'axon' TPU platform; honor an explicit
    # JAX_PLATFORMS=cpu (virtual-mesh smoke runs) by pinning before any
    # backend init — the tools/parity_check.py pattern
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from rs_ov.core.checkpoint import save_pytree
    from rs_ov.nn.blip import blip_params_from_state_dict

    devices = np.asarray(jax.devices())
    if args.mesh:
        dp, tp = (int(x) for x in args.mesh.split(","))
    else:
        dp, tp = len(devices), 1
    mesh = Mesh(devices[:dp * tp].reshape(dp, tp), ("data", "model"))
    print(f"[train_blip] task={args.task} mesh data={dp} model={tp} "
          f"({devices[0].platform})", flush=True)
    if args.batch_size % dp:
        sys.exit(f"batch size {args.batch_size} not divisible by data={dp}")

    cfg = _blip_cfg(args)
    cdtype = jnp.bfloat16 if args.precision == "bf16" else None
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(args.warmup, max(args.steps - 1, 0)),
        decay_steps=args.steps)
    optimizer = optax.adamw(
        schedule, weight_decay=args.wd,
        mask=lambda p: jax.tree_util.tree_map(
            lambda x: getattr(x, "ndim", 0) >= 2, p))
    key = jax.random.PRNGKey(args.seed)
    rng = np.random.RandomState(args.seed)
    q = args.queue_size or 16 * args.batch_size

    if args.task in ("retrieval", "pretrain"):
        if args.task == "retrieval":
            from rs_ov.train.blip_retrieval import (
                init_blip_retrieval_state, make_blip_retrieval_train_step)

            state = init_blip_retrieval_state(key, cfg, queue_size=q)
            step_fn, init_opt = make_blip_retrieval_train_step(
                cfg, mesh, optimizer=optimizer, compute_dtype=cdtype,
                enc_token_id=_special_token_ids(args)[1])
            names = ("loss_ita", "loss_itm")
        else:
            from rs_ov.train.blip_pretrain import (
                init_blip_pretrain_state, make_blip_pretrain_train_step)

            state = init_blip_pretrain_state(key, cfg, queue_size=q)
            bos_id, enc_id = _special_token_ids(args)
            step_fn, init_opt = make_blip_pretrain_train_step(
                cfg, mesh, optimizer=optimizer, compute_dtype=cdtype,
                enc_token_id=enc_id, bos_token_id=bos_id)
            names = ("loss_ita", "loss_itm", "loss_lm")
        if args.pretrained:
            from rs_ov.core.checkpoint import load_torch_state_dict

            state["params"].update(blip_params_from_state_dict(
                load_torch_state_dict(args.pretrained)))
        if args.evaluate:
            if args.task != "retrieval":
                sys.exit("--evaluate is the retrieval-task eval mode")
            return _run_retrieval_eval(args, cfg, state["params"], rng)
        opt_state = init_opt(state["params"])

        def run_step(i, batch, k):
            alpha = args.alpha * min(1.0, (i + 1) / max(args.warmup, 1))
            nonlocal state, opt_state
            state, opt_state, losses = step_fn(
                state, opt_state, batch["images"], batch["ids"],
                batch["mask"], batch["idx"], jnp.float32(alpha), k)
            return dict(zip(names, (float(x) for x in losses)))

        def params_for_ckpt():
            return state
    else:
        from rs_ov.nn.blip_lm import (blip_caption_loss, blip_nlvr_forward,
                                      blip_vqa_loss,
                                      init_blip_decoder_params,
                                      init_blip_nlvr_params,
                                      init_blip_vqa_params)

        init = {"caption": init_blip_decoder_params,
                "vqa": init_blip_vqa_params,
                "nlvr": init_blip_nlvr_params}[args.task]
        params = init(key, cfg)
        opt_state = optimizer.init(params)
        dspec = NamedSharding(mesh, P("data"))

        def loss_fn(p, batch):
            if cdtype is not None:
                from rs_ov.core.params import cast_floating
                p = cast_floating(p, cdtype)
            if args.task == "caption":
                return blip_caption_loss(p, batch["images"], batch["ids"],
                                         batch["mask"], cfg)
            if args.task == "vqa":
                return blip_vqa_loss(p, batch["images"], batch["ids"],
                                     batch["mask"], batch["a_ids"],
                                     batch["a_mask"], batch["a2q"],
                                     batch["w"], cfg)
            return blip_nlvr_forward(p, batch["images"], batch["ids"],
                                     batch["mask"], cfg,
                                     targets=batch["targets"])

        @jax.jit
        def jstep(p, o, batch):
            loss, grads = jax.value_and_grad(loss_fn)(p, batch)
            updates, o = optimizer.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        def run_step(i, batch, k):
            nonlocal params, opt_state
            batch = {kk: jax.device_put(v, dspec) if v.ndim and
                     v.shape[0] % dp == 0 else jnp.asarray(v)
                     for kk, v in batch.items()}
            params, opt_state, loss = jstep(params, opt_state, batch)
            return {"loss": float(loss)}

        def params_for_ckpt():
            return params

    it = (_synth_batches(args, cfg, rng) if args.synthetic
          else _pair_batches(args, cfg, rng))
    t0 = time.perf_counter()
    last = {}
    for i, batch in enumerate(it):
        if i >= args.steps:
            break
        key, k = jax.random.split(key)
        last = run_step(i, batch, k)
        if (i + 1) % args.log_every == 0 or i + 1 == args.steps:
            rate = args.batch_size * (i + 1) / (time.perf_counter() - t0)
            print(json.dumps({"step": i + 1, **{k_: round(v, 4) for k_, v
                                                in last.items()},
                              "ex_per_sec": round(rate, 1)}), flush=True)
        if args.ckpt_dir and (i + 1) % args.ckpt_every == 0:
            os.makedirs(args.ckpt_dir, exist_ok=True)
            save_pytree(params_for_ckpt(),
                        os.path.join(args.ckpt_dir, f"step_{i + 1:07d}.npz"))
    if args.ckpt_dir:
        os.makedirs(args.ckpt_dir, exist_ok=True)
        save_pytree(params_for_ckpt(),
                    os.path.join(args.ckpt_dir, "final.npz"))
    return last


if __name__ == "__main__":
    main()
