#!/usr/bin/env python
"""CLIP contrastive fine-tuning CLI on a TPU mesh.

The reference repo has no training driver at all (SURVEY.md §5 — its
open_clip/loss.py training losses are vestigial API). This CLI completes
that surface on rs_ov's training stack: GSPMD dp×tp sharded train step
(rs_ov/train/step.py), CLIP/SigLIP contrastive losses (train/losses.py),
cosine LR schedule with warmup, bf16 mixed precision (fp32 masters), and
npz checkpoint/resume (train/loop.py).

Data: `--data <manifest>` where the manifest is a .tsv/.csv/.jsonl of
(image_path, caption) pairs, or a directory in which every image has a
same-stem .txt caption sidecar. `--synthetic` trains on random data (smoke
tests / throughput measurement without a dataset).

Examples:
  python train.py --model ViT-B/16 --synthetic --steps 20 --batch-size 8
  python train.py --model ViT-B-32 --data pairs.tsv --steps 1000 \\
      --batch-size 256 --mesh 4,2 --precision bf16 --ckpt-dir work_dirs/ft
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", default="ViT-B/16",
                    help="arch name (any core/config.py registry entry)")
    ap.add_argument("--pretrained", default=None,
                    help="checkpoint path to start from (else random init)")
    ap.add_argument("--data", default=None,
                    help="manifest file (.tsv/.csv/.jsonl) or sidecar dir")
    ap.add_argument("--synthetic", action="store_true",
                    help="random image/text batches (smoke / throughput)")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--wd", type=float, default=0.2)
    ap.add_argument("--warmup", type=int, default=200)
    ap.add_argument("--loss", choices=("clip", "siglip"), default="clip")
    ap.add_argument("--grad-clip-norm", type=float, default=None,
                    help="clip raw gradients to this global L2 norm before "
                         "the optimizer step (open_clip --grad-clip-norm)")
    ap.add_argument("--accum-freq", type=int, default=1,
                    help="gradient accumulation with full-batch negatives "
                         "(open_clip --accum-freq semantics): --batch-size "
                         "is the GLOBAL batch, split into this many "
                         "micro-batches per optimizer step")
    ap.add_argument("--precision", choices=("fp32", "bf16"), default="bf16")
    ap.add_argument("--mesh", default="",
                    help="'DP,TP' mesh shape (default: all devices on data)")
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--ckpt-every", type=int, default=1000)
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true",
                    help="shrink the arch to a debug size (smoke tests)")
    return ap.parse_args(argv)


def _read_manifest(path: str) -> list[tuple[str, str]]:
    pairs: list[tuple[str, str]] = []
    if os.path.isdir(path):
        for fn in sorted(os.listdir(path)):
            stem, ext = os.path.splitext(fn)
            if ext.lower() in (".jpg", ".jpeg", ".png", ".tif", ".tiff"):
                cap = os.path.join(path, stem + ".txt")
                if os.path.exists(cap):
                    with open(cap) as f:
                        pairs.append((os.path.join(path, fn), f.read().strip()))
        return pairs
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            if path.endswith(".jsonl"):
                d = json.loads(line)
                pairs.append((d["image"], d["caption"]))
            else:
                # delimiter by extension; unknown extensions prefer tab
                sep = ("\t" if path.endswith(".tsv")
                       else "," if path.endswith(".csv")
                       else "\t" if "\t" in line else ",")
                img, cap = line.split(sep, 1)
                pairs.append((img, cap))
    return pairs


def _data_iter(args, image_size: int, context_length: int, rng: np.random.RandomState):
    """Yields (images [B,3,S,S] fp32, tokens [B,L] int32) host batches."""
    b = args.batch_size
    if args.synthetic:
        toks = rng.randint(1, 1000, size=(b, context_length)).astype(np.int32)
        while True:
            yield (rng.randn(b, 3, image_size, image_size).astype(np.float32),
                   toks)
    from rs_ov.data.transforms import load_image
    from rs_ov.factory import image_transform
    from rs_ov.text.tokenizer import tokenize

    pairs = _read_manifest(args.data)
    if not pairs:
        sys.exit(f"no (image, caption) pairs found in {args.data}")
    print(f"[train] {len(pairs)} image-text pairs", flush=True)
    preprocess = image_transform(image_size)
    order = rng.permutation(len(pairs))
    i = 0
    while True:
        imgs, caps = [], []
        for _ in range(b):
            if i == len(order):
                order = rng.permutation(len(pairs))
                i = 0
            img_path, cap = pairs[order[i]]
            i += 1
            imgs.append(preprocess(load_image(img_path)))
            caps.append(cap)
        yield (np.stack(imgs),
               np.asarray(tokenize(caps, context_length), np.int32))


def main(argv=None):
    args = parse_args(argv)
    if not args.synthetic and not args.data:
        sys.exit("pass --data <manifest-or-dir> or --synthetic")

    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh

    from rs_ov.core.config import get_model_config
    from rs_ov.core.params import init_clip_params
    from rs_ov.train.loop import train_loop
    from rs_ov.train.step import make_clip_train_step

    devices = np.asarray(jax.devices())
    if args.mesh:
        dp, tp = (int(x) for x in args.mesh.split(","))
    else:
        dp, tp = len(devices), 1
    if dp * tp > len(devices):
        sys.exit(f"mesh {dp}x{tp} needs {dp * tp} devices, have {len(devices)}")
    mesh = Mesh(devices[:dp * tp].reshape(dp, tp), ("data", "model"))
    print(f"[train] mesh data={dp} model={tp} ({devices[0].platform})", flush=True)

    cfg = get_model_config(args.model)
    if cfg.vision.timm_model_name or cfg.text.hf_model_name:
        sys.exit(f"{args.model}: the sharded train step covers the classic "
                 "CLIP ViT+text towers (train/step.py)")
    if args.tiny:
        cfg = dataclasses.replace(
            cfg,
            vision=dataclasses.replace(cfg.vision, image_size=32, width=64,
                                       layers=2, output_dim=cfg.embed_dim),
            text=dataclasses.replace(cfg.text, width=64, heads=1, layers=2,
                                     context_length=16,
                                     output_dim=cfg.embed_dim))
    if args.batch_size % dp:
        sys.exit(f"batch size {args.batch_size} not divisible by data={dp}")

    if args.pretrained:
        from rs_ov.core.checkpoint import (clip_params_from_state_dict,
                                           load_torch_state_dict)
        params = clip_params_from_state_dict(load_torch_state_dict(args.pretrained))
        print(f"[train] loaded {args.pretrained}", flush=True)
    else:
        params = init_clip_params(jax.random.PRNGKey(args.seed), cfg)
    logit_bias0 = jnp.asarray(cfg.init_logit_bias
                              if cfg.init_logit_bias is not None else -10.0,
                              jnp.float32)
    if args.loss == "siglip" and "logit_bias" not in params:
        params["logit_bias"] = logit_bias0

    # optax needs decay_steps > warmup_steps; short smoke runs clamp warmup
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(args.warmup, max(args.steps - 1, 0)),
        decay_steps=args.steps)
    # open_clip recipe: no weight decay on biases / LayerNorm / gains /
    # logit_scale|bias — mask decay to matrices and embeddings (ndim >= 2)
    optimizer = optax.adamw(
        schedule, weight_decay=args.wd,
        mask=lambda params: jax.tree_util.tree_map(
            lambda p: getattr(p, "ndim", 0) >= 2, params))
    if args.grad_clip_norm:
        # clip BEFORE adamw, on the raw global grad norm (open_clip clips
        # raw grads via torch clip_grad_norm_ before optimizer.step)
        optimizer = optax.chain(
            optax.clip_by_global_norm(args.grad_clip_norm), optimizer)
    if args.batch_size % args.accum_freq:
        sys.exit(f"--accum-freq {args.accum_freq} must divide "
                 f"--batch-size {args.batch_size}")
    step_fn, init_opt = make_clip_train_step(
        cfg, mesh, optimizer=optimizer,
        compute_dtype=jnp.bfloat16 if args.precision == "bf16" else None,
        loss=args.loss, accum_steps=args.accum_freq)
    opt_state = init_opt(params)
    if args.loss == "siglip":
        inner_step = step_fn

        def step_fn(p, o, im, tx):
            # resuming from a clip-loss checkpoint drops the bias leaf —
            # re-add it so the tree keeps matching the optimizer state
            if "logit_bias" not in p:
                p = {**p, "logit_bias": logit_bias0}
            return inner_step(p, o, im, tx)

    rng = np.random.RandomState(args.seed)
    it = _data_iter(args, cfg.vision.image_size, cfg.text.context_length, rng)
    params, opt_state, history = train_loop(
        step_fn, params, opt_state, it, args.steps,
        ckpt_dir=args.ckpt_dir, ckpt_every=args.ckpt_every,
        log_every=args.log_every, resume=not args.no_resume)
    if history:
        print(json.dumps(history[-1]), flush=True)
    return params


if __name__ == "__main__":
    main()
