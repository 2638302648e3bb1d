"""Minimal training loop with checkpoint/resume.

The reference has no training driver at all (SURVEY.md §5: load-only
checkpointing). This loop closes that gap for CLIP fine-tuning on TPU:
sharded step (train/step.py), periodic npz checkpoints, resume from the
latest one.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Iterator, Optional

import jax

from rs_ov.core.checkpoint import load_pytree, save_pytree

__all__ = ["train_loop", "latest_checkpoint"]


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = [f for f in os.listdir(ckpt_dir)
             if f.startswith("step_") and f.endswith(".npz")]
    if not ckpts:
        return None
    return os.path.join(ckpt_dir, max(ckpts, key=lambda f: int(f[5:-4])))


def train_loop(step_fn: Callable, params, opt_state,
               data_iter: Iterator, num_steps: int, *,
               ckpt_dir: Optional[str] = None, ckpt_every: int = 1000,
               log_every: int = 50, resume: bool = True):
    """Run `num_steps` of `step_fn(params, opt_state, images, texts)`.

    data_iter yields (images, texts) host batches. Returns (params,
    opt_state, history). With ckpt_dir set, params checkpoint every
    `ckpt_every` steps and training resumes from the newest checkpoint.
    """
    start_step = 0
    if ckpt_dir and resume:
        latest = latest_checkpoint(ckpt_dir)
        if latest:
            params = load_pytree(latest)
            start_step = int(os.path.basename(latest)[5:-4])
            print(f"[train] resumed from {latest} (step {start_step})", flush=True)

    history = []
    t0 = time.perf_counter()
    for step in range(start_step, num_steps):
        images, texts = next(data_iter)
        params, opt_state, loss = step_fn(params, opt_state, images, texts)
        if (step + 1) % log_every == 0 or step + 1 == num_steps:
            loss_val = float(loss)
            rate = (step + 1 - start_step) / (time.perf_counter() - t0)
            history.append({"step": step + 1, "loss": loss_val})
            print(f"[train] step {step + 1}/{num_steps} loss {loss_val:.4f} "
                  f"({rate:.2f} it/s)", flush=True)
        if ckpt_dir and (step + 1) % ckpt_every == 0:
            os.makedirs(ckpt_dir, exist_ok=True)
            host_params = jax.device_get(params)
            save_pytree(host_params, os.path.join(ckpt_dir, f"step_{step + 1}.npz"))
    if ckpt_dir:
        os.makedirs(ckpt_dir, exist_ok=True)
        save_pytree(jax.device_get(params),
                    os.path.join(ckpt_dir, f"step_{num_steps}.npz"))
    return params, opt_state, history
