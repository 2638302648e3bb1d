"""Prompt-ensemble text classifier (query features).

Rebuilds the reference's classifier precompute (reference segmentor.py:157-174
and open_clip/zero_shot_classifier.py:21-69): for every query word, encode all
prompt templates, L2-normalise per prompt, average, L2-normalise again. All
prompts for all classes are batched into ONE text-transformer call — on TPU a
single [Q*80, 77] pass replaces the reference's per-class Python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rs_ov.core.config import TextConfig
from rs_ov.text.encoder import text_forward
from rs_ov.text.templates import OPENAI_IMAGENET_TEMPLATES
from rs_ov.text.tokenizer import tokenize

__all__ = ["build_text_classifier", "get_cls_idx"]


def get_cls_idx(path: str):
    """Parse a cls_*.txt synonym vocabulary (reference segmentor.py:611-622).

    Each line is one class; comma-separated synonyms map back to the same
    class index. Returns (query_words, query_idx).
    """
    with open(path) as f:
        name_sets = f.readlines()
    class_names, class_indices = [], []
    for idx, line in enumerate(name_sets):
        names = line.split(",")
        class_names += names
        class_indices += [idx] * len(names)
    class_names = [n.replace("\n", "") for n in class_names]
    return class_names, class_indices


def build_text_classifier(text_params: dict, query_words: list[str],
                          cfg: TextConfig, *, quick_gelu: bool = False,
                          templates=OPENAI_IMAGENET_TEMPLATES,
                          batch_size: int = 512,
                          dtype=None) -> jnp.ndarray:
    """Returns query_features [Q, output_dim], L2-normalised.

    One jitted text-encoder program processes the whole (Q * n_templates)
    prompt batch in chunks of `batch_size`.
    """
    n_t = len(templates)
    prompts = [t.format(w) for w in query_words for t in templates]
    token_ids = tokenize(prompts)  # [Q*T, 77] np.int32

    encode = jax.jit(
        lambda p, ids: text_forward(p, ids, cfg, quick_gelu_act=quick_gelu,
                                    normalize=True))

    feats = []
    n = token_ids.shape[0]
    pad = (-n) % batch_size
    if pad:
        token_ids = np.concatenate(
            [token_ids, np.tile(token_ids[-1:], (pad, 1))], axis=0)
    for i in range(0, token_ids.shape[0], batch_size):
        feats.append(encode(text_params, jnp.asarray(token_ids[i:i + batch_size])))
    feats = jnp.concatenate(feats, axis=0)[:n]  # [Q*T, D] normalised per prompt

    feats = feats.reshape(len(query_words), n_t, -1).astype(jnp.float32)
    mean = feats.mean(axis=1)
    mean = mean / jnp.maximum(jnp.linalg.norm(mean, axis=-1, keepdims=True), 1e-12)
    if dtype is not None:
        mean = mean.astype(dtype)
    return mean
