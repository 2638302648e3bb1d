"""Caption-generation evaluation loop (reference BLIP/eval_nocaps.py:30-51
``evaluate`` + the BLIP data/utils.py ``save_result`` shard-merge role).

The reference walks a dataloader, beam-searches captions per batch, and
collects ``[{"image_id": id, "caption": text}, ...]`` into a rank-stamped
JSON that rank 0 merges. Here the generation loop batches through ONE jitted
decode program (rs_ov.nn.blip_lm.generate_captions pads the tail batch so a
single program geometry serves the whole sweep), and the shard merge is a
plain file concat keyed the same way.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Iterable, List, Sequence

import numpy as np

__all__ = ["evaluate_captions", "save_result", "merge_results"]


def evaluate_captions(params: dict, cfg, images: np.ndarray,
                      image_ids: Sequence[int], tokenizer,
                      batch: int = 8, num_beams: int = 3,
                      max_length: int = 20, min_length: int = 5,
                      repetition_penalty: float = 1.1,
                      prompt: str = "a picture of ",
                      log: Callable[[str], None] | None = None
                      ) -> List[dict]:
    """[N,3,S,S] frames + ids -> the reference's result-list shape
    (eval_nocaps.py:40-49: generate(sample=False, num_beams, max/min_length,
    repetition_penalty=1.1) per batch, one record per image)."""
    from rs_ov.nn.blip_lm import generate_captions

    images = np.asarray(images, np.float32)
    n = len(images)
    if n != len(image_ids):
        raise ValueError(f"{n} images vs {len(image_ids)} image_ids")
    results: List[dict] = []
    for i in range(0, n, batch):
        chunk = images[i:i + batch]
        pad = batch - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        caps = generate_captions(params, chunk, cfg, tokenizer,
                                 num_beams=num_beams, max_length=max_length,
                                 min_length=min_length,
                                 repetition_penalty=repetition_penalty,
                                 prompt=prompt)
        for cap, img_id in zip(caps[: len(chunk) - pad], image_ids[i:i + batch]):
            results.append({"image_id": int(img_id), "caption": cap})
        if log:
            log(f"captioned {min(i + batch, n)}/{n}")
    return results


def save_result(result: List[dict], result_dir: str, filename: str,
                rank: int = 0) -> str:
    """Write this shard's ``{filename}_rank{rank}.json`` (the reference
    data/utils.py save_result layout)."""
    os.makedirs(result_dir, exist_ok=True)
    path = os.path.join(result_dir, f"{filename}_rank{rank}.json")
    with open(path, "w") as f:
        json.dump(result, f)
    return path


def merge_results(result_dir: str, filename: str, world: int,
                  remove_duplicate: str = "image_id") -> str:
    """Rank-0 merge: concat all rank shards, drop duplicate records by key
    (the reference merges samplers that pad the tail), write
    ``{filename}.json``."""
    merged: List[dict] = []
    for rank in range(world):
        with open(os.path.join(result_dir,
                               f"{filename}_rank{rank}.json")) as f:
            merged.extend(json.load(f))
    if remove_duplicate:
        seen, uniq = set(), []
        for rec in merged:
            k = rec[remove_duplicate]
            if k not in seen:
                seen.add(k)
                uniq.append(rec)
        merged = uniq
    path = os.path.join(result_dir, f"{filename}.json")
    with open(path, "w") as f:
        json.dump(merged, f)
    return path
