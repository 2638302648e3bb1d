"""CPU-only entry points must not touch the TPU tunnel.

A wedged axon tunnel hangs the first jax backend init indefinitely
(observed live in round 2: >40 min on an import). Host-only tools —
``eval.py --merge``, the dataset converter CLI — pin the CPU platform via
rs_ov.core.platform.pin_cpu() before any backend init, so they complete
even when the tunnel is down. These tests run the real CLIs as
subprocesses WITHOUT the conftest CPU pin in their environment: with the
pin missing in the tool itself they would hang on a dead tunnel (and on a
healthy one still cost a remote init), so the timeout is the assertion.
"""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = os.environ.copy()
    env.pop("JAX_PLATFORMS", None)  # ignored under axon anyway, but be honest
    return env


def _make_rank_state(path, inter, union, pred, label, num_images):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    state = np.stack([inter, union, pred, label]).astype(np.float64)
    np.savez(path, state=state, num_images=num_images,
             pixels=float(label.sum()), elapsed_sec=1.0, ignore_index=255,
             class_names=np.asarray(["a", "b"]), tag="cfg_test",
             model=np.asarray(["CLIP", "ViT-B/16", "Experimental"]))


def test_eval_merge_completes_without_tunnel(tmp_path):
    a = np.array([10.0, 20.0])
    _make_rank_state(str(tmp_path / "rank0" / "metric_state.npz"),
                     a, a * 2, a * 1.5, a * 2, 3)
    _make_rank_state(str(tmp_path / "rank1" / "metric_state.npz"),
                     a, a * 2, a * 1.5, a * 2, 4)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "eval.py"), "--merge", str(tmp_path)],
        cwd=REPO, env=_clean_env(), timeout=120,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    assert proc.returncode == 0, proc.stderr[-2000:]
    parsed = json.loads(proc.stdout[proc.stdout.index("{"):])
    assert parsed["num_shards"] == 2 and parsed["num_images"] == 7
    # inter/union identical per class across ranks -> IoU 50% exactly
    assert abs(parsed["mIoU"] - 50.0) < 1e-9


def test_converter_cli_completes_without_tunnel(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "img"
    ann_dir = tmp_path / "ann"
    img_dir.mkdir(), ann_dir.mkdir()
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)).save(
        img_dir / "x.png")
    Image.fromarray((rng.rand(64, 64) > 0.5).astype(np.uint8) * 255).save(
        ann_dir / "x.png")
    out = tmp_path / "out"
    proc = subprocess.run(
        [sys.executable, "-m", "rs_ov.data.converters.convert", "binary",
         str(img_dir), str(ann_dir), "-o", str(out)],
        cwd=REPO, env=_clean_env(), timeout=120,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert list((out / "images").rglob("*.png"))
    assert list((out / "annotations").rglob("*.png"))
