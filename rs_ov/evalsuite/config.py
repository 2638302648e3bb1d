"""mmengine-style Python config loader with `_base_` inheritance.

Keeps the reference's exact config surface (configs/cfg_*.py files that set
``model = dict(...)``, ``dataset_type``, ``data_root``, ``test_dataloader``
with ``_base_ = './base_config.py'`` — reference configs/*) without the
mmengine dependency: exec the file, recursively load bases, deep-merge dicts
(child wins).
"""

from __future__ import annotations

import os
from typing import Any

__all__ = ["load_config", "deep_merge"]

# Env knob: when RS_OV_DATA_ROOT is set, dataset paths in loaded configs are
# remapped under it (keeping their repo-relative layout). This keeps synthetic
# smoke fixtures (tools/make_synthetic_datasets.py -> data_synth/) strictly
# separate from the real dataset paths the configs ship with, so placing real
# data never silently mixes with the committed synthetic images.
DATA_ROOT_ENV = "RS_OV_DATA_ROOT"


def deep_merge(base: dict, child: dict) -> dict:
    out = dict(base)
    for k, v in child.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _exec_config(path: str) -> dict[str, Any]:
    path = os.path.abspath(path)
    scope: dict[str, Any] = {"__file__": path, "os": os}
    with open(path) as f:
        code = f.read()
    exec(compile(code, path, "exec"), scope)
    return {k: v for k, v in scope.items()
            if not k.startswith("__") and k != "os"}


def _remap_dataset_paths(cfg: dict[str, Any], new_root: str) -> None:
    """Rebase data_root/data_prefix paths under ``new_root`` in place.

    Paths inside the working tree (configs use ``os.path.abspath('data/…')``
    / ``'payload/…'``) become ``<new_root>/<repo-relative path>``; paths
    outside it are left untouched.
    """
    ds = cfg.get("test_dataloader", {}).get("dataset")
    if not isinstance(ds, dict):
        return

    def remap(p: str) -> str:
        rel = os.path.relpath(os.path.abspath(p), os.getcwd())
        return p if rel.startswith("..") else os.path.join(new_root, rel)

    if isinstance(ds.get("data_root"), str):
        ds["data_root"] = remap(ds["data_root"])
    dp = ds.get("data_prefix")
    if isinstance(dp, dict):
        for k, v in dp.items():
            if isinstance(v, str):
                dp[k] = remap(v)


def load_config(path: str) -> dict[str, Any]:
    cfg = _load_config_raw(path)
    new_root = os.environ.get(DATA_ROOT_ENV)
    if new_root:
        _remap_dataset_paths(cfg, new_root)
    return cfg


def _load_config_raw(path: str) -> dict[str, Any]:
    cfg = _exec_config(path)
    bases = cfg.pop("_base_", None)
    if bases:
        if isinstance(bases, str):
            bases = [bases]
        merged: dict[str, Any] = {}
        for b in bases:
            base_path = os.path.join(os.path.dirname(os.path.abspath(path)), b)
            merged = deep_merge(merged, _load_config_raw(base_path))
        cfg = deep_merge(merged, cfg)
    return cfg
