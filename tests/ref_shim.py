"""Load reference torch modules standalone for golden-parity testing.

The reference's ``open_clip/__init__.py`` pulls in torchvision (absent here),
so we materialise a minimal fake ``open_clip`` package exposing only the
pieces the parity tests need (utils.to_2tuple, pos_embed, transformer). The
reference code itself is executed read-only from /root/reference — nothing is
copied into this repo.
"""

from __future__ import annotations

import importlib.util
import itertools
import collections.abc
import sys
import types

REF = "/root/reference"


def _load_as(name: str, path: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _to_2tuple(x):
    if isinstance(x, collections.abc.Iterable) and not isinstance(x, str):
        return tuple(x)
    return tuple(itertools.repeat(x, 2))


_loaded = {}


def load_reference_transformer():
    """Returns the reference open_clip.transformer module (torch)."""
    if "transformer" in _loaded:
        return _loaded["transformer"]
    if "open_clip" not in sys.modules or not getattr(
            sys.modules.get("open_clip"), "_rs_ov_fake", False):
        pkg = types.ModuleType("open_clip")
        pkg.__path__ = [f"{REF}/open_clip"]
        pkg._rs_ov_fake = True
        sys.modules["open_clip"] = pkg
        utils = types.ModuleType("open_clip.utils")
        utils.to_2tuple = _to_2tuple
        utils.freeze_batch_norm_2d = lambda *a, **k: None  # torchvision-free stub
        sys.modules["open_clip.utils"] = utils
        _load_as("open_clip.pos_embed", f"{REF}/open_clip/pos_embed.py")
    mod = _load_as("open_clip.transformer", f"{REF}/open_clip/transformer.py")
    _loaded["transformer"] = mod
    return mod


def load_reference_module(name: str):
    """Load a top-level reference module (outlier_suppression, CTD, ...)."""
    if name in _loaded:
        return _loaded[name]
    if name in ("gem_utils",):
        load_reference_transformer()  # gem_utils imports open_clip.transformer
        mod = _load_as(name, f"{REF}/gem/{name}.py")
    elif name == "upsamplers":
        mod = _load_as("ref_upsamplers", f"{REF}/simfeatup_dev/upsamplers.py")
    elif name in ("modified_resnet", "loss"):
        load_reference_transformer()  # ensures the fake open_clip pkg exists
        mod = _load_as(f"open_clip.{name}", f"{REF}/open_clip/{name}.py")
    else:
        mod = _load_as(f"ref_{name}", f"{REF}/{name}.py")
    _loaded[name] = mod
    return mod
