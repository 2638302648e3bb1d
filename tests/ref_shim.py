"""Load reference torch modules standalone for golden-parity testing.

The reference's ``open_clip/__init__.py`` pulls in torchvision (absent here),
so we materialise a minimal fake ``open_clip`` package exposing only the
pieces the parity tests need (utils.to_2tuple, pos_embed, transformer). The
reference code itself is executed read-only from /root/reference — nothing is
copied into this repo.

The fake package is installed into ``sys.modules`` only WHILE a reference
module executes, then every ``open_clip*`` entry is restored to its prior
state (round-3 VERDICT: the permanent install shadowed this repo's real
``open_clip`` facade and made plain ``pytest tests/`` order-dependent).
Loaded reference modules are cached in ``_loaded`` and keep working
afterwards because their name bindings were resolved at exec time.
"""

from __future__ import annotations

import contextlib
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


@contextlib.contextmanager
def _fake_open_clip():
    """Temporarily install the minimal fake open_clip package.

    Saves every existing ``open_clip*`` sys.modules entry (e.g. this repo's
    real facade), installs the fake plus any already-loaded reference
    submodules, and restores the original state on exit — so a later
    ``import open_clip`` anywhere else still gets the real facade.
    """
    saved = {k: sys.modules[k] for k in list(sys.modules)
             if k == "open_clip" or k.startswith("open_clip.")}
    for k in saved:
        del sys.modules[k]
    try:
        pkg = types.ModuleType("open_clip")
        pkg.__path__ = [f"{REF}/open_clip"]
        pkg._rs_ov_fake = True
        sys.modules["open_clip"] = pkg
        utils = types.ModuleType("open_clip.utils")
        utils.to_2tuple = _to_2tuple
        utils.freeze_batch_norm_2d = lambda *a, **k: None  # torchvision-free stub
        sys.modules["open_clip.utils"] = utils
        if "pos_embed" not in _loaded:
            _loaded["pos_embed"] = _load_as(
                "open_clip.pos_embed", f"{REF}/open_clip/pos_embed.py")
        sys.modules["open_clip.pos_embed"] = _loaded["pos_embed"]
        if "transformer" in _loaded:  # gem_utils does `from open_clip.transformer import …`
            sys.modules["open_clip.transformer"] = _loaded["transformer"]
        yield
    finally:
        for k in list(sys.modules):
            if k == "open_clip" or k.startswith("open_clip."):
                del sys.modules[k]
        sys.modules.update(saved)


def load_reference_transformer():
    """Returns the reference open_clip.transformer module (torch)."""
    if "transformer" in _loaded:
        return _loaded["transformer"]
    with _fake_open_clip():
        mod = _load_as("open_clip.transformer", f"{REF}/open_clip/transformer.py")
    _loaded["transformer"] = mod
    return mod


def load_reference_module(name: str):
    """Load a top-level reference module (outlier_suppression, CTD, ...)."""
    if name in _loaded:
        return _loaded[name]
    if name in ("gem_utils",):
        load_reference_transformer()  # gem_utils imports open_clip.transformer
        with _fake_open_clip():
            mod = _load_as(name, f"{REF}/gem/{name}.py")
    elif name == "upsamplers":
        mod = _load_as("ref_upsamplers", f"{REF}/simfeatup_dev/upsamplers.py")
    elif name in ("modified_resnet", "loss"):
        load_reference_transformer()
        with _fake_open_clip():
            mod = _load_as(f"open_clip.{name}", f"{REF}/open_clip/{name}.py")
    elif name in ("med", "nlvr_encoder"):
        # BLIP's BERT MED / NLVR twin-cross variant (import only
        # transformers internals). Newer transformers moved the
        # chunking/pruning helpers from modeling_utils to pytorch_utils —
        # alias them back for the import.
        import transformers.modeling_utils as _mu
        import transformers.pytorch_utils as _pu

        for _n in ("apply_chunking_to_forward",
                   "find_pruneable_heads_and_indices", "prune_linear_layer"):
            if not hasattr(_mu, _n):
                setattr(_mu, _n, getattr(_pu, _n))
        mod = _load_as(f"ref_{name}", f"{REF}/BLIP/models/{name}.py")
    else:
        mod = _load_as(f"ref_{name}", f"{REF}/{name}.py")
    _loaded[name] = mod
    return mod
