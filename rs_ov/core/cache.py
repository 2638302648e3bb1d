"""Persistent XLA compilation cache.

The fused per-image-geometry programs (and the 121-tap Pallas kernels) take
minutes to compile through this environment's remote-compile service but
replay from the on-disk cache in <1s. Enabled once per process by the
segmentor / eval / bench entry points; RS_OV_NO_COMPILE_CACHE=1 disables.
"""

from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled or os.environ.get("RS_OV_NO_COMPILE_CACHE") == "1":
        return
    import jax

    path = path or os.environ.get(
        "RS_OV_COMPILE_CACHE", os.path.expanduser("~/.cache/rs_ov_xla"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # persist EVERY compile: on the remote-compile backend even a
        # trivial eager op costs an HTTP round trip (~0.5-1s), so the
        # usual "don't persist sub-second compiles" default re-pays
        # hundreds of tiny compiles in every fresh process
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _enabled = True
    except Exception:  # older jax or read-only fs: run without the cache
        pass
