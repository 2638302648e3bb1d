"""Platform pinning for CPU-only entry points.

This image force-prepends the experimental 'axon' TPU platform to
``jax_platforms`` regardless of the ``JAX_PLATFORMS`` env var, and a wedged
TPU tunnel then hangs the first backend initialisation indefinitely
(observed live: a plain ``import rs_ov.factory`` blocked >40 minutes).
CPU-only tools — metric merge (``eval.py --merge``), dataset converters,
parity fixtures — must never touch the tunnel: call :func:`pin_cpu` at the
top of the entry point, BEFORE anything that can initialise a jax backend.

The pattern is proven in ``tests/conftest.py`` and ``tools/parity_check.py``:
the env var alone is ignored (the axon plugin force-registers), the config
API set before backend init is authoritative.
"""

from __future__ import annotations

import os


def pin_cpu() -> None:
    """Pin jax to the host CPU backend (no-op if already initialised on CPU)."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")  # belt (ignored under axon)
    import jax

    jax.config.update("jax_platforms", "cpu")  # braces (authoritative)
