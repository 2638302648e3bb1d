"""Test config: force an 8-virtual-device CPU mesh before JAX import.

Tests exercise TPU-designed code paths on the host platform (the sharding
tests need multiple devices; XLA semantics are identical).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# repo root on sys.path so `import rs_ov` works without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This image force-prepends the 'axon' TPU platform to jax_platforms regardless
# of JAX_PLATFORMS; override through the config API before any backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
