"""Test config: force an 8-virtual-device CPU mesh before JAX import.

Tests exercise TPU-designed code paths on the host platform (the sharding
tests need multiple devices; XLA semantics are identical).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# The persistent XLA compile cache is for the (remote-compile) TPU entry
# points; on the CPU test platform its write path has segfaulted inside
# jax's put_executable_and_time during large Pallas-program serialization
# (seen when an eval-harness test enables it process-wide and a later
# kernel test compiles). Tests are hermetic without it.
os.environ.setdefault("RS_OV_NO_COMPILE_CACHE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# repo root on sys.path so `import rs_ov` works without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# This image force-prepends the 'axon' TPU platform to jax_platforms regardless
# of JAX_PLATFORMS; override through the config API before any backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

# Test tiers: the full suite takes >10 min on a 1-core host (torch oracles,
# e2e pipelines, 8-virtual-device runs). The fast tier (`pytest -m "not
# slow"`) covers all pure-numerics/unit/harness tests in ~5-7 min
# (contention-dependent on this 1-core host).
SLOW_TEST_MODULES = {
    "test_batch_predict.py", "test_blip_lm.py", "test_blip_retrieval_eval.py",
    "test_blip.py", "test_coca.py", "test_hf_text.py", "test_e2e_gem_blip.py",
    "test_e2e_pipeline.py", "test_factory.py", "test_kernels.py",
    "test_kernels_epilogue.py",
    "test_parallel.py", "test_parity_fullsize.py", "test_parity_gem.py",
    "test_timm_towers.py", "test_train_cli.py",
    "test_parity_jbu.py", "test_parity_jbu_realweights.py",
    "test_parity_vit.py", "test_resnet_losses.py",
    "test_upsampler_alternates.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in SLOW_TEST_MODULES:
            item.add_marker(pytest.mark.slow)
