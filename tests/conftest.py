"""Test harness config: force CPU with 8 virtual devices BEFORE jax import.

Multi-chip sharding tests run on a virtual 8-device CPU mesh (the way the
reference's single-GPU code is validated visually, our mesh code is
validated here without real TPU hardware)."""

import os
import sys
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Never share the repo's persistent compile cache (.jax_cache): it holds
# TPU-session entries plus CPU entries AOT-compiled on other host
# generations, and deserializing a foreign-CPU executable ABORTS the
# process (observed: machine-feature mismatch 'prefer-no-scatter' ->
# Fatal Python error in compilation_cache.get_executable_and_time).
# utils/cache.enable() (imported by train/driver) honors this env.
os.environ.setdefault("WAST3D_JAX_CACHE",
                      tempfile.mkdtemp(prefix="wast3d_test_cache_"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's 'axon' TPU plugin prepends itself to jax_platforms even
# when JAX_PLATFORMS=cpu is set; force CPU explicitly post-import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu" and len(jax.devices()) == 8


# --- test tiers -------------------------------------------------------------
# slow_tests.txt lists node ids measured at >=4s call time on one CPU
# (generated from `pytest tests/ --durations=0`; see the file header).
# They get @pytest.mark.slow so `pytest -m "not slow"` is a ~2-3 min
# fast tier; the unfiltered suite remains the pre-merge bar. Tests added
# after the last measurement default to the fast tier until re-measured.
import pytest  # noqa: E402

_SLOW_FILE = os.path.join(os.path.dirname(__file__), "slow_tests.txt")


def pytest_collection_modifyitems(config, items):
    try:
        with open(_SLOW_FILE) as f:
            slow = {
                ln.strip() for ln in f
                if ln.strip() and not ln.startswith("#")
            }
    except OSError:
        return
    for item in items:
        nodeid = item.nodeid.split("::", 1)
        key = os.path.basename(nodeid[0]) + "::" + nodeid[1] if len(nodeid) > 1 else item.nodeid
        if key in slow:
            item.add_marker(pytest.mark.slow)
