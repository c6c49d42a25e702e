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
