"""Test harness config: force CPU with 8 virtual devices BEFORE jax import.

Multi-chip sharding tests run on a virtual 8-device CPU mesh (the way the
reference's single-GPU code is validated visually, our mesh code is
validated here without real TPU hardware)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's 'axon' TPU plugin prepends itself to jax_platforms even
# when JAX_PLATFORMS=cpu is set; force CPU explicitly post-import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu" and len(jax.devices()) == 8
