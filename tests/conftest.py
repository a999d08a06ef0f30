"""Test config: force CPU with 8 virtual devices so sharding tests run
without TPU hardware (per jax.sharding.Mesh multi-chip design)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The environment's TPU plugin ("axon") prepends itself to jax_platforms even
# when JAX_PLATFORMS=cpu is set, so force CPU explicitly for tests.
jax.config.update("jax_platforms", "cpu")

