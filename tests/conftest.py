"""Test harness config: force a virtual 8-device CPU mesh before jax import.

Multi-chip sharding tests run on the host platform with
``--xla_force_host_platform_device_count=8`` (ray sharding is
communication-free, so sharded and single-device renders must match).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores JAX_PLATFORMS; pin via config (must happen
# before any computation runs).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
