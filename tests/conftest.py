"""Test configuration: force the CPU platform with 8 virtual devices.

Benchmarks run on the real TPU; unit tests validate numerics and
multi-device sharding on a virtual 8-device CPU mesh.  The axon environment
pins JAX_PLATFORMS=axon, so we override via jax.config before backend init.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
