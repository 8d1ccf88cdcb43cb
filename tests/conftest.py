"""Test configuration: run JAX on CPU with 8 virtual devices.

The axon harness pre-imports JAX (sitecustomize) with JAX_PLATFORMS=axon, so
plain env mutation is too late here; jax.config.update is authoritative.
Multi-chip sharding tests use --xla_force_host_platform_device_count so the
same shard_map code path runs without TPU hardware.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
