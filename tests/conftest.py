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

# persistent compilation cache: the suite's cost is dominated by CPU jit
# compiles of the fused engine programs (one per LSH shape); caching them
# across runs keeps the full suite well under the 10-minute budget
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("KREPP_TPU_CACHE",
                       os.path.expanduser("~/.cache/krepp_tpu_jax_cpu")))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # noqa: BLE001 - cache is best-effort
    pass
