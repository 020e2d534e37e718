"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding tests (shard_map over a Mesh) execute without TPU hardware.

The ambient environment may register a TPU PJRT plugin at interpreter start
and pin `jax_platforms` through jax.config (which outranks the JAX_PLATFORMS
env var), so we override via jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: the suite is compile-dominated on this 2-CPU
# box (shard_map/GSPMD programs take 10-60 s each to build); warm-cache
# runs load them instead of recompiling.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"
