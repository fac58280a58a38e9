"""Test configuration: force a virtual 8-device CPU mesh so sharding tests
run without TPU hardware (the TPU tunnel has high per-op latency and is
reserved for bench.py). Must configure before any jax computation."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# the environment's sitecustomize pins JAX_PLATFORMS=axon; override in-process
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# persistent compilation cache: the suite is compile-bound on small CPU
# hosts, and every test re-jits the same step functions — cache across runs.
_cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "furniture_tpu_jax")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
