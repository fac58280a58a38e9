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
