"""Test configuration: force an 8-device virtual CPU mesh.

The axon sitecustomize registers the TPU backend and overrides JAX_PLATFORMS,
so the platform must be forced through jax.config *after* importing jax.
Tests must run anywhere (no TPU needed); the multi-chip sharding tests use the
virtual device mesh.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/hmsr_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
