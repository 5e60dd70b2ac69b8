"""Test env: force an 8-device virtual CPU mesh before any JAX computation.

This is the TPU-native analogue of a fake distributed backend — multi-chip
sharding tests run on host CPU devices (see SURVEY.md §4). The axon TPU plugin
pre-imports jax from sitecustomize, so the platform must be switched via
jax.config (env vars alone are too late).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: most fast-tier wall time is CPU XLA
# compiles that are identical run over run (fixed shapes, fixed configs).
# First run populates the cache; repeat runs hit it. Point elsewhere (or
# disable with an empty string) via VERSBAND_TEST_COMPILE_CACHE.
_cache_dir = os.environ.get("VERSBAND_TEST_COMPILE_CACHE",
                            "/tmp/versband_jax_test_cache")
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
