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
