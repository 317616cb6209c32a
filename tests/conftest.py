"""Pytest configuration: force a virtual 8-device CPU mesh.

The container preloads jax with the 'axon' TPU backend via sitecustomize, so
env vars alone don't help — the platform must be switched with
jax.config.update before any backend use. Tests run on CPU (no TPU needed);
multi-chip sharding paths use the 8 virtual CPU devices.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
