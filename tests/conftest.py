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
# NB: no persistent compilation cache — the container's remote-compile
# service writes entries with mismatched CPU features (SIGILL / wrong
# results when loaded); in-process jit caching suffices.


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process / large batch)")
