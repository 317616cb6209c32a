"""Pytest configuration: force a virtual 8-device CPU mesh before jax import.

Tests must be runnable on any host (no TPU required). Multi-chip sharding
paths are exercised on a virtual CPU mesh, mirroring how the reference tests
its multi-party paths in a single process (cf. /root/reference tests strategy:
single-process m=1 runtime tests + mock transports).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
