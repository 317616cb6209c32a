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

# MPYC_TPU_TEST_BACKEND=tpu opts into running the TPU-gated tests (fused
# SecInt(64) comparison etc.) against the real chip; default stays CPU.
if os.environ.get("MPYC_TPU_TEST_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
else:
    # keep runtime.setup() from re-pinning the eager plane to CPU under
    # the axon tunnel (mpyc_tpu/runtime.py setup())
    os.environ.setdefault("MPYC_TPU_PARTY_DEVICE", "tpu")
# NB: no persistent compilation cache — the container's remote-compile
# service writes entries with mismatched CPU features (SIGILL / wrong
# results when loaded); in-process jit caching suffices.


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process / large batch)")


def free_base_port(span=16):
    """Reserve a base port for an -M spawned multi-party run.

    Binds an ephemeral port P and returns it if P+1..P+span-1 are also
    free, so concurrent pytest processes (or a full-suite run racing a
    single-test run) never collide on hardcoded bases.
    """
    import socket

    while True:
        with socket.socket() as s:
            s.bind(('127.0.0.1', 0))
            base = s.getsockname()[1]
        if base + span >= 65535:
            continue
        ok = True
        for off in range(1, span):
            with socket.socket() as t:
                try:
                    t.bind(('127.0.0.1', base + off))
                except OSError:
                    ok = False
                    break
        if ok:
            return base
