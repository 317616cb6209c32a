"""MPyC-TPU: a TPU-native secure multiparty computation framework.

Capability parity target: lschoe/mpyc (mounted read-only at
/root/reference). Shamir secret sharing over finite fields with m parties
and threshold t < m/2, operator-overloaded secure types, and a protocol
runtime — redesigned TPU-first: field elements are uint32 limb arrays with
jitted Montgomery kernels, randomness is batched counter-mode SHAKE128, and
protocol ops are explicit rounds of fused device kernels between pc-tagged
exchanges (or mesh collectives on the co-located simulator plane).

Typical use::

    from mpyc_tpu.runtime import mpc
    secint = mpc.SecInt(32)
    mpc.run(mpc.start())
    x = mpc.input(secint(7))
    s = mpc.run(mpc.output(mpc.sum(x)))
    mpc.run(mpc.shutdown())
"""

__version__ = '0.1.0'

# Environments that export PYTHONDONTWRITEBYTECODE=1 recompile every
# imported source file in every process (~0.3 s of pure `compile()` per
# party for numpy + asyncio + this package). Python still READS existing
# bytecode caches, so `tools/warm_caches.py` pre-builds one under the
# install tree; point the interpreter at it before the heavy imports
# below. No-op when bytecode writing is enabled (normal installs cache
# themselves) or when the user already set a pycache prefix.
def _use_prebuilt_pycache():
    import os
    import sys
    if not sys.dont_write_bytecode or sys.pycache_prefix:
        return
    prebuilt = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        '.pycache')
    if os.path.isdir(prebuilt):
        sys.pycache_prefix = prebuilt


_use_prebuilt_pycache()
del _use_prebuilt_pycache

runtime = None  # the singleton Runtime, set by mpyc_tpu.runtime.setup()


_cache_enabled = False


def enable_compile_cache(probe_backend=True):
    """Persistent XLA compilation cache for TPU backends.

    Protocol programs recompile identically across processes — on
    remote-attached (tunnelled) TPUs each compile is a network round trip
    (measured: ~250 sub-second compiles per warm BNN run before caching).
    Called lazily from the TPU execution planes (SimRuntime, bench,
    MPYC_TPU_PARTY_DEVICE=tpu), NOT at import: XLA:CPU AOT cache entries
    replay with machine-feature mismatch warnings / SIGILL risk, so the
    CPU backend never uses the cache. MPYC_TPU_CACHE=1 forces it on at
    import (skipping the backend probe); =0 disables everywhere.
    """
    global _cache_enabled
    import os
    if _cache_enabled or os.getenv('MPYC_TPU_CACHE', '') == '0':
        return
    try:
        import jax
        if probe_backend and jax.default_backend() == 'cpu':
            return
        from mpyc_tpu.utils import tracecache
        cache_dir = os.path.join(tracecache.cache_root(), 'xla')
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        # cache everything: protocol trees emit many sub-second programs
        # whose compiles are tunnel round trips on remote-attached TPUs
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
        _cache_enabled = True
    except Exception:   # never block startup on cache setup
        pass


if __import__('os').getenv('MPYC_TPU_CACHE') == '1':
    enable_compile_cache(probe_backend=False)
