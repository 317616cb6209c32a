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

runtime = None  # the singleton Runtime, set by mpyc_tpu.runtime.setup()


def _enable_tpu_compile_cache():
    """Persistent XLA compilation cache on TPU backends (opt-in).

    Set MPYC_TPU_CACHE=1 to enable. Off by default: on remote-attached
    (tunnelled) TPUs the per-compilation cache round trips can cost far
    more than they save, and this container's CPU cache entries are
    known-bad (mismatched CPU features)."""
    import os
    if not os.getenv('MPYC_TPU_CACHE'):
        return
    try:
        import jax
        if jax.default_backend() == 'cpu':
            return
        cache_dir = os.path.join(
            os.path.expanduser('~'), '.cache', 'mpyc_tpu', 'xla')
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        # cache everything: protocol trees emit many sub-second programs
        # whose compiles are tunnel round trips on remote-attached TPUs
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    except Exception:   # never block import on cache setup
        pass


_enable_tpu_compile_cache()
