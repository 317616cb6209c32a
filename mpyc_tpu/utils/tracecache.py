"""Persistent trace cache for fused protocol programs (jax.export).

XLA's compilation cache removes backend compiles across processes, but jax
still re-TRACES every program per process — 5-10 s of host time for each
fused protocol step (make_sgn_step's unrolled Keccak + Montgomery trees),
which dominated warm demo runs on the co-located plane (71 s of an 82 s
BNN batch). This cache serializes the traced/lowered StableHLO of each
step with jax.export and reloads it in later processes, skipping tracing
entirely; backend compilation of the deserialized module still goes
through XLA (and its persistent cache).

Keys include a source-hash salt of the pipeline module, the jax version,
backend, and the step parameters, so stale artifacts can never be loaded
after a kernel change.
"""

from __future__ import annotations

import hashlib
import logging
import os

_DIR = None
_SALT = None


_FIXED_LINK = '/tmp/mpyc-tpu-cache'


def _storage_root() -> str:
    """Where cache bytes actually live: MPYC_TPU_CACHE_DIR, else the
    repo-local `.cache_seed/` (committable — artifacts ship with the
    checkout and true-cold containers start warm), else ~/.cache."""
    d = os.getenv('MPYC_TPU_CACHE_DIR')
    if d:
        return d
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    seed = os.path.join(repo, '.cache_seed')
    if os.access(repo, os.W_OK) or os.path.isdir(seed):
        return seed
    return os.path.join(os.path.expanduser('~'), '.cache', 'mpyc_tpu')


def cache_root() -> str:
    """Path handed to jax's compilation-cache config.

    The compile-cache keys (the local persistent cache's and the remote
    compile service's) hash the compile options, which embed this PATH
    STRING — a per-HOME or per-checkout path makes every fresh
    container/clone a full cache miss (measured: np_aes -b 64 cold
    190 s vs warm 31 s, zero key overlap).  So the configured path is
    the FIXED string /tmp/mpyc-tpu-cache, realized as a symlink to the
    real storage root — committed artifacts then replay regardless of
    where the repo is checked out.  Falls back to the storage path when
    the symlink cannot be created (keys then stable per checkout)."""
    store = _storage_root()
    try:
        os.makedirs(store, exist_ok=True)
        if os.path.islink(_FIXED_LINK):
            if os.path.realpath(_FIXED_LINK) != os.path.realpath(store):
                os.remove(_FIXED_LINK)
                os.symlink(store, _FIXED_LINK)
        elif os.path.isdir(_FIXED_LINK):
            return _FIXED_LINK   # pre-existing real dir: use as storage
        else:
            os.symlink(store, _FIXED_LINK)
        return _FIXED_LINK
    except OSError:
        return store


def _cache_dir():
    global _DIR
    if _DIR is None:
        d = os.path.join(cache_root(), 'trace')
        try:
            os.makedirs(d, exist_ok=True)
            _DIR = d
        except OSError:
            _DIR = ''
    return _DIR


def _salt():
    global _SALT
    if _SALT is None:
        import jax
        from mpyc_tpu.models import pipelines
        from mpyc_tpu.ops import keccak, limb
        h = hashlib.sha256()
        for mod in (pipelines, keccak, limb):
            try:
                with open(mod.__file__, 'rb') as fh:
                    h.update(fh.read())
            except OSError:
                h.update(b'?')
        h.update(jax.__version__.encode())
        try:
            h.update(jax.default_backend().encode())
        except Exception:
            pass
        _SALT = h.hexdigest()[:16]
    return _SALT


def enabled() -> bool:
    return os.getenv('MPYC_TPU_CACHE', '1') != '0' and _cache_dir() != ''


def cached_step(key: str, build_fn, example_args):
    """Trace-cached jitted step.

    key: stable description of (kind, params, shapes). build_fn() returns
    the jitted step; example_args are ShapeDtypeStructs (or arrays) fixing
    the traced shapes. Returns a callable with the step's signature.
    """
    if not enabled():
        return build_fn()
    import gzip
    import jax
    from jax import export
    name = hashlib.sha256((_salt() + '|' + key).encode()).hexdigest()[:32]
    path = os.path.join(_cache_dir(), name + '.jaxexp')
    # blobs are stored gzipped (.jaxexp.gz, ~10x smaller — the big fused
    # protocol exports are tens of MB of StableHLO and the seed directory
    # is committed to the repo); plain .jaxexp still loads
    for p, opener in ((path + '.gz', gzip.open), (path, open)):
        if os.path.exists(p):
            try:
                with opener(p, 'rb') as fh:
                    exp = export.deserialize(fh.read())
                return jax.jit(exp.call)
            except Exception:
                try:
                    os.remove(p)
                except OSError:
                    pass
    fn = build_fn()
    try:
        exp = export.export(fn)(*example_args)
        blob = exp.serialize()
        tmp = path + '.gz.tmp.%d' % os.getpid()
        with gzip.open(tmp, 'wb', compresslevel=6) as fh:
            fh.write(blob)
        os.replace(tmp, path + '.gz')
        return jax.jit(exp.call)
    except Exception as exc:
        logging.getLogger(__name__).info(
            'trace export failed for %s: %r', key, exc)
        return fn
