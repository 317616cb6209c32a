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
import os

_DIR = None
_SALT = None


def _cache_dir():
    global _DIR
    if _DIR is None:
        d = os.path.join(os.path.expanduser('~'), '.cache', 'mpyc_tpu',
                         'trace')
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
    import jax
    from jax import export
    name = hashlib.sha256((_salt() + '|' + key).encode()).hexdigest()[:32]
    path = os.path.join(_cache_dir(), name + '.jaxexp')
    if os.path.exists(path):
        try:
            with open(path, 'rb') as fh:
                exp = export.deserialize(fh.read())
            return jax.jit(exp.call)
        except Exception:
            try:
                os.remove(path)
            except OSError:
                pass
    fn = build_fn()
    try:
        exp = export.export(fn)(*example_args)
        blob = exp.serialize()
        tmp = path + '.tmp.%d' % os.getpid()
        with open(tmp, 'wb') as fh:
            fh.write(blob)
        os.replace(tmp, path)
        return jax.jit(exp.call)
    except Exception:
        return fn
