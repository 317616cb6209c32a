"""Deferred jax import for the host-only scalar plane.

The per-party scalar protocol plane computes entirely with numpy /
Python-int host kernels; importing jax there costs ~1.5-2 s of startup
that the pure-Python reference does not pay (SURVEY.md §6 wall-clock
baselines are startup-dominated for the small demos). These proxies make
``import mpyc_tpu.runtime`` jax-free: the real modules load on first
attribute access — i.e. the first time a device kernel, a jit, or a
device array is actually touched (the --sim plane, large arrays, TPU
backends).
"""

from __future__ import annotations

import importlib


class _LazyModule:
    """Import-on-first-attribute-use proxy for a module."""

    __slots__ = ('_name', '_mod')

    def __init__(self, name: str):
        object.__setattr__(self, '_name', name)
        object.__setattr__(self, '_mod', None)

    def _load(self):
        mod = object.__getattribute__(self, '_mod')
        if mod is None:
            import os
            import sys
            if os.getenv('MPYC_TPU_TRACE_JAX') and 'jax' not in sys.modules:
                import traceback
                traceback.print_stack()
            mod = importlib.import_module(
                object.__getattribute__(self, '_name'))
            object.__setattr__(self, '_mod', mod)
            flush_on_load()
        return mod

    def __getattr__(self, attr):
        return getattr(self._load(), attr)

    def __repr__(self):
        name = object.__getattribute__(self, '_name')
        state = 'loaded' if object.__getattribute__(self, '_mod') else 'lazy'
        return f'<lazy module {name!r} ({state})>'


jax = _LazyModule('jax')
jnp = _LazyModule('jax.numpy')
lax = _LazyModule('jax.lax')


def jit(fn=None, **jit_kwargs):
    """Deferred ``jax.jit``: the wrapper jits on first call.

    Usable as ``@jit`` or ``@jit(static_argnums=...)`` at module level in
    modules that must import without pulling in jax.
    """
    if fn is None:
        def deco(f):
            return jit(f, **jit_kwargs)
        return deco

    box = []

    def wrapper(*args, **kwargs):
        if not box:
            import jax as _jax
            box.append(_jax.jit(fn, **jit_kwargs))
        return box[0](*args, **kwargs)

    wrapper.__name__ = getattr(fn, '__name__', 'jitted')
    wrapper.__doc__ = fn.__doc__
    wrapper.__wrapped__ = fn
    return wrapper


def loaded() -> bool:
    """True once the real jax module has been imported."""
    import sys
    return 'jax' in sys.modules


_on_load = []


def on_jax_load(cb):
    """Run cb() now if jax is loaded, else queue it for when it loads.

    Used to defer one-time jax registrations (pytree nodes for the field
    array classes) out of the jax-free scalar plane. Queued callbacks run
    when any lazy proxy materializes; paths that import jax directly
    (simulator plane, compile cache) call flush_on_load() explicitly.
    """
    import sys
    if 'jax' in sys.modules:
        cb()
    else:
        _on_load.append(cb)


def flush_on_load():
    import sys
    if 'jax' not in sys.modules:
        return
    while _on_load:
        _on_load.pop(0)()


def is_tracer(x) -> bool:
    """isinstance(x, jax.core.Tracer) without forcing the jax import."""
    import sys
    if 'jax' not in sys.modules:
        return False
    import jax as _jax
    return isinstance(x, _jax.core.Tracer)


def is_jax_array(x) -> bool:
    """isinstance(x, jax.Array) without forcing the jax import."""
    import sys
    if 'jax' not in sys.modules:
        return False
    import jax as _jax
    return isinstance(x, _jax.Array)
