"""Compatibility shims for the reference's asyncio layer.

The reference (mpyc/asyncoro.py) hides network latency behind asyncio
futures and an mpc_coro decorator. This framework executes protocol ops as
eager synchronous rounds (jitted device kernels between pc-tagged
exchanges), so these shims keep reference-style user code working:

  * ``mpc_coro``/``mpc_coro_no_pc`` — identity decorators (ops are eager);
  * ``gather_shares``/``Runtime.gather`` — pass-through (shares concrete);
  * ``returnType`` — no-op placeholder declaration.

User programs written against the reference API — ``mpc.run(mpc.output(x))``
etc. — behave identically.
"""

runtime = None  # set by mpyc_tpu.runtime.setup


def mpc_coro(func, pc=True):
    """Identity decorator (reference: asyncoro.py:411-464); ops are eager."""
    return func


def mpc_coro_no_pc(func):
    return mpc_coro(func, pc=False)


def gather_shares(rt, *obj):
    """Resolve shares: eager values pass through unchanged."""
    if len(obj) == 1:
        return obj[0]
    return obj


def returnType(*args, **kwargs):
    """No-op placeholder declaration (reference: asyncoro.py:336-375)."""
    return None


def exception_handler(loop, context):
    """Asyncio loop exception handler (reference: asyncoro.py:467-477).

    Rounds are eager here, so protocol errors raise at the call site with
    ordinary tracebacks; this handler only covers stray transport tasks.
    """
    loop.default_exception_handler(context)


# API-compat re-exports: the reference defines SecureObject and the wire
# protocol class in asyncoro (asyncoro.py:15-177); in the TPU build they
# live with the type system and the host transport respectively.
from mpyc_tpu.sectypes import SecureObject  # noqa: E402,F401
from mpyc_tpu.parallel.exchange import TcpExchange as MessageExchanger  # noqa: E402,F401
