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

import asyncio
import struct

runtime = None  # set by mpyc_tpu.runtime.setup


def mpc_coro(func, pc=True):
    """Identity decorator (reference: asyncoro.py:411-464); ops are eager."""
    return func


def mpc_coro_no_pc(func):
    return mpc_coro(func, pc=False)


def _contains_future(x):
    if isinstance(x, asyncio.Future):
        return True
    if isinstance(x, (list, tuple)):
        return any(_contains_future(v) for v in x)
    return False


async def _await_nested(x):
    if isinstance(x, asyncio.Future):
        return await x
    if isinstance(x, list):
        return [await _await_nested(v) for v in x]
    if isinstance(x, tuple):
        return tuple([await _await_nested(v) for v in x])
    return x


def gather_shares(rt, *obj):
    """Resolve shares: eager values pass through unchanged; genuine
    asyncio Futures (reference-style dataflow) are awaited
    (reference asyncoro.py:193-273)."""
    res = obj[0] if len(obj) == 1 else obj
    if _contains_future(res):
        return _await_nested(res)
    return res


def returnType(*args, **kwargs):
    """No-op placeholder declaration (reference: asyncoro.py:336-375)."""
    return None


def exception_handler(loop, context):
    """Asyncio loop exception handler (reference: asyncoro.py:467-477).

    Rounds are eager here, so protocol errors raise at the call site with
    ordinary tracebacks; this handler only covers stray transport tasks.
    """
    loop.default_exception_handler(context)


class MessageExchanger(asyncio.Protocol):
    """Reference-compatible per-peer wire protocol (asyncoro.py:15-129).

    Wire format: client handshake = 2-byte LE pid followed by this party's
    PRSS keys for the pair; every message = ``<qI>`` header (pc int64,
    size uint32) + payload.  Out-of-order arrivals are buffered per pc;
    receive() hands out a Future when data has not arrived yet.

    The production transports (parallel/exchange.py, parallel/cpp_exchange.py)
    drive whole meshes; this class exists for API parity and for driving a
    single connection with mock transports.
    """

    __slots__ = ('runtime', 'peer_pid', 'bytes', 'buffers', 'transport',
                 'nbytes_sent')

    def __init__(self, rt, peer_pid=None):
        self.runtime = rt
        self.peer_pid = peer_pid  # None: act as server for this connection
        self.bytes = bytearray()
        self.buffers = {}         # pc -> payload bytes or Future
        self.transport = None
        self.nbytes_sent = 0

    def connection_made(self, transport):
        self.transport = transport
        if self.peer_pid is not None:  # we are the client: send pid + keys
            rt = self.runtime
            pid_keys = [rt.pid.to_bytes(2, 'little')]
            if not rt.options.no_prss:
                pid_keys.extend(rt._prss_keys_to_peer(self.peer_pid))
            transport.writelines(pid_keys)
            rt.set_protocol(self.peer_pid, self)

    def send(self, pc, payload):
        n = len(payload)
        self.transport.write(struct.pack('<qI', pc, n) + payload)
        self.nbytes_sent += 12 + n

    def data_received(self, data):
        self.bytes.extend(data)
        buf = self.bytes
        if self.peer_pid is None:  # awaiting the client's handshake
            if len(buf) < 2:
                return
            peer_pid = int.from_bytes(buf[:2], 'little')
            rt = self.runtime
            if not rt.options.no_prss:
                len_packet = rt._prss_keys_from_peer(peer_pid)
                if len(buf) < len_packet + 2:
                    return
            self.peer_pid = peer_pid
            del buf[:2]
            if not rt.options.no_prss:
                rt._prss_keys_from_peer(peer_pid, bytes(buf[:len_packet]))
                del buf[:len_packet]
            rt.set_protocol(peer_pid, self)
        while len(buf) >= 12:
            pc, n = struct.unpack_from('<qI', buf)
            if len(buf) < 12 + n:
                break
            payload = bytes(buf[12:12 + n])
            del buf[:12 + n]
            if pc in self.buffers:
                self.buffers.pop(pc).set_result(payload)
            else:
                self.buffers[pc] = payload

    def receive(self, pc):
        payload = self.buffers.pop(pc, None)
        if payload is None:  # not yet arrived: hand out a Future
            payload = self.buffers[pc] = asyncio.Future(
                loop=self.runtime._loop)
        return payload

    def connection_lost(self, exc):
        if exc:
            raise exc

        self.runtime.unset_protocol(self.peer_pid)

    def close_connection(self):
        self.transport.close()


# API-compat re-exports: the reference defines SecureObject in asyncoro
# (asyncoro.py:132-177); in the TPU build it lives with the type system.
from mpyc_tpu.sectypes import SecureObject  # noqa: E402,F401
