"""TCP full-mesh share exchange with pc-tagged frames.

Transport parity target: /root/reference/mpyc/asyncoro.py MessageExchanger:
one duplex connection per unordered party pair (party i accepts from j < i
and dials j > i, runtime.py:252-288), frames tagged by the program counter
(`<qI payload>` = pc int64 LE, size uint32 LE, bytes — asyncoro.py:54-64),
out-of-order arrival absorbed by a pc-keyed buffer (asyncoro.py:95-114), and
PRSS keys exchanged in-band during connection setup (asyncoro.py:46-52).

The asyncio loop runs on a background thread; the runtime's eager rounds
perform blocking receive() calls that wait on pc-keyed events. This matches
the explicit round-structured execution model (no dataflow futures).
"""

from __future__ import annotations

import asyncio
import itertools
import logging
import struct
import threading
import time

logger = logging.getLogger(__name__)

_HDR = struct.Struct('<qI')  # (pc: int64, size: uint32)


class _PeerProtocol(asyncio.Protocol):
    """One connection to a peer; parses frames into the exchange buffers."""

    def __init__(self, exchange, peer_pid=None):
        self.exchange = exchange
        self.peer_pid = peer_pid      # known if we dialed; else from handshake
        self.transport = None
        self._buf = bytearray()
        self._handshaken = False

    def connection_made(self, transport):
        self.transport = transport
        transport.set_write_buffer_limits(0)  # send immediately
        # both sides send their handshake: pid + PRSS keys for this pair
        if self.peer_pid is not None:
            self._send_handshake()

    def _send_handshake(self):
        ex = self.exchange
        keys = ex.prss_keys_for_peer(self.peer_pid)
        payload = struct.pack('<iI', ex.rt.pid, len(keys)) + b''.join(keys)
        self.transport.write(payload)

    def data_received(self, data):
        self._buf.extend(data)
        if not self._handshaken:
            if len(self._buf) < 8:
                return
            pid, nkeys = struct.unpack_from('<iI', self._buf, 0)
            need = 8 + 16 * nkeys
            if len(self._buf) < need:
                return
            keys = [bytes(self._buf[8 + 16 * i:24 + 16 * i])
                    for i in range(nkeys)]
            self._buf = self._buf[need:]
            accepted = self.peer_pid is None
            if accepted:
                self.peer_pid = pid
                self._send_handshake()  # reply with our handshake
            self.exchange.register_peer(self.peer_pid, self, keys)
            self._handshaken = True
        while len(self._buf) >= _HDR.size:
            pc, size = _HDR.unpack_from(self._buf, 0)
            if len(self._buf) < _HDR.size + size:
                return
            payload = bytes(self._buf[_HDR.size:_HDR.size + size])
            del self._buf[:_HDR.size + size]
            self.exchange.deliver(self.peer_pid, pc, payload)

    def connection_lost(self, exc):
        if exc is not None and not self.exchange.closing:
            logger.error(f'connection to party {self.peer_pid} lost: {exc}')

    def send_frame(self, pc, payload: bytes):
        self.transport.write(_HDR.pack(pc, len(payload)) + payload)


class TcpExchange:
    """Blocking-receive facade over an asyncio TCP mesh on a worker thread."""

    def __init__(self, runtime):
        self.rt = runtime
        self.closing = False
        self.nbytes_sent = 0
        self._peers = {}            # pid -> _PeerProtocol
        self._msgs = {}             # (pid, pc) -> payload
        self._cond = threading.Condition()
        self._loop = None
        self._thread = None
        self._server = None
        self._ready = threading.Event()

    # -- PRSS key plumbing (reference: runtime.py:118-143) ------------------

    def prss_keys_for_peer(self, peer_pid):
        rt = self.rt
        if rt.options.no_prss:
            return []
        m = len(rt.parties)
        t = rt.threshold
        keys = []
        for subset in itertools.combinations(range(m), m - t):
            if subset[0] == rt.pid and peer_pid in subset:
                keys.append(rt._prss_keys[subset])
        return keys

    def store_peer_keys(self, peer_pid, keys):
        rt = self.rt
        if rt.options.no_prss:
            assert not keys, 'unexpected PRSS keys in no-PRSS mode'
            return
        m = len(rt.parties)
        t = rt.threshold
        i = 0
        for subset in itertools.combinations(range(m), m - t):
            if subset[0] == peer_pid and rt.pid in subset:
                rt._prss_keys[subset] = keys[i]
                i += 1
        assert i == len(keys), 'PRSS key count mismatch'

    # -- lifecycle ----------------------------------------------------------

    def start(self):
        self._thread = threading.Thread(target=self._run_loop, daemon=True)
        self._thread.start()
        if not self._ready.wait(timeout=60):
            raise RuntimeError('TCP mesh setup timed out')

    def _run_loop(self):
        self._loop = asyncio.new_event_loop()
        asyncio.set_event_loop(self._loop)
        self._loop.run_until_complete(self._setup())
        self._ready.set()
        self._loop.run_forever()
        # drain callbacks after stop
        self._loop.run_until_complete(asyncio.sleep(0))
        self._loop.close()

    def _ssl_context(self, server: bool):
        """Mutual-TLS context from the .config/ cert layout
        (reference runtime.py:246-259,271-278)."""
        import ssl
        from mpyc_tpu.utils import certs
        crt, key, ca = certs.cert_paths(self.rt.pid)
        if server:
            ctx = ssl.create_default_context(ssl.Purpose.CLIENT_AUTH)
            ctx.verify_mode = ssl.CERT_REQUIRED
        else:
            ctx = ssl.create_default_context(ssl.Purpose.SERVER_AUTH)
        ctx.load_cert_chain(crt, keyfile=key)
        ctx.load_verify_locations(cafile=ca)
        return ctx

    async def _setup(self):
        rt = self.rt
        m = len(rt.parties)
        my = rt.parties[rt.pid]
        listen_port = my.port
        use_ssl = getattr(rt.options, 'ssl', False)
        if rt.pid > 0:
            self._server = await self._loop.create_server(
                lambda: _PeerProtocol(self), host='', port=listen_port,
                ssl=self._ssl_context(server=True) if use_ssl else None)
        # dial peers with higher pid; they accept from us (lower pid)
        for peer in rt.parties:
            if peer.pid > rt.pid:
                while True:
                    try:
                        if use_ssl:
                            from mpyc_tpu.utils import certs
                            await self._loop.create_connection(
                                lambda p=peer.pid: _PeerProtocol(self, p),
                                host=peer.host, port=peer.port,
                                ssl=self._ssl_context(server=False),
                                server_hostname=certs.party_name(peer.pid))
                        else:
                            await self._loop.create_connection(
                                lambda p=peer.pid: _PeerProtocol(self, p),
                                host=peer.host, port=peer.port)
                        break
                    except OSError:
                        await asyncio.sleep(0.1)
        # wait until every peer registered (handshakes complete)
        while len(self._peers) < m - 1:
            await asyncio.sleep(0.01)

    def stop(self):
        self.closing = True

        def _close():
            for proto in self._peers.values():
                if proto.transport is not None:
                    proto.transport.close()
            if self._server is not None:
                self._server.close()
            self._loop.stop()
        self._loop.call_soon_threadsafe(_close)
        self._thread.join(timeout=10)

    # -- called from the protocol (loop thread) -----------------------------

    def register_peer(self, pid, proto, keys):
        self.store_peer_keys(pid, keys)
        with self._cond:
            self._peers[pid] = proto
            self._cond.notify_all()

    def deliver(self, pid, pc, payload):
        with self._cond:
            self._msgs[(pid, pc)] = payload
            self._cond.notify_all()

    # -- called from the runtime (main thread) ------------------------------

    def send(self, peer_pid, pc, payload: bytes):
        proto = self._peers[peer_pid]
        self.nbytes_sent += len(payload)
        self._loop.call_soon_threadsafe(proto.send_frame, pc, payload)

    def receive(self, peer_pid, pc, timeout=120, nbytes=None):
        # nbytes (expected frame size) is a native-transport fast-path
        # hint; the asyncio backend buffers whole frames anyway
        key = (peer_pid, pc)
        deadline = time.time() + timeout
        with self._cond:
            while key not in self._msgs:
                remaining = deadline - time.time()
                if remaining <= 0:
                    raise TimeoutError(
                        f'no message from party {peer_pid} with pc={pc}')
                self._cond.wait(remaining)
            return self._msgs.pop(key)
