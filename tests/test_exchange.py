"""Mock-transport framing tests for the host exchange layer.

Pattern of the reference's tests/test_asyncoro.py:10-70: drive the protocol
objects directly with a fake transport (no sockets), byte-by-byte, checking
the `<qI payload>` framing, the pid+PRSS-key handshake, and out-of-order
pc-keyed buffering (reference asyncoro.py:39-114).
"""
import struct
from types import SimpleNamespace

import mpyc_tpu.parallel.exchange as exchange


class FakeTransport:
    def __init__(self):
        self.written = bytearray()

    def write(self, data):
        self.written.extend(data)

    def set_write_buffer_limits(self, n):
        pass


class FakeExchange:
    """Minimal stand-in for TcpExchange: records registrations/deliveries."""

    def __init__(self, pid=0, keys=()):
        self.rt = SimpleNamespace(pid=pid)
        self._keys = [bytes(k) for k in keys]
        self.registered = []        # (peer_pid, protocol, keys)
        self.delivered = []         # (peer_pid, pc, payload)
        self.closing = False

    def prss_keys_for_peer(self, peer_pid):
        return self._keys

    def register_peer(self, pid, proto, keys):
        self.registered.append((pid, proto, keys))

    def deliver(self, pid, pc, payload):
        self.delivered.append((pid, pc, payload))


HDR = struct.Struct('<qI')


def handshake_bytes(pid, keys=()):
    return struct.pack('<iI', pid, len(keys)) + b''.join(keys)


def test_dialer_sends_handshake_on_connect():
    ex = FakeExchange(pid=2, keys=[b'\x11' * 16])
    proto = exchange._PeerProtocol(ex, peer_pid=0)  # we dialed party 0
    tr = FakeTransport()
    proto.connection_made(tr)
    assert bytes(tr.written) == handshake_bytes(2, [b'\x11' * 16])


def test_acceptor_handshake_and_reply():
    # server side: peer pid learned from the incoming handshake, then replies
    ex = FakeExchange(pid=0, keys=[b'\x22' * 16])
    proto = exchange._PeerProtocol(ex, peer_pid=None)
    tr = FakeTransport()
    proto.connection_made(tr)
    assert tr.written == bytearray()  # acceptor waits for the dialer
    hs = handshake_bytes(1, [b'\x33' * 16])
    for i in range(len(hs)):          # byte-by-byte: partial reads buffered
        proto.data_received(hs[i:i + 1])
    assert proto.peer_pid == 1
    assert ex.registered and ex.registered[0][0] == 1
    assert ex.registered[0][2] == [b'\x33' * 16]
    assert bytes(tr.written) == handshake_bytes(0, [b'\x22' * 16])


def test_frame_parsing_byte_by_byte():
    ex = FakeExchange(pid=0)
    proto = exchange._PeerProtocol(ex, peer_pid=1)
    proto.connection_made(FakeTransport())
    proto._handshaken = True
    msg1 = HDR.pack(7, 3) + b'abc'
    msg2 = HDR.pack(-12345, 0)        # pc is signed int64; empty payload ok
    msg3 = HDR.pack(2**40, 5) + b'hello'
    stream = msg1 + msg2 + msg3
    for i in range(len(stream)):
        proto.data_received(stream[i:i + 1])
    assert ex.delivered == [(1, 7, b'abc'), (1, -12345, b''),
                            (1, 2**40, b'hello')]


def test_send_frame_format():
    ex = FakeExchange(pid=0)
    proto = exchange._PeerProtocol(ex, peer_pid=1)
    tr = FakeTransport()
    proto.connection_made(tr)
    tr.written.clear()
    proto.send_frame(99, b'payload')
    assert bytes(tr.written) == HDR.pack(99, 7) + b'payload'


def test_out_of_order_pc_buffering():
    # receive() blocks per (pid, pc); frames arriving in any order are
    # demultiplexed by pc like the reference's pc->Future buffers
    ex = exchange.TcpExchange.__new__(exchange.TcpExchange)
    import threading
    ex.rt = SimpleNamespace(pid=0)
    ex.closing = False
    ex.nbytes_sent = 0
    ex._peers = {}
    ex._msgs = {}
    ex._cond = threading.Condition()
    ex.deliver(1, 5, b'second')
    ex.deliver(1, 4, b'first')
    assert ex.receive(1, 4) == b'first'
    assert ex.receive(1, 5) == b'second'


def test_interleaved_peers():
    ex = exchange.TcpExchange.__new__(exchange.TcpExchange)
    import threading
    ex.rt = SimpleNamespace(pid=0)
    ex.closing = False
    ex.nbytes_sent = 0
    ex._peers = {}
    ex._msgs = {}
    ex._cond = threading.Condition()
    ex.deliver(2, 9, b'from2')
    ex.deliver(1, 9, b'from1')
    assert ex.receive(1, 9) == b'from1'
    assert ex.receive(2, 9) == b'from2'
