"""ctypes bindings for the native C++ transport (mpyc_tpu/native/transport.cpp).

Builds the shared library on first use (g++, no pip/pybind11 dependency) and
exposes the same Exchange interface as the asyncio backend
(mpyc_tpu/parallel/exchange.py); the wire format is identical, so C++ and
Python parties interoperate. Select with MPYC_TPU_TRANSPORT=cpp|python
(default: cpp when a compiler is available).
"""

from __future__ import annotations

import ctypes
import itertools
import logging
import os
import subprocess
import threading

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'native')
_SRC = os.path.join(_NATIVE_DIR, 'transport.cpp')
_SO = os.path.join(_NATIVE_DIR, 'libmpyc_tpu_transport.so')

_lib = None
_lib_lock = threading.Lock()


def _build_and_load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or \
                os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            # unique tmp + atomic rename: forked peers may build
            # concurrently (a shared -o target would corrupt the .so)
            tmp = _SO + '.tmp.%d' % os.getpid()
            cmd = ['g++', '-O2', '-shared', '-fPIC', '-std=c++17',
                   '-o', tmp, _SRC, '-lpthread']
            logger.info('building native transport: %s', ' '.join(cmd))
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp, _SO)
        lib = ctypes.CDLL(_SO)
        lib.mx_create.restype = ctypes.c_void_p
        lib.mx_create.argtypes = [
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_char_p]
        lib.mx_wait_connected.restype = ctypes.c_int
        lib.mx_wait_connected.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.mx_send.restype = ctypes.c_int
        lib.mx_send.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                ctypes.c_int64, ctypes.c_char_p,
                                ctypes.c_uint32]
        lib.mx_recv.restype = ctypes.c_int64
        lib.mx_recv.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                ctypes.c_int64, ctypes.c_char_p,
                                ctypes.c_int64, ctypes.c_int]
        lib.mx_peer_keys.restype = ctypes.c_int
        lib.mx_peer_keys.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                     ctypes.c_char_p, ctypes.c_int]
        lib.mx_nbytes_sent.restype = ctypes.c_uint64
        lib.mx_nbytes_sent.argtypes = [ctypes.c_void_p]
        lib.mx_error.restype = ctypes.c_char_p
        lib.mx_error.argtypes = [ctypes.c_void_p]
        lib.mx_stop.restype = None
        lib.mx_stop.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def available() -> bool:
    try:
        _build_and_load()
        return True
    except Exception as e:  # compiler missing, build failure, ...
        logger.info('native transport unavailable: %s', e)
        return False


class CppExchange:
    """Native epoll transport with the TcpExchange interface."""

    def __init__(self, runtime):
        self.rt = runtime
        self._h = None
        self.lib = _build_and_load()

    # PRSS key layout helpers (reference: runtime.py:118-143)

    def _keys_for_peers(self):
        rt = self.rt
        m = len(rt.parties)
        t = rt.threshold
        if rt.options.no_prss:
            return [0] * m, b''
        counts = []
        blob = b''
        for peer in range(m):
            ks = []
            for subset in itertools.combinations(range(m), m - t):
                if subset[0] == rt.pid and peer in subset and peer != rt.pid:
                    ks.append(rt._prss_keys[subset])
            counts.append(len(ks))
            blob += b''.join(ks)
        return counts, blob

    def _store_peer_keys(self, peer, blob):
        rt = self.rt
        if rt.options.no_prss:
            assert not blob, 'unexpected PRSS keys in no-PRSS mode'
            return
        m = len(rt.parties)
        t = rt.threshold
        i = 0
        for subset in itertools.combinations(range(m), m - t):
            if subset[0] == peer and rt.pid in subset:
                rt._prss_keys[subset] = blob[16 * i:16 * (i + 1)]
                i += 1
        assert 16 * i == len(blob), 'PRSS key count mismatch'

    def start(self):
        rt = self.rt
        m = len(rt.parties)
        hosts = (ctypes.c_char_p * m)(
            *[(p.host or 'localhost').encode() for p in rt.parties])
        ports = (ctypes.c_int * m)(*[p.port or 0 for p in rt.parties])
        counts, blob = self._keys_for_peers()
        counts_c = (ctypes.c_int * m)(*counts)
        self._h = self.lib.mx_create(rt.pid, m, hosts, ports, counts_c, blob)
        err = self.lib.mx_error(self._h)
        if err:
            raise RuntimeError(f'native transport: {err.decode()}')
        if self.lib.mx_wait_connected(self._h, 60000) != 0:
            raise RuntimeError('native transport: mesh setup timed out')
        for peer in range(m):
            if peer == rt.pid:
                continue
            n = self.lib.mx_peer_keys(self._h, peer, None, 0)
            buf = ctypes.create_string_buffer(n)
            self.lib.mx_peer_keys(self._h, peer, buf, n)
            self._store_peer_keys(peer, buf.raw[:n])
        rt.prfs.cache_clear()

    def stop(self):
        if self._h is not None:
            self.lib.mx_stop(self._h)
            self._h = None

    def send(self, peer, pc, payload: bytes):
        self.lib.mx_send(self._h, peer, pc, payload, len(payload))

    def receive(self, peer, pc, timeout=120, nbytes=None) -> bytes:
        if nbytes:
            # known frame size (native protocol rounds): one call, one
            # buffer — skips the size-query round trip into the library
            buf = ctypes.create_string_buffer(nbytes)
            got = self.lib.mx_recv(self._h, peer, pc, buf, nbytes,
                                   int(timeout * 1000))
            if got >= 0:
                return buf.raw[:int(got)]
            if got == -1:
                raise TimeoutError(
                    f'no message from party {peer} with pc={pc} (native)')
            # -2: larger than expected — fall through to the generic path
        n = self.lib.mx_recv(self._h, peer, pc, None, 0,
                             int(timeout * 1000))
        if n < 0:
            raise TimeoutError(
                f'no message from party {peer} with pc={pc} (native)')
        buf = ctypes.create_string_buffer(int(n) if n else 1)
        got = self.lib.mx_recv(self._h, peer, pc, buf, n, 1000)
        if got < 0:
            raise RuntimeError('native transport: message vanished')
        return buf.raw[:int(got)]

    @property
    def nbytes_sent(self):
        return int(self.lib.mx_nbytes_sent(self._h))
