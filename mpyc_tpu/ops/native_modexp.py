"""ctypes wrapper for the native batched modexp (native/modexp.cpp).

CPython pow(x, e, p) costs ~27 us per 87-bit exponentiation (no GMP in
this environment); the C kernel does ~1-2 us with 64-bit-limb CIOS
Montgomery arithmetic, shared exponent, one call per batch.  Used by the
host protocol plane for pow_/sqrt/legendre/inverse kernels.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'native')
_SRC = os.path.join(_DIR, 'modexp.cpp')
_SO = os.path.join(_DIR, 'libmpyc_tpu_modexp.so')

_lib = None
_lib_failed = False
_lock = threading.Lock()


def _load():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        try:
            if not os.path.exists(_SO) or \
                    os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                # unique tmp + atomic rename: forked peers may build
                # concurrently (a shared -o target would corrupt the .so)
                tmp = _SO + '.tmp.%d' % os.getpid()
                cmd = ['g++', '-O2', '-shared', '-fPIC', '-std=c++17',
                       '-o', tmp, _SRC]
                logger.info('building native modexp: %s', ' '.join(cmd))
                subprocess.run(cmd, check=True, capture_output=True)
                os.replace(tmp, _SO)
            lib = ctypes.CDLL(_SO)
            lib.bm_powmod.restype = ctypes.c_int
            lib.bm_powmod.argtypes = [
                ctypes.POINTER(ctypes.c_uint64), ctypes.c_longlong,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint64), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint64), ctypes.c_int]
            _lib = lib
        except Exception as exc:   # no compiler / build failure
            logger.info('native modexp unavailable: %s', exc)
            _lib_failed = True
    return _lib


def available(p: int) -> bool:
    return p % 2 == 1 and p.bit_length() <= 512 and _load() is not None


def _pack(vals, L: int) -> np.ndarray:
    raw = b''.join(int(v).to_bytes(8 * L, 'little') for v in vals)
    return np.frombuffer(raw, dtype=np.uint64).copy()


def powmod_batch(vals, e: int, p: int, mont_io: bool = False):
    """[x^e mod p for x in vals] as a list of ints (shared exponent e > 0).

    With mont_io=True, inputs and outputs are Montgomery-domain residues
    for R = 2^(64*ceil(bits(p)/64)) — matching the host protocol plane's
    Montgomery-int views when L_64 limbs align (p.bit_length() maps to
    the same R as the uint32-limb convention iff ceil(bits/32) is even).
    """
    lib = _load()
    assert lib is not None
    L = (p.bit_length() + 63) // 64
    n = len(vals)
    if n == 0:
        return []
    xs = _pack(vals, L)
    ebuf = _pack([e], max((int(e).bit_length() + 63) // 64, 1))
    pbuf = _pack([p], L)
    out = np.empty(n * L, dtype=np.uint64)
    rc = lib.bm_powmod(
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), n, L,
        ebuf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ebuf.shape[0],
        pbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        1 if mont_io else 0)
    assert rc == 0, f'bm_powmod failed: {rc}'
    raw = out.tobytes()
    step = 8 * L
    return [int.from_bytes(raw[i:i + step], 'little')
            for i in range(0, n * step, step)]
