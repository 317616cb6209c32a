"""ctypes wrapper for the native host-plane GF(p) batch kernels
(native/hostfield.cpp), p < 2^64.

The per-party deployment plane computes on host CPU (each party is a
separate mutually-distrusting process; the reference's local kernels are
GMP bignum loops, mpyc/thresha.py:23-44 + finfields object arrays).  For
large share batches the Python-object bigint path costs ~5-10 us per
element-op; these C kernels do ~5-10 ns.  Values are uint64 Montgomery
residues with radix R = 2^(32*L) — the same radix as the uint32-limb
device representation, so a C-contiguous (..., 2) uint32 limb array *is*
a (...,) uint64 array by memory view (little-endian hosts).
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
_SRC = os.path.join(_DIR, 'hostfield.cpp')
_SO = os.path.join(_DIR, 'libmpyc_tpu_hostfield.so')

_lib = None
_lib_failed = False
_lock = threading.Lock()

_U64P = ctypes.POINTER(ctypes.c_uint64)
_U8P = ctypes.POINTER(ctypes.c_uint8)
_LL = ctypes.c_longlong
_U64 = ctypes.c_uint64
_INT = ctypes.c_int


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
                tmp = _SO + '.tmp.%d' % os.getpid()
                # -march=native: the 8-lane ChaCha batch vectorizes to
                # ~1.3 GB/s with AVX2 vs ~0.7 GB/s baseline; fall back to
                # plain -O2 on compilers/targets where it fails
                for extra in (['-march=native'], []):
                    cmd = ['g++', '-O2', *extra, '-shared', '-fPIC',
                           '-std=c++17', '-o', tmp, _SRC]
                    logger.info('building native hostfield: %s',
                                ' '.join(cmd))
                    r = subprocess.run(cmd, capture_output=True)
                    if r.returncode == 0:
                        break
                else:
                    r.check_returncode()
                os.replace(tmp, _SO)
            lib = ctypes.CDLL(_SO)
            for name, argtypes in (
                ('hf_mul', [_U64P, _U64P, _U64P, _LL, _U64, _U64, _INT]),
                ('hf_add', [_U64P, _U64P, _U64P, _LL, _U64]),
                ('hf_sub', [_U64P, _U64P, _U64P, _LL, _U64]),
                ('hf_neg', [_U64P, _U64P, _LL, _U64]),
                ('hf_mulc', [_U64P, _U64, _U64P, _LL, _U64, _U64, _INT]),
                ('hf_split', [_U64P, _U64P, _U64P, _U64P, _LL, _INT, _INT,
                              _U64, _U64, _INT]),
                ('hf_to_wire', [_U64P, _U8P, _LL, _INT, _U64, _U64, _INT]),
                ('hf_from_wire', [_U8P, _U64P, _LL, _INT, _U64, _U64, _U64,
                                  _INT]),
                ('hf_axpy', [_U64P, _U64P, _U64, _LL, _U64, _U64, _INT]),
                ('hf_axpy_wire', [_U64P, _U8P, _U64, _LL, _INT, _U64, _U64,
                                  _INT]),
                ('hf_stream_mont', [_U8P, _U64P, _LL, _INT, _U64, _U64,
                                    _U64, _INT]),
                ('hf_chacha_stream', [_U8P, _U8P, _U8P, _LL]),
                ('hf_stream_uniform', [_U8P, _U64P, _LL, _INT, _U64, _U64,
                                       _U64P, _INT]),
                ('hf_to_plain', [_U64P, _U64P, _LL, _U64, _U64, _INT]),
                ('hf_from_plain', [_U64P, _U64P, _LL, _U64, _U64, _U64,
                                   _INT]),
            ):
                fn = getattr(lib, name)
                fn.restype = ctypes.c_int
                fn.argtypes = argtypes
            _lib = lib
        except Exception as exc:   # no compiler / build failure
            logger.info('native hostfield unavailable: %s', exc)
            _lib_failed = True
    return _lib


def available(p: int) -> bool:
    """True iff the native kernels serve GF(p)."""
    return p % 2 == 1 and 2 < p < (1 << 64) and _load() is not None


def _p64(a: np.ndarray):
    return a.ctypes.data_as(_U64P)


def _p8(a):
    if isinstance(a, (bytes, bytearray)):
        return ctypes.cast(ctypes.c_char_p(bytes(a)), _U8P)
    return a.ctypes.data_as(_U8P)


class HostFieldCtx:
    """Per-field kernel facade (p odd, < 2^64)."""

    def __init__(self, ctx):
        # ctx: ops.fieldops.PrimeFieldCtx (supplies p, L, R2 etc.)
        self.ctx = ctx
        self.p = p = ctx.p
        self.L = L = ctx.L
        assert 1 <= L <= 2
        R = 1 << (32 * L)
        self.n0 = (-pow(p, -1, R)) % R
        self.r2 = R * R % p
        self.imont = {}            # i -> mont(i), cached
        self._c_n0 = _U64(self.n0)
        self._c_p = _U64(p)
        self._c_r2 = _U64(self.r2)
        self._c_l32 = _INT(L)

    # -- representation plumbing -------------------------------------------

    def mont_u64(self, data) -> np.ndarray:
        """Host field data (object rep / uint32 limb rep) -> flat uint64
        Montgomery array (copy only when the input is not viewable)."""
        data = np.asarray(data)
        if data.dtype == object:
            # (..., 1) object rep of Montgomery ints
            return data.reshape(-1).astype(np.uint64)
        if data.dtype == np.uint32:
            if self.L == 1:
                return data.reshape(-1).astype(np.uint64)
            a = np.ascontiguousarray(data)
            return a.view(np.uint64).reshape(-1)
        if data.dtype == np.uint64:
            return data.reshape(-1)
        raise TypeError(f'unsupported host rep dtype {data.dtype}')

    def limb_rep(self, u64s: np.ndarray, shape) -> np.ndarray:
        """Flat uint64 Montgomery array -> canonical (..., L) uint32 limbs
        (a view for L == 2)."""
        if self.L == 1:
            return u64s.astype(np.uint32).reshape(tuple(shape) + (1,))
        return u64s.view(np.uint32).reshape(tuple(shape) + (2,))

    # -- elementwise kernels -----------------------------------------------

    def mul(self, a, b):
        out = np.empty(a.shape[0], np.uint64)
        _lib.hf_mul(_p64(a), _p64(b), _p64(out), a.shape[0],
                    self._c_p, self._c_n0, self._c_l32)
        return out

    def add(self, a, b):
        out = np.empty(a.shape[0], np.uint64)
        _lib.hf_add(_p64(a), _p64(b), _p64(out), a.shape[0], self._c_p)
        return out

    def sub(self, a, b):
        out = np.empty(a.shape[0], np.uint64)
        _lib.hf_sub(_p64(a), _p64(b), _p64(out), a.shape[0], self._c_p)
        return out

    def neg(self, a):
        out = np.empty(a.shape[0], np.uint64)
        _lib.hf_neg(_p64(a), _p64(out), a.shape[0], self._c_p)
        return out

    def mulc(self, a, c_mont: int):
        out = np.empty(a.shape[0], np.uint64)
        _lib.hf_mulc(_p64(a), _U64(c_mont), _p64(out), a.shape[0],
                     self._c_p, self._c_n0, self._c_l32)
        return out

    # -- protocol kernels --------------------------------------------------

    def mont_i(self, i: int) -> int:
        v = self.imont.get(i)
        if v is None:
            v = self.imont[i] = i % self.p * (1 << (32 * self.L)) % self.p
        return v

    def split(self, sec: np.ndarray, coefs: np.ndarray, t: int, m: int):
        """(n,) secrets + (t*n,) coefficients -> (m, n) share rows (mont)."""
        n = sec.shape[0]
        rows = np.empty((m, n), np.uint64)
        im = np.array([self.mont_i(i) for i in range(1, m + 1)], np.uint64)
        _lib.hf_split(_p64(sec), _p64(coefs), _p64(im), _p64(rows),
                      n, t, m, self._c_p, self._c_n0, self._c_l32)
        return rows

    def to_wire(self, a: np.ndarray, bl: int) -> bytes:
        out = np.empty(a.shape[0] * bl, np.uint8)
        _lib.hf_to_wire(_p64(a), _p8(out), a.shape[0], bl,
                        self._c_p, self._c_n0, self._c_l32)
        return out.tobytes()

    def from_wire(self, data, n: int, bl: int) -> np.ndarray:
        buf = np.frombuffer(data, dtype=np.uint8, count=n * bl)
        out = np.empty(n, np.uint64)
        _lib.hf_from_wire(_p8(buf), _p64(out), n, bl,
                          self._c_p, self._c_n0, self._c_r2, self._c_l32)
        return out

    def axpy(self, acc: np.ndarray, row: np.ndarray, c: int):
        """acc += row * c in place (c a plain int mod p)."""
        cm = c % self.p * (1 << (32 * self.L)) % self.p
        _lib.hf_axpy(_p64(acc), _p64(row), _U64(cm), acc.shape[0],
                     self._c_p, self._c_n0, self._c_l32)

    def axpy_wire(self, acc: np.ndarray, data, n: int, bl: int, c: int):
        """acc += wire_row * c in place (one fused pass off the wire)."""
        buf = np.frombuffer(data, dtype=np.uint8, count=n * bl)
        cr2 = c % self.p * self.r2 % self.p
        _lib.hf_axpy_wire(_p64(acc), _p8(buf), _U64(cr2), n, bl,
                          self._c_p, self._c_n0, self._c_l32)

    def stream_mont(self, stream: bytes, n: int, l: int) -> np.ndarray:
        """l-byte LE chunks of a SHAKE stream -> uniform mont residues."""
        buf = np.frombuffer(stream, dtype=np.uint8, count=n * l)
        out = np.empty(n, np.uint64)
        rc = _lib.hf_stream_mont(_p8(buf), _p64(out), n, l,
                                 self._c_p, self._c_n0, self._c_r2,
                                 self._c_l32)
        assert rc == 0
        return out

    @property
    def _uniform_l(self) -> int:
        """Stream bytes per uniform draw: 2 R-digits at L==2, 3 at L==1
        (bias < 2^-64 either way)."""
        return 16 if self.L == 2 else 12

    def stream_uniform(self, stream, n: int) -> np.ndarray:
        """_uniform_l-byte LE chunks -> exact mont(v) residues (no wide
        division: one montmul per R-digit against precomputed R-powers)."""
        l = self._uniform_l
        buf = np.frombuffer(stream, dtype=np.uint8, count=n * l)
        rpow = getattr(self, '_rpow', None)
        if rpow is None:
            R = 1 << (32 * self.L)
            k = l // (4 * self.L)
            rpow = self._rpow = np.array(
                [pow(R, d + 2, self.p) for d in range(k)], np.uint64)
        out = np.empty(n, np.uint64)
        rc = _lib.hf_stream_uniform(_p8(buf), _p64(out), n, l,
                                    self._c_p, self._c_n0, _p64(rpow),
                                    self._c_l32)
        assert rc == 0
        return out

    def chacha_uniform(self, key: bytes, nonce12: bytes, n: int) -> np.ndarray:
        """n uniform mont residues from a ChaCha20 keystream (party-private
        randomness: Shamir coefficients, blinding masks)."""
        l = self._uniform_l
        kb = np.frombuffer(key, dtype=np.uint8, count=32)
        nb = np.frombuffer(nonce12, dtype=np.uint8, count=12)
        stream = np.empty(n * l, np.uint8)
        _lib.hf_chacha_stream(_p8(kb), _p8(nb), _p8(stream), n * l)
        return self.stream_uniform(stream, n)

    def to_plain(self, a: np.ndarray) -> np.ndarray:
        out = np.empty(a.shape[0], np.uint64)
        _lib.hf_to_plain(_p64(a), _p64(out), a.shape[0],
                         self._c_p, self._c_n0, self._c_l32)
        return out

    def from_plain(self, a: np.ndarray) -> np.ndarray:
        out = np.empty(a.shape[0], np.uint64)
        _lib.hf_from_plain(_p64(a), _p64(out), a.shape[0],
                           self._c_p, self._c_n0, self._c_r2, self._c_l32)
        return out


_ctx_cache = {}


def host_ctx(ctx):
    """HostFieldCtx for a PrimeFieldCtx, or None if unavailable."""
    hf = _ctx_cache.get(ctx.p)
    if hf is None:
        if not available(ctx.p):
            return None
        hf = _ctx_cache[ctx.p] = HostFieldCtx(ctx)
    return hf
