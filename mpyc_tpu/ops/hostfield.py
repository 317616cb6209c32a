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

# pointer arguments are passed as raw addresses (c_void_p): building a
# typed ctypes pointer per argument costs ~3 us — with ~14 pointers per
# protocol round that dominated the fused kernels' call overhead
_U64P = _U32P = _U8P = ctypes.c_void_p
_LL = ctypes.c_longlong
_U64 = ctypes.c_uint64
_U32 = ctypes.c_uint32
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
                ('hf_reshare_send', [_U64P, _LL, _INT, _INT, _INT,
                                     _U8P, _U8P, _U64P, _U64P, _INT, _INT,
                                     _INT, _U64P, _U8P, _U64, _U64, _INT]),
                ('hfg_mul', [_U32P, _U32P, _U32P, _LL, _U32P, _U32, _INT]),
                ('hfg_add', [_U32P, _U32P, _U32P, _LL, _U32P, _U32, _INT]),
                ('hfg_sub', [_U32P, _U32P, _U32P, _LL, _U32P, _U32, _INT]),
                ('hfg_neg', [_U32P, _U32P, _LL, _U32P, _U32, _INT]),
                ('hfg_mulc', [_U32P, _U32P, _U32P, _LL, _U32P, _U32, _INT]),
                ('hfg_to_wire', [_U32P, _U8P, _LL, _INT, _U32P, _U32,
                                 _INT]),
                ('hfg_from_wire', [_U8P, _U32P, _LL, _INT, _U32P, _U32,
                                   _U32P, _INT]),
                ('hfg_stream_uniform', [_U8P, _U32P, _LL, _INT, _U32P,
                                        _U32, _U32P, _INT]),
                ('hfg_prf_fold', [_U8P, _U32P, _LL, _INT, _INT, _INT,
                                  _U32P, _U32, _U32P, _INT]),
                ('hfg_sgn_prepare', [_U32P, _U32P, _U32P, _LL, _INT,
                                     _U32P, _U32P, _U32P, _U32P, _U32P,
                                     _U32P, _U32, _INT]),
                ('hf_keccak_ctr', [_U64P, _INT, _LL, _U32P]),
                ('hfg_reshare_send', [_U32P, _LL, _INT, _INT, _INT,
                                      _U8P, _U8P, _U32P, _U32P, _INT, _INT,
                                      _U32P, _U8P, _U32P, _U32, _INT]),
                ('hfg_recombine_rows', [_U32P, _U32P,
                                        ctypes.POINTER(ctypes.c_void_p),
                                        _U32P, _INT, _U32P, _LL, _INT,
                                        _U32P, _U32, _INT]),
                ('hf_recombine_rows', [_U64P, _U64,
                                       ctypes.POINTER(ctypes.c_void_p),
                                       _U64P, _INT, _U64P, _LL, _INT,
                                       _U64, _U64, _INT]),
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
    return p % 2 == 1 and 2 < p < (1 << 512) and _load() is not None


def _p64(a: np.ndarray):
    return a.ctypes.data


def _p8(a):
    return a.ctypes.data


class HostFieldCtx:
    """Per-field kernel facade (p odd, < 2^64)."""

    stride = 1   # flat-array entries per element (uint64 values)

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

    def obj_rep(self, u64s: np.ndarray, shape) -> np.ndarray:
        """Flat uint64 Montgomery array -> jax-free object rep (..., 1)."""
        return u64s.astype(object).reshape(tuple(shape) + (1,))

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

    def mulc_int(self, a, c: int):
        """a * c for a plain public int c (mont constant built here)."""
        return self.mulc(a, c % self.p * (1 << (32 * self.L)) % self.p)

    def prf_fold(self, raw, n: int, l: int, rate: int,
                 mask_bits: int = -1) -> np.ndarray:
        """SHAKE counter-block chunks -> mont residues, reproducing the
        DevicePRF._host_mont_vals convention (block tails discarded,
        optional bit mask) at C speed."""
        out32 = _prf_fold_impl(self, raw, n, l, rate, mask_bits)
        if self.L == 1:
            return out32.astype(np.uint64)
        return out32.view(np.uint64)

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
        _lib.hf_split(_p64(sec), _p64(coefs), _p64(self._imont_arr(m)),
                      _p64(rows), n, t, m,
                      self._c_p, self._c_n0, self._c_l32)
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
        rpow = self._rpow_arr()
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

    def _imont_arr(self, m: int) -> np.ndarray:
        arr = getattr(self, '_imont_np', None)
        if arr is None or arr.shape[0] < m:
            arr = self._imont_np = np.array(
                [self.mont_i(i) for i in range(1, m + 1)], np.uint64)
        return arr

    def _rpow_arr(self) -> np.ndarray:
        rpow = getattr(self, '_rpow', None)
        if rpow is None:
            R = 1 << (32 * self.L)
            k = self._uniform_l // (4 * self.L)
            rpow = self._rpow = np.array(
                [pow(R, d + 2, self.p) for d in range(k)], np.uint64)
        return rpow

    def reshare_send(self, sec: np.ndarray, t: int, m: int, pid: int,
                     key: bytes, nonce12: bytes, bl: int):
        """Fused send half of a GRR98 round: ChaCha coefficients + Horner
        split + wire marshal in ONE library call.  Returns (own_row mont,
        wire uint8 array of shape (m, n*bl); row pid is unwritten)."""
        n = sec.shape[0]
        l = self._uniform_l
        rpow = self._rpow_arr()
        own = np.empty(n, np.uint64)
        wire = np.empty((m, n * bl), np.uint8)
        kb = np.frombuffer(key, np.uint8)
        nb = np.frombuffer(nonce12, np.uint8)
        rc = _lib.hf_reshare_send(
            _p64(sec), n, t, m, pid, _p8(kb), _p8(nb),
            _p64(self._imont_arr(m)), _p64(rpow), l, l // (4 * self.L),
            bl, _p64(own), _p8(wire), self._c_p, self._c_n0, self._c_l32)
        assert rc == 0, rc
        return own, wire

    def recombine_rows(self, own_row, own_c: int, wires, wire_cs,
                       n: int, bl: int) -> np.ndarray:
        """Fused receive half: out = own_c*own_row + sum c_j*wire_row_j
        in ONE library call.  wires: list of uint8 ndarrays (or buffers);
        own_row may be None."""
        nw = len(wires)
        bufs = [w if isinstance(w, np.ndarray)
                else np.frombuffer(w, np.uint8) for w in wires]
        ptrs = (ctypes.c_void_p * nw)(*[b.ctypes.data for b in bufs])
        cr2 = np.array([c % self.p * self.r2 % self.p for c in wire_cs],
                       np.uint64)
        out = np.empty(n, np.uint64)
        R = 1 << (32 * self.L)
        rc = _lib.hf_recombine_rows(
            _p64(own_row) if own_row is not None else None,
            _U64(own_c % self.p * R % self.p if own_row is not None else 0),
            ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
            _p64(cr2), nw, _p64(out), n, bl,
            self._c_p, self._c_n0, self._c_l32)
        assert rc == 0, rc
        return out

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


class GenericFieldCtx:
    """Per-field kernel facade for any width up to 512 bits (L 32-bit
    limbs, CIOS Montgomery; same radix R = 2^(32L) as the device limb
    representation).  Same method surface as HostFieldCtx; flat arrays
    are uint32 with ``stride = L`` entries per element."""

    def __init__(self, ctx):
        self.ctx = ctx
        self.p = p = ctx.p
        self.L = L = ctx.L
        self.stride = L
        R = 1 << (32 * L)
        self.R = R
        self.n0 = int((-pow(p, -1, 1 << 32)) % (1 << 32))
        self.r2 = R * R % p
        self._c_p = self._limbs(p)
        self._c_r2 = self._limbs(self.r2)
        self._c_n0 = _U32(self.n0)
        self._c_l = _INT(L)
        self._mont_cache = {}

    def _limbs(self, x: int) -> np.ndarray:
        return np.array([(x >> (32 * i)) & 0xFFFFFFFF
                         for i in range(self.L)], np.uint32)

    def _mont_limbs(self, c: int) -> np.ndarray:
        key = c % self.p
        v = self._mont_cache.get(key)
        if v is None and len(self._mont_cache) < 4096:
            v = self._mont_cache[key] = self._limbs(key * self.R % self.p)
        elif v is None:
            v = self._limbs(key * self.R % self.p)
        return v

    # -- representation plumbing -------------------------------------------

    def mont_u64(self, data) -> np.ndarray:
        """Host field data -> flat uint32 limb array (n*L,)."""
        data = np.asarray(data)
        if data.dtype == object:
            from mpyc_tpu.ops import limb as _limb
            ints = data.reshape(-1)
            return _limb.ints_to_limbs(ints, self.L).reshape(-1)
        if data.dtype == np.uint32:
            return np.ascontiguousarray(data).reshape(-1)
        raise TypeError(f'unsupported host rep dtype {data.dtype}')

    def limb_rep(self, flat: np.ndarray, shape) -> np.ndarray:
        return flat.reshape(tuple(shape) + (self.L,))

    def obj_rep(self, flat: np.ndarray, shape) -> np.ndarray:
        from mpyc_tpu.ops import limb as _limb
        ints = _limb.limbs_to_ints(flat.reshape(-1, self.L))
        return ints.reshape(tuple(shape) + (1,))

    # -- elementwise kernels -----------------------------------------------

    def _n(self, a):
        return a.shape[0] // self.L

    def mul(self, a, b):
        out = np.empty(a.shape[0], np.uint32)
        _lib.hfg_mul(_p32(a), _p32(b), _p32(out), self._n(a),
                     _p32(self._c_p), self._c_n0, self._c_l)
        return out

    def add(self, a, b):
        out = np.empty(a.shape[0], np.uint32)
        _lib.hfg_add(_p32(a), _p32(b), _p32(out), self._n(a),
                     _p32(self._c_p), self._c_n0, self._c_l)
        return out

    def sub(self, a, b):
        out = np.empty(a.shape[0], np.uint32)
        _lib.hfg_sub(_p32(a), _p32(b), _p32(out), self._n(a),
                     _p32(self._c_p), self._c_n0, self._c_l)
        return out

    def neg(self, a):
        out = np.empty(a.shape[0], np.uint32)
        _lib.hfg_neg(_p32(a), _p32(out), self._n(a),
                     _p32(self._c_p), self._c_n0, self._c_l)
        return out

    def mulc_int(self, a, c: int):
        out = np.empty(a.shape[0], np.uint32)
        _lib.hfg_mulc(_p32(a), _p32(self._mont_limbs(c)), _p32(out),
                      self._n(a), _p32(self._c_p), self._c_n0, self._c_l)
        return out

    # -- protocol kernels --------------------------------------------------

    @property
    def _uniform_l(self) -> int:
        return 4 * (self.L + 2)   # bytes(p) + >= 8: bias < 2^-64

    def _rpow2_arr(self) -> np.ndarray:
        rp = getattr(self, '_rpow2', None)
        if rp is None:
            k = self._uniform_l // 4
            rp = self._rpow2 = np.concatenate(
                [self._limbs((1 << (32 * w)) * self.r2 % self.p)
                 for w in range(k)])
        return rp

    def _imont_arr(self, m: int) -> np.ndarray:
        arr = getattr(self, '_imont_np', None)
        if arr is None or arr.shape[0] < m * self.L:
            arr = self._imont_np = np.concatenate(
                [self._limbs(i * self.R % self.p)
                 for i in range(1, m + 1)])
        return arr

    def stream_uniform(self, stream, n: int) -> np.ndarray:
        l = self._uniform_l
        buf = np.frombuffer(stream, dtype=np.uint8, count=n * l)
        out = np.empty(n * self.L, np.uint32)
        rc = _lib.hfg_stream_uniform(_p8(buf), _p32(out), n, l,
                                     _p32(self._c_p), self._c_n0,
                                     _p32(self._rpow2_arr()), self._c_l)
        assert rc == 0
        return out

    def chacha_uniform(self, key: bytes, nonce12: bytes, n: int):
        l = self._uniform_l
        kb = np.frombuffer(key, np.uint8)
        nb = np.frombuffer(nonce12, np.uint8)
        stream = np.empty(n * l, np.uint8)
        _lib.hf_chacha_stream(_p8(kb), _p8(nb), _p8(stream), n * l)
        return self.stream_uniform(stream, n)

    def to_wire(self, a: np.ndarray, bl: int) -> bytes:
        n = self._n(a)
        out = np.empty(n * bl, np.uint8)
        _lib.hfg_to_wire(_p32(a), _p8(out), n, bl,
                         _p32(self._c_p), self._c_n0, self._c_l)
        return out.tobytes()

    def from_wire(self, data, n: int, bl: int) -> np.ndarray:
        buf = np.frombuffer(data, dtype=np.uint8, count=n * bl)
        out = np.empty(n * self.L, np.uint32)
        _lib.hfg_from_wire(_p8(buf), _p32(out), n, bl,
                           _p32(self._c_p), self._c_n0,
                           _p32(self._c_r2), self._c_l)
        return out

    def reshare_send(self, sec: np.ndarray, t: int, m: int, pid: int,
                     key: bytes, nonce12: bytes, bl: int):
        n = self._n(sec)
        own = np.empty(n * self.L, np.uint32)
        wire = np.empty((m, n * bl), np.uint8)
        kb = np.frombuffer(key, np.uint8)
        nb = np.frombuffer(nonce12, np.uint8)
        rc = _lib.hfg_reshare_send(
            _p32(sec), n, t, m, pid, _p8(kb), _p8(nb),
            _p32(self._imont_arr(m)), _p32(self._rpow2_arr()),
            self._uniform_l, bl, _p32(own), _p8(wire),
            _p32(self._c_p), self._c_n0, self._c_l)
        assert rc == 0, rc
        return own, wire

    def prf_fold(self, raw, n: int, l: int, rate: int,
                 mask_bits: int = -1) -> np.ndarray:
        """SHAKE counter-block chunks -> mont limb residues (see
        HostFieldCtx.prf_fold)."""
        return _prf_fold_impl(self, raw, n, l, rate, mask_bits)

    def recombine_rows(self, own_row, own_c: int, wires, wire_cs,
                       n: int, bl: int) -> np.ndarray:
        nw = len(wires)
        bufs = [w if isinstance(w, np.ndarray)
                else np.frombuffer(w, np.uint8) for w in wires]
        ptrs = (ctypes.c_void_p * nw)(*[b.ctypes.data for b in bufs])
        cr2 = np.concatenate(
            [self._limbs(c % self.p * self.r2 % self.p)
             for c in wire_cs]) if nw else np.zeros(0, np.uint32)
        out = np.empty(n * self.L, np.uint32)
        own_cm = self._mont_limbs(own_c if own_row is not None else 0)
        rc = _lib.hfg_recombine_rows(
            _p32(own_row) if own_row is not None else None,
            _p32(own_cm),
            ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
            _p32(cr2), nw, _p32(out), n, bl,
            _p32(self._c_p), self._c_n0, self._c_l)
        assert rc == 0, rc
        return out


def _p32(a: np.ndarray):
    return a.ctypes.data


def _g_consts(hf):
    """(p_limbs, n0_32, r2_limbs, one_limbs) uint32 arrays for a facade."""
    c = getattr(hf, '_g_consts', None)
    if c is None:
        L, p = hf.L, hf.p
        R = 1 << (32 * L)

        def limbs(x):
            return np.array([(x >> (32 * i)) & 0xFFFFFFFF
                             for i in range(L)], np.uint32)
        c = hf._g_consts = (limbs(p),
                            _U32(int((-pow(p, -1, 1 << 32)) % (1 << 32))),
                            limbs(R * R % p), limbs(R % p))
    return c


def _to32(hf, a):
    """Facade-native flat array -> uint32 limb flat array."""
    if a is None or a.dtype == np.uint32:
        return a
    return a.view(np.uint32) if hf.L == 2 else a.astype(np.uint32)


def _from32(hf, a):
    """uint32 limb flat array -> facade-native flat array."""
    if hf.stride != 1:
        return a
    return a.view(np.uint64) if hf.L == 2 else a.astype(np.uint64)


def keccak_ctr_blocks(lanes25: np.ndarray, ctr_lane: int,
                      n: int) -> np.ndarray:
    """(n, 42) uint32 counter-mode SHAKE blocks from a pre-absorbed
    state (native Keccak-f; bit-exact with the hashlib/numpy paths).
    Returns None when the native library is unavailable."""
    if _load() is None:
        return None
    out = np.empty((n, 42), np.uint32)
    _lib.hf_keccak_ctr(lanes25.ctypes.data, ctr_lane, n,
                       _p32(out))
    return out


def sgn_prepare(hf, c, rb, s, n: int, l: int, want_e: bool, want_x1: bool):
    """Fused Toft-comparison bit algebra (native/hostfield.cpp
    hfg_sgn_prepare): returns (E, X1, cl) facade-native flat arrays
    (None where not requested).  Replaces ~20 small field-array ops per
    np_sgn call with one library call."""
    L = hf.L
    plimbs, n0, r2, one = _g_consts(hf)
    E = np.empty(n * (l + 1) * L, np.uint32) if want_e else None
    X1 = np.empty(n * l * L, np.uint32) if want_x1 else None
    cl = np.empty(n * L, np.uint32)
    rc = _lib.hfg_sgn_prepare(
        _p32(_to32(hf, c)), _p32(_to32(hf, rb)),
        _p32(_to32(hf, s)) if s is not None else None,
        n, l,
        _p32(E) if E is not None else None,
        _p32(X1) if X1 is not None else None,
        _p32(cl), _p32(one), _p32(r2), _p32(plimbs), n0, _INT(L))
    assert rc == 0, rc
    return (None if E is None else _from32(hf, E),
            None if X1 is None else _from32(hf, X1),
            _from32(hf, cl))


def _prf_fold_impl(hf, raw, n: int, l: int, rate: int,
                   mask_bits: int) -> np.ndarray:
    """Shared PRF-fold driver: uint32 limb output from either facade."""
    L = hf.L
    p = hf.p
    plimbs = getattr(hf, '_p_limbs32', None)
    if plimbs is None:
        plimbs = hf._p_limbs32 = np.array(
            [(p >> (32 * i)) & 0xFFFFFFFF for i in range(L)], np.uint32)
    cache = getattr(hf, '_prf_rpow2', None)
    if cache is None:
        cache = hf._prf_rpow2 = {}
    k = (l + 3) // 4
    rp = cache.get(k)
    if rp is None:
        R = 1 << (32 * L)
        r2 = R * R % p
        rp = cache[k] = np.concatenate(
            [np.array([((1 << (32 * w)) * r2 % p) >> (32 * i) & 0xFFFFFFFF
                       for i in range(L)], np.uint32) for w in range(k)])
    n0 = getattr(hf, '_n0_32', None)
    if n0 is None:
        n0 = hf._n0_32 = _U32(int((-pow(p, -1, 1 << 32)) % (1 << 32)))
    buf = raw if isinstance(raw, np.ndarray) else \
        np.frombuffer(raw, dtype=np.uint8)
    out = np.empty(n * L, np.uint32)
    rc = _lib.hfg_prf_fold(_p8(buf), _p32(out), n, l, rate, mask_bits,
                           _p32(plimbs), n0, _p32(rp), _INT(L))
    assert rc == 0, rc
    return out


_ctx_cache = {}


def host_ctx(ctx):
    """Kernel facade for a PrimeFieldCtx, or None if unavailable.

    p < 2^64 gets the uint64 kernels; wider fields (up to 512 bits) get
    the generic 32-bit-limb CIOS kernels."""
    hf = _ctx_cache.get(ctx.p)
    if hf is None:
        if not available(ctx.p):
            return None
        cls = HostFieldCtx if ctx.L <= 2 else GenericFieldCtx
        hf = _ctx_cache[ctx.p] = cls(ctx)
    return hf
