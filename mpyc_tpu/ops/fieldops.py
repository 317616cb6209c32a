"""Jit-compiled, cached device kernels for prime-field arrays.

A ``PrimeFieldCtx`` holds all host-precomputed Montgomery constants for one
prime p and exposes cached jitted kernels operating on stacked uint32 limb
arrays of shape ``(..., L)`` holding values in Montgomery form
(x_mont = x * R mod p, R = 2^(32 L)).

This is the TPU replacement for the reference's GMP/numpy substrate
(/root/reference/mpyc/finfields.py arrays, /root/reference/mpyc/gmpy.py):
everything here vectorizes over arbitrary batch shapes on the VPU and can be
fused inside larger jitted protocol pipelines.
"""

from __future__ import annotations

import functools
import weakref

import numpy as np
from mpyc_tpu.utils import lazyjax as _lazyjax
from mpyc_tpu.utils.lazyjax import jax, jnp

from mpyc_tpu import gmpy
from mpyc_tpu.ops import limb

# Batches up to this size run on the host with Python ints: jax dispatch
# costs ~1 ms per elementwise op on tiny arrays, host ints ~1 us/elt.
# The two paths are bit-identical; set MPYC_TPU_NOHOSTOPS=1 to disable.
import os as _os
_HOST_N = 0 if _os.getenv('MPYC_TPU_NOHOSTOPS') else 64

# Host batches at or above this size route add/sub/neg/mul/mulc through
# the native C kernels (ops/hostfield.py) instead of Python bigints.
_NATIVE_EW_MIN = (1 << 62) if _os.getenv('MPYC_TPU_NOHOSTOPS') else 1024

_ON_CPU = None


def _cpu_backend() -> bool:
    """True when jax's default backend is the host CPU (lazy probe).

    Before jax has been imported at all (host-only scalar plane), report
    True WITHOUT importing it — the host kernels are the fast path there,
    and the answer is re-probed once jax actually loads."""
    global _ON_CPU
    if _ON_CPU is None:
        import sys
        if 'jax' not in sys.modules:
            return True
        try:
            _ON_CPU = jax.default_backend() == 'cpu'
        except Exception:
            _ON_CPU = True
    return _ON_CPU


def _limbify(x: int, L: int):
    return tuple(np.uint32((x >> (32 * i)) & 0xFFFFFFFF) for i in range(L))


@functools.cache
def prime_field_ctx(p: int):
    return PrimeFieldCtx(p)


class PrimeFieldCtx:
    """Montgomery context and kernel cache for GF(p), p an odd prime (or 2).

    p == 2 is handled by the binary kernels elsewhere; this class requires
    odd p so Montgomery reduction applies.
    """

    def __init__(self, p: int):
        assert p > 2 and p % 2 == 1, 'PrimeFieldCtx requires an odd prime'
        self.p = p
        self.bits = p.bit_length()
        self.L = L = (self.bits + 31) // 32
        self.R = R = 1 << (32 * L)
        self.R2 = R * R % p
        self.Rinv = pow(R, -1, p)
        self.n0inv = np.uint32((-pow(p, -1, 1 << 32)) % (1 << 32))
        self.p_limbs = _limbify(p, L)
        self.one_mont = _limbify(R % p, L)
        self.r2_limbs = _limbify(self.R2, L)
        self._jit_cache = {}
        self._call_cache = {}  # kernel name -> built dispatcher closure
        self._host_ints = {}   # id(limb array) -> (weakref, int view)

    # -- host encode / decode ----------------------------------------------

    def encode_ints(self, xs) -> np.ndarray:
        """Object/int ndarray or nested list of ints -> (..., L) uint32 Mont."""
        if isinstance(xs, np.ndarray) and xs.dtype != object and \
                issubclass(xs.dtype.type, (np.integer, np.bool_)):
            # numeric input: boxing to object yields Python ints
            arr = xs.astype(object)
        else:
            arr = np.asarray(xs, dtype=object)
        p, R = self.p, self.R
        flat = arr.reshape(-1)
        try:
            # vectorized object-int arithmetic (no per-element Python loop)
            enc = flat % p * R % p
        except (TypeError, OverflowError):
            enc = np.empty(flat.shape[0], dtype=object)
            for i in range(flat.shape[0]):
                enc[i] = (int(flat[i]) % p) * R % p
        if not _lazyjax.loaded():
            return enc.reshape(arr.shape + (1,)).astype(object)
        return limb.ints_to_limbs(enc, self.L).reshape(arr.shape + (self.L,))

    def decode_ints(self, mont) -> np.ndarray:
        """Host Montgomery data (limbs or object rep) -> ints in [0, p)."""
        mont = np.asarray(mont)
        if mont.dtype == object:
            vals = mont[..., 0]
        else:
            vals = limb.limbs_to_ints(mont)
        p, Rinv = self.p, self.Rinv
        flat = vals.reshape(-1)
        return (flat * Rinv % p).reshape(vals.shape)

    def encode_const(self, x: int):
        """Single int -> Montgomery limb tuple (for baking into traces)."""
        return _limbify((int(x) % self.p) * self.R % self.p, self.L)

    # -- cached jitted kernels ----------------------------------------------

    def _jit(self, name, fn, **jit_kwargs):
        """Deferred jit: the wrapper jits on first call, so constructing a
        kernel never imports jax (host-only scalar plane, lazyjax)."""
        wrapper = self._jit_cache.get(name)
        if wrapper is None:
            real_key = name + '/jitted'

            def wrapper(*args, _rk=real_key, _fn=fn, **kw):
                real = self._jit_cache.get(_rk)
                if real is None:
                    real = jax.jit(_fn, **jit_kwargs)
                    self._jit_cache[_rk] = real
                return real(*args, **kw)
            self._jit_cache[name] = wrapper
        return wrapper

    def _ew(self, name, fn, in_elem, out_batchdims_like=0):
        """Elementwise kernel dispatcher.

        Tiny batches run on the host with Python ints (dispatch latency
        dominates there); everything else goes through one jitted call on
        the arrays' natural shapes — jax's jit cache keys on shapes, and no
        eager primitive ever runs on the hot path (eager data-creating ops
        cost tens of milliseconds of host time through the TPU tunnel,
        measured round 3: an eager ``jnp.zeros`` pad on a 1M-element share
        array was 1.7 s of the 3.9 s np_multiply round).
        in_elem: per-argument count of trailing element axes (e.g. 1 for
        (..., L) Montgomery operands).

        The built dispatcher is memoized per kernel name: the ctx op
        properties re-invoke _ew on every access, and rebuilding the
        host-kernel closures dominated tiny-batch op latency (~15 us of
        the ~50 us/op measured round 4).
        """
        cached = self._call_cache.get(name)
        if cached is not None:
            return cached
        jf = self._jit(name, fn)
        host_fn = None if _HOST_N == 0 else self._host_kernel(name)
        # Cost-aware cutoffs on the CPU backend: vectorized object-int
        # kernels beat a jitted dispatch (~0.1 ms of Python) up to
        # ~1K elements; big-exponent ops (one modexp per element) stay
        # on the host at ANY size — the native CIOS batch kernel
        # (ops/native_modexp.py, ~2-4 us/element) beats the
        # XLA-emulated u32 pow ladder on CPU outright. Device
        # backends keep the tiny cutoff: their compute is far faster
        # once dispatched, and pulling operands costs a tunnel trip.
        # (Computed per call via _cpu_backend(), a cached probe: the
        # backend answer can change once, when jax first loads.)
        expensive = name in ('div', 'inv') or \
            name.startswith(('pow_', 'sqrt_ts_', 'legendre'))

        ie0 = in_elem[0]

        def call(*arrays):
            batch = arrays[0].shape[:arrays[0].ndim - ie0]
            n = 1
            for s in batch:
                n *= int(s)
            tracing = any(_lazyjax.is_tracer(a) for a in arrays)
            # jax-free plane: host ints serve EVERY size (a single large
            # op must not pull in the jax import + XLA-CPU compiles)
            if not _lazyjax.loaded():
                lim = 1 << 62
            elif _cpu_backend():
                lim = (1 << 30) if expensive else 4096
            else:
                lim = _HOST_N
            on_host = not tracing and (
                _cpu_backend()
                or all(isinstance(a, np.ndarray)
                       or not hasattr(a, 'devices') for a in arrays))
            if on_host and n >= _NATIVE_EW_MIN:
                # large host batches: native C kernels (~5-10 ns/element)
                # beat both Python bigints and an XLA-CPU dispatch; jax
                # CPU-backend arrays convert by view via np.asarray
                nat = self._native_ew(name, [np.asarray(a) for a in arrays],
                                      batch)
                if nat is not None:
                    return nat
            if host_fn is not None and 0 < n <= lim and on_host:
                # latency fast path: tiny batches compute with Python ints
                # on the host (one device_put instead of ~7 dispatches);
                # never taken when it would pull device arrays through a
                # TPU tunnel, nor under an enclosing jit trace
                out = host_fn([np.asarray(a) for a in arrays])
                return out  # numpy result: stays on the host
            arrays = tuple(self.pack_limbs(a) if getattr(a, 'dtype', None)
                           == object else a for a in arrays)
            if not tracing and _cpu_backend():
                # CPU backend: flatten + pad to a power of two so one XLA
                # compilation serves a whole bucket of protocol shapes
                # (eager reshape/pad are cheap on CPU; on TPU backends the
                # natural-shape call below avoids eager primitives, which
                # cost tens of ms of host time through the device tunnel)
                n_pad = max(8, 1 << max(0, (n - 1)).bit_length()) if n else 8
                flat = []
                for a, ie in zip(arrays, in_elem):
                    elem = a.shape[a.ndim - ie:] if ie else ()
                    af = jnp.reshape(a, (n,) + elem)
                    if n_pad != n:
                        af = jnp.concatenate(
                            [af, jnp.zeros((n_pad - n,) + elem, af.dtype)],
                            axis=0)
                    flat.append(af)
                out = jf(*flat)
                if isinstance(out, tuple):
                    return tuple(o[:n].reshape(batch + o.shape[1:])
                                 for o in out)
                return out[:n].reshape(batch + out.shape[1:])
            return jf(*arrays)
        self._call_cache[name] = call
        return call

    # -- native host batch kernels (large host batches) ----------------------

    def _native_ew(self, name, host_args, batch):
        """Large-host-batch elementwise kernels through the native C
        library (ops/hostfield.py): add/sub/neg/mul/mulc at ~5-10 ns per
        element vs ~1-10 us through Python bigints.  Returns the
        canonical (..., L) uint32 limb result, or None when the kernel /
        field / representation is not covered (caller falls back)."""
        if not (name in ('add', 'sub', 'neg', 'mul')
                or name.startswith('mulc_')):
            return None
        from mpyc_tpu.ops import hostfield
        hf = hostfield.host_ctx(self)
        if hf is None:
            return None
        for a in host_args:
            if a.shape[:a.ndim - 1] != batch:
                return None  # unbroadcast operands: fall back
        try:
            us = [hf.mont_u64(a) for a in host_args]
        except (TypeError, OverflowError):
            return None
        if name == 'mul':
            out = hf.mul(us[0], us[1])
        elif name == 'add':
            out = hf.add(us[0], us[1])
        elif name == 'sub':
            out = hf.sub(us[0], us[1])
        elif name == 'neg':
            out = hf.neg(us[0])
        else:
            out = hf.mulc_int(us[0], int(name[5:]))
        n = 1
        for s in batch:
            n *= int(s)
        if not _lazyjax.loaded() and n < 4096:
            # jax-free plane, small batch: return the object rep so
            # chained host ops skip the limb decode
            return hf.obj_rep(out, batch)
        return hf.limb_rep(out, batch)

    # -- host fast path (small batches) --------------------------------------

    def _cache_host_ints(self, arr, ints):
        """Remember the int view of a host limb array (weak-keyed).

        Host-plane chains then decode each operand once: results produced
        by _mont_out re-enter later ops without a limbs->ints pass.  The
        cache relies on host limb arrays being treated immutably (all
        update paths copy, finfields._data_at_set)."""
        key = id(arr)
        try:
            wr = weakref.ref(
                arr, lambda _, k=key: self._host_ints.pop(k, None))
        except TypeError:
            return
        self._host_ints[key] = (wr, ints)

    def _mont_ints(self, a):
        """Host Montgomery data -> flat object array of Montgomery ints.

        Accepts both representations: (..., L) uint32 limbs, and the
        jax-free plane's object rep (..., 1) of Python ints (see
        _mont_out) — the latter is a free view."""
        if a.dtype == object:
            return a.reshape(-1)
        hit = self._host_ints.get(id(a))
        if hit is not None and hit[0]() is a:
            return hit[1]
        ints = limb.limbs_to_ints(a).reshape(-1)
        self._cache_host_ints(a, ints)
        return ints

    def _mont_out(self, vals, shape):
        """Iterable/ndarray of Montgomery-domain ints -> host field data.

        While jax is not loaded (host-only scalar plane), the result is
        the OBJECT representation: shape (*shape, 1) object ndarray whose
        single trailing slot holds the Montgomery int — chained host ops
        then skip the ints->limbs->ints packing entirely (measured: the
        packing was ~40% of scalar protocol time). Once jax is loaded the
        canonical (*shape, L) uint32 limb form is produced so device
        paths see uint32 data."""
        if isinstance(vals, np.ndarray):
            arr = vals
        else:
            arr = np.array(list(vals), dtype=object)
        if not _lazyjax.loaded():
            if arr.dtype != object:
                arr = arr.astype(object)
            return arr.reshape(shape + (1,))
        out = limb.ints_to_limbs(arr, self.L).reshape(shape + (self.L,))
        self._cache_host_ints(out, arr.reshape(-1))
        return out

    def pack_limbs(self, a):
        """Object-rep host data -> canonical (..., L) uint32 limbs."""
        if a.dtype != object:
            return a
        ints = a.reshape(-1)
        out = limb.ints_to_limbs(ints, self.L).reshape(
            a.shape[:-1] + (self.L,))
        self._cache_host_ints(out, ints)
        return out

    def _host_kernel(self, name):
        """Python-int implementation of the elementwise kernel, or None.

        Operates in the Montgomery domain like the device kernels, so the
        two paths are bit-identical; selected only for tiny batches where
        jax dispatch overhead dominates (see STATUS.md: scalar latency).
        """
        p, R, Rinv, R2 = self.p, self.R, self.Rinv, self.R2
        mi, mo = self._mont_ints, self._mont_out

        def shape_of(a, ie=1):
            return a.shape[:a.ndim - ie]

        def _batch_pow(mont_vals, e):
            """[x^e] over Montgomery-int views -> Montgomery-int ndarray.

            Native 64-bit-limb CIOS batch kernel when available (~6x
            CPython pow; ops/native_modexp.py); exponents are reduced
            into [1, p-1) so inverse powers work (0 maps to 0, the
            host kernels' zero-divisor convention).
            """
            e = int(e)
            if e < 0 or e >= p - 1:
                e = e % (p - 1)
                if e == 0:
                    e = p - 1      # keeps a**(p-1) == 1 for a != 0
            vals = mont_vals * Rinv % p
            from mpyc_tpu.ops import native_modexp
            if len(vals) >= 8 and native_modexp.available(p):
                out = native_modexp.powmod_batch(vals, e, p)
                return np.array(out, dtype=object) * R % p
            return np.array([pow(int(v), e, p) for v in vals],
                            dtype=object) * R % p

        if name in ('add', 'sub', 'neg', 'mul', 'div', 'inv', 'eq',
                    'is_zero', 'legendre', 'to_std', 'from_std',
                    'from_uint32'):
            # vectorized object-int arithmetic: one C-level pass per op
            # (the per-element genexprs they replace dominated scalar
            # protocol latency at ~10x the cost)
            if name == 'add':
                return lambda ab: mo((mi(ab[0]) + mi(ab[1])) % p,
                                     shape_of(ab[0]))
            if name == 'sub':
                return lambda ab: mo((mi(ab[0]) - mi(ab[1])) % p,
                                     shape_of(ab[0]))
            if name == 'neg':
                return lambda ab: mo((-mi(ab[0])) % p, shape_of(ab[0]))
            if name == 'mul':
                return lambda ab: mo(mi(ab[0]) * mi(ab[1]) * Rinv % p,
                                     shape_of(ab[0]))
            if name == 'div':
                # z^ = x^ * (y^-1)^ * R^-1  (0 divisor -> 0)
                return lambda ab: mo(
                    mi(ab[0]) * _batch_pow(mi(ab[1]), -1) * Rinv % p,
                    shape_of(ab[0]))
            if name == 'inv':
                return lambda ab: mo(_batch_pow(mi(ab[0]), -1),
                                     shape_of(ab[0]))
            if name == 'eq':
                return lambda ab: np.asarray(
                    mi(ab[0]) == mi(ab[1]),
                    dtype=bool).reshape(shape_of(ab[0]))
            if name == 'is_zero':
                return lambda ab: np.asarray(
                    mi(ab[0]) == 0,
                    dtype=bool).reshape(shape_of(ab[0]))
            if name == 'legendre':
                def _leg(ab):
                    ls = _batch_pow(mi(ab[0]), (p - 1) >> 1) * Rinv % p
                    out = np.where(ls == 0, 0, np.where(ls == 1, 1, -1))
                    return out.astype(np.int32).reshape(shape_of(ab[0]))
                return _leg
            if name == 'to_std':
                return lambda ab: mo(mi(ab[0]) * Rinv % p, shape_of(ab[0]))
            if name == 'from_std':
                return lambda ab: mo(mi(ab[0]) * R % p, shape_of(ab[0]))
            if name == 'from_uint32':
                return lambda ab: mo(
                    np.asarray(ab[0], dtype=np.uint32).reshape(-1)
                    .astype(object) * R % p,
                    ab[0].shape)
        if name.startswith('pow_'):
            e = int(name[4:])
            return lambda ab: mo(_batch_pow(mi(ab[0]), e),
                                 shape_of(ab[0]))
        if name.startswith('sqrt_ts_'):
            inv = bool(int(name[8:]))
            q, s, z0 = self._ts_params()

            def _ts(ab):
                out = []
                for xm in mi(ab[0]):
                    a = int(xm) * Rinv % p
                    # identical ladder to the device kernel (same root)
                    w = pow(a, (q - 1) >> 1, p)
                    x = a * w % p
                    t = x * w % p
                    z = z0
                    for i in range(s, 1, -1):
                        y = t
                        for _ in range(i - 2):
                            y = y * y % p
                        z2 = z * z % p
                        if y != 1:
                            x = x * z % p
                            t = t * z2 % p
                        z = z2
                    if inv:
                        x = pow(x, -1, p) if x else 0
                    out.append(x * R % p)
                return mo(out, shape_of(ab[0]))
            return _ts
        if name.startswith('mulc_'):
            c = int(name[5:])
            return lambda ab: mo(mi(ab[0]) * c % p, shape_of(ab[0]))
        if name.startswith('mod_pow2_'):
            f = int(name[9:])
            mask = (1 << f) - 1
            return lambda ab: mo((mi(ab[0]) * Rinv % p & mask) * R % p,
                                 shape_of(ab[0]))
        if name.startswith('to_bits_'):
            l = int(name[8:])

            def _tb(ab):
                vals = mi(ab[0]) * Rinv % p
                bits = np.stack([((vals >> i) & 1).astype(np.uint32)
                                 for i in range(l)], axis=-1)
                return bits.reshape(shape_of(ab[0]) + (l,))
            return _tb
        if name.startswith('from_bits_'):
            l = int(name[10:])

            def _fb(ab):
                b = np.asarray(ab[0], dtype=np.uint32).reshape(-1, l)
                acc = b[:, l - 1].astype(object)
                for i in range(l - 2, -1, -1):
                    acc = (acc << 1) | b[:, i].astype(object)
                return mo(acc * R % p, ab[0].shape[:-1])
            return _fb
        if name.startswith('reduce_chunks_'):
            nc = int(name[14:])

            def _rc(ab):
                w = np.asarray(ab[0], dtype=np.uint32)
                shape = w.shape[:-2]
                # the nc x L chunk grid is one little-endian limb vector
                vals = limb.limbs_to_ints(w.reshape(-1, nc * self.L))
                return mo(vals % p * R % p, shape)
            return _rc
        return None

    # All kernels take/return stacked (..., L) uint32 arrays.

    @property
    def add(self):
        def _add(a, b):
            return limb.stack(limb.add_mod(limb.unstack(a, self.L),
                                           limb.unstack(b, self.L),
                                           self.p_limbs))
        return self._ew('add', _add, (1, 1))

    @property
    def sub(self):
        def _sub(a, b):
            return limb.stack(limb.sub_mod(limb.unstack(a, self.L),
                                           limb.unstack(b, self.L),
                                           self.p_limbs))
        return self._ew('sub', _sub, (1, 1))

    @property
    def neg(self):
        def _neg(a):
            return limb.stack(limb.neg_mod(limb.unstack(a, self.L),
                                           self.p_limbs))
        return self._ew('neg', _neg, (1,))

    @property
    def mul(self):
        def _mul(a, b):
            return limb.stack(limb.mont_mul(limb.unstack(a, self.L),
                                            limb.unstack(b, self.L),
                                            self.p_limbs, self.n0inv))
        return self._ew('mul', _mul, (1, 1))

    @property
    def inv(self):
        def _inv(a):
            return limb.stack(limb.mont_inv(limb.unstack(a, self.L), self.p,
                                            self.p_limbs, self.n0inv,
                                            self.one_mont))
        return self._ew('inv', _inv, (1,))

    @property
    def div(self):
        def _div(a, b):
            ib = limb.mont_inv(limb.unstack(b, self.L), self.p, self.p_limbs,
                               self.n0inv, self.one_mont)
            return limb.stack(limb.mont_mul(limb.unstack(a, self.L), ib,
                                            self.p_limbs, self.n0inv))
        return self._ew('div', _div, (1, 1))

    def pow_const(self, e: int):
        """Kernel computing a**e elementwise, static exponent (cached)."""
        e = int(e)
        if e < 0 or e >= self.p - 1:
            # reduce mod p-1 but keep e > 0 so 0**e stays 0 (Fermat only
            # applies to nonzero a; this keeps both cases right)
            e = e % (self.p - 1)
            if e == 0:
                e = self.p - 1
        name = f'pow_{e}'

        def _pow(a):
            return limb.stack(limb.mont_pow_const(
                limb.unstack(a, self.L), e, self.p_limbs, self.n0inv,
                self.one_mont))
        return self._ew(name, _pow, (1,))

    def mul_const(self, c: int):
        """Kernel multiplying by a public constant (baked into the trace)."""
        cm = self.encode_const(c)
        name = f'mulc_{int(c) % self.p}'

        def _mulc(a):
            return limb.stack(limb.mont_mul(
                limb.unstack(a, self.L), [jnp.asarray(x) for x in cm],
                self.p_limbs, self.n0inv))
        return self._ew(name, _mulc, (1,))

    @property
    def eq(self):
        def _eq(a, b):
            return limb.eq_ll(limb.unstack(a, self.L), limb.unstack(b, self.L))
        return self._ew('eq', _eq, (1, 1))

    @property
    def is_zero(self):
        def _isz(a):
            return limb.iszero_ll(limb.unstack(a, self.L))
        return self._ew('is_zero', _isz, (1,))

    @property
    def legendre(self):
        """0 -> 0, QR -> 1, non-QR -> -1 (int32)."""
        def _leg(a):
            r = limb.mont_pow_const(limb.unstack(a, self.L), (self.p - 1) >> 1,
                                    self.p_limbs, self.n0inv, self.one_mont)
            one = [jnp.asarray(x) for x in self.one_mont]
            is_one = limb.eq_ll(r, [jnp.broadcast_to(x, r[0].shape) for x in one])
            is_zero = limb.iszero_ll(limb.unstack(a, self.L))
            return jnp.where(is_zero, 0, jnp.where(is_one, 1, -1)).astype(jnp.int32)
        return self._ew('legendre', _leg, (1,))

    def _ts_params(self):
        """(q, s, z) with p-1 = q*2^s (q odd) and z = b^q for the smallest
        quadratic non-residue b (host-precomputed, deterministic)."""
        p = self.p
        q, s = p - 1, 0
        while q % 2 == 0:
            q //= 2
            s += 1
        b = 2
        from mpyc_tpu import gmpy as gmpy2
        while gmpy2.legendre(b, p) != -1:
            b += 1
        return q, s, pow(b, q, p)

    def sqrt(self, INV=False):
        """Elementwise sqrt (or 1/sqrt) kernel.

        p % 4 == 3: a**((p+1)/4) (reference convention, finfields.py:440-457).
        p % 4 == 1: constant-iteration Tonelli-Shanks — the reference's
        data-dependent loop (Cipolla at finfields.py:459-477 serves the same
        role) becomes a fixed s-1 round ladder of square/select steps, so
        the whole batch runs branch-free on the VPU. sqrt(0) == 0; non-QR
        inputs produce garbage (callers test is_sqr first, as the reference
        does).
        """
        p = self.p
        if p % 4 == 3:
            e = (p * 3 - 5) >> 2 if INV else (p + 1) >> 2
            return self.pow_const(e)
        q, s, z0 = self._ts_params()
        # z^(2^k) table in Montgomery form (host constants)
        zpows = np.stack([_limbify(pow(z0, 1 << k, p) * self.R % p, self.L)
                          for k in range(s)]).astype(np.uint32)   # (s, L)
        name = f'sqrt_ts_{int(INV)}'
        pl_, n0 = self.p_limbs, self.n0inv

        def _sqrt(arr):
            import jax as _jax
            L = self.L
            a = limb.unstack(arr, L)
            shape = a[0].shape
            w = limb.mont_pow_const(a, (q - 1) >> 1, pl_, n0, self.one_mont)
            x = limb.mont_mul(a, w, pl_, n0)                    # a^((q+1)/2)
            t = limb.mont_mul(x, w, pl_, n0)                    # a^q
            if s >= 2:
                zp = jnp.asarray(zpows)
                one = [jnp.broadcast_to(jnp.uint32(int(v)), shape)
                       for v in self.one_mont]

                def body(k, carry):
                    x_st, t_st = carry
                    x_ = limb.unstack(x_st, L)
                    t_ = limb.unstack(t_st, L)
                    # y = t^(2^(s-k-2))
                    y_st = _jax.lax.fori_loop(
                        0, s - k - 2,
                        lambda _, v: limb.stack(limb.mont_sqr(
                            limb.unstack(v, L), pl_, n0)), t_st)
                    flip = ~limb.eq_ll(limb.unstack(y_st, L), one)
                    zk = [jnp.broadcast_to(zp[k, i], shape)
                          for i in range(L)]
                    zk1 = [jnp.broadcast_to(zp[jnp.minimum(k + 1, s - 1), i],
                                            shape) for i in range(L)]
                    x_ = limb.select_ll(flip, limb.mont_mul(x_, zk, pl_, n0),
                                        x_)
                    t_ = limb.select_ll(flip, limb.mont_mul(t_, zk1, pl_, n0),
                                        t_)
                    return (limb.stack(x_), limb.stack(t_))

                x_st, _ = _jax.lax.fori_loop(
                    0, s - 1, body, (limb.stack(x), limb.stack(t)))
                x = limb.unstack(x_st, L)
            if INV:
                x = limb.mont_inv(x, p, pl_, n0, self.one_mont)
            return limb.stack(x)
        return self._ew(name, _sqrt, (1,))

    @property
    def sum(self):
        """Sum along axis=0 of the batch dims: pairwise-halving tree of
        vectorized modular adds (O(log N) traced ops, O(N) work)."""
        def _sum(a):
            # a: (N, ..., L) -> (..., L)
            while a.shape[0] > 1:
                if a.shape[0] % 2:
                    a = jnp.concatenate([a, jnp.zeros_like(a[:1])], 0)
                x = limb.unstack(a[0::2], self.L)
                y = limb.unstack(a[1::2], self.L)
                a = limb.stack(limb.add_mod(x, y, self.p_limbs))
            return a[0]
        jf = self._jit('sum0', _sum)
        if _HOST_N == 0:
            return jf

        def call(a):
            if (a.size <= 4096 * self.L or not _lazyjax.loaded()) \
                    and _cpu_backend() and not _lazyjax.is_tracer(a):
                ints = self._mont_ints(np.asarray(a)).reshape(a.shape[:-1])
                return self._mont_out(
                    (int(v) % self.p for v in ints.sum(axis=0).reshape(-1)),
                    a.shape[1:-1])
            return jf(self.pack_limbs(a) if a.dtype == object else a)
        return call

    @property
    def matmul(self):
        """(…, M, K, L) @ (…, K, N, L) -> (…, M, N, L) via scan over K."""
        def _term(ak, bk):
            # ak: (..., M, L), bk: (..., N, L) -> (..., M, N, L) products
            M, N = ak.shape[-2], bk.shape[-2]
            out_shape = jnp.broadcast_shapes(ak.shape[:-2], bk.shape[:-2]) \
                + (M, N)
            ak_l = [jnp.broadcast_to(x[..., :, None], out_shape)
                    for x in limb.unstack(ak, self.L)]
            bk_l = [jnp.broadcast_to(x[..., None, :], out_shape)
                    for x in limb.unstack(bk, self.L)]
            return limb.mont_mul(ak_l, bk_l, self.p_limbs, self.n0inv)

        def _matmul(a, b):
            K = a.shape[-2]
            if 32 <= K <= 70000:
                # MXU path: the contraction runs as integer matmuls
                return self._matmul_mxu(a, b)
            if K <= 8:  # unroll small contractions (protocol-sized)
                acc = None
                for k in range(K):
                    term = _term(a[..., :, k, :], b[..., k, :, :])
                    acc = term if acc is None else \
                        limb.add_mod(acc, term, self.p_limbs)
                return limb.stack(acc)
            # large K: scan with (..., M, N, L) accumulator
            a_k = jnp.moveaxis(a, -2, 0)   # (K, ..., M, L)
            b_k = jnp.moveaxis(b, -3, 0)   # (K, ..., N, L)
            acc0 = limb.stack(_term(a_k[0], b_k[0]))

            def body(acc, kab):
                ak, bk = kab
                term = _term(ak, bk)
                acc = limb.stack(limb.add_mod(
                    limb.unstack(acc, self.L), term, self.p_limbs))
                return acc, None

            acc, _ = jax.lax.scan(body, acc0, (a_k[1:], b_k[1:]))
            return acc
        jf = self._jit('matmul', _matmul)
        if _HOST_N == 0:
            return jf

        def call(a, b):
            work = int(np.prod(a.shape[:-1], dtype=np.int64)) * \
                int(b.shape[-2])
            if 0 < work and (work <= 4096 or not _lazyjax.loaded()) \
                    and _cpu_backend() and not _lazyjax.is_tracer(a) \
                    and not _lazyjax.is_tracer(b):
                # tiny protocol matmuls: object-int contraction on the
                # host; Montgomery linearity folds the R^-1 once per entry
                p, Rinv = self.p, self.Rinv
                ai = self._mont_ints(np.asarray(a)).reshape(a.shape[:-1])
                bi = self._mont_ints(np.asarray(b)).reshape(b.shape[:-1])
                # zip-truncation semantics like the jitted kernel: the
                # contraction length is a's K; longer b rows are ignored
                # (reference in_prod zip semantics, used by the LP demos)
                ci = ai @ bi[..., :ai.shape[-1], :]
                return self._mont_out(
                    (int(v) * Rinv % p for v in ci.reshape(-1)),
                    ci.shape)
            return jf(self.pack_limbs(a) if a.dtype == object else a,
                      self.pack_limbs(b) if b.dtype == object else b)
        return call

    def _matmul_mxu(self, a, b):
        """Modular matmul with the K-contraction on the MXU.

        TPU-first design (replaces the reference's numpy object matmul of
        Python bigints, demos/np_bnnmnist.py:12-16): Montgomery operands are
        sliced into 4-bit nibble planes (values 0..15, exact in int8 *and*
        f32), all plane-pair contractions run as integer matmuls with int32
        accumulation, the nibble-weighted partial sums are assembled into a
        wide integer with explicit carry chains, and the wide value folds
        back mod p via Montgomery radix constants — which also eats the R^2
        factor, so the output is again Montgomery form. Exact for
        K <= 70000 (dot <= K*16*225 < 2^31; f32 lowering exact for
        K*225 < 2^24).
        """
        L = self.L
        P = 8 * L                               # nibble planes per operand
        K = a.shape[-2]
        au = limb.unstack(a, L)                 # L x (..., M, K)
        bu = limb.unstack(b, L)                 # L x (..., K, N)

        def nibbles(xs):
            out = []
            for i in range(L):
                for s in range(8):
                    out.append(((xs[i] >> jnp.uint32(4 * s))
                                & jnp.uint32(0xF)).astype(jnp.int8))
            return out

        pa, pb = nibbles(au), nibbles(bu)
        nb = 2 * P - 1
        # bucket sums S_e = sum_{d1+d2=e} pa[d1] @ pb[d2]  (int32-exact)
        S = []
        for e in range(nb):
            acc = None
            for d1 in range(max(0, e - P + 1), min(P, e + 1)):
                t = jnp.matmul(pa[d1], pb[e - d1],
                               preferred_element_type=jnp.int32)
                acc = t if acc is None else acc + t
            S.append(acc.astype(jnp.uint32))
        # byte-position values B_k = S_{2k} + 16*S_{2k+1}  (< 2^31)
        B = [S[2 * k] + (S[2 * k + 1] << jnp.uint32(4))
             if 2 * k + 1 < nb else S[2 * k]
             for k in range((nb + 1) // 2)]
        # assemble wide limbs with carry chains: V = sum_k B_k * 2^(8k)
        n_limbs = -(- (8 * (len(B) - 1) + 31) // 32) + 1
        zero = jnp.zeros_like(B[0])
        W = [zero] * n_limbs
        for k, Bk in enumerate(B):
            j, off = divmod(8 * k, 32)
            if off == 0:
                lo, hi = Bk, zero
            else:
                lo = (Bk & jnp.uint32((1 << (32 - off)) - 1)) \
                    << jnp.uint32(off)
                hi = Bk >> jnp.uint32(32 - off)
            W[j], c = limb.addc2(W[j], lo)
            add = hi + c                         # < 2^32 (hi <= 2^23)
            for jj in range(j + 1, n_limbs):
                W[jj], cc = limb.addc2(W[jj], add)
                add = cc
        # fold mod p: chunks of L limbs times 2^(32 L i) via Montgomery mul,
        # which also removes one R factor (mont*mont inputs carry R^2)
        nc = -(-n_limbs // L)
        W += [zero] * (nc * L - n_limbs)
        acc = None
        for i in range(nc):
            chunk = W[i * L:(i + 1) * L]
            cst = _limbify(pow(2, 32 * L * i, self.p), L)
            term = limb.mont_mul(chunk, [jnp.asarray(x) for x in cst],
                                 self.p_limbs, self.n0inv)
            acc = term if acc is None else \
                limb.add_mod(acc, term, self.p_limbs)
        return limb.stack(acc)

    @property
    def to_std(self):
        """Montgomery form -> standard-form limbs (value as plain uint)."""
        one = _limbify(1, self.L)

        def _to_std(a):
            return limb.stack(limb.mont_mul(
                limb.unstack(a, self.L), [jnp.asarray(x) for x in one],
                self.p_limbs, self.n0inv))
        return self._ew('to_std', _to_std, (1,))

    @property
    def from_std(self):
        """Standard-form limbs (< p) -> Montgomery form."""
        def _from_std(a):
            return limb.stack(limb.mont_mul(
                limb.unstack(a, self.L),
                [jnp.asarray(x) for x in self.r2_limbs],
                self.p_limbs, self.n0inv))
        return self._ew('from_std', _from_std, (1,))

    def mod_pow2(self, f: int):
        """Elementwise (value mod 2^f) kernel (Mont in, Mont out).

        Used by truncation protocols (reference runtime.py:865-871 computes
        ``c.value % (1 << f)`` on public opened values).
        """
        assert 0 <= f < 32 * self.L
        one = _limbify(1, self.L)
        w, rem = f // 32, f % 32
        name = f'mod_pow2_{f}'

        def _mp2(a):
            std = limb.mont_mul(limb.unstack(a, self.L),
                                [jnp.asarray(x) for x in one],
                                self.p_limbs, self.n0inv)
            masked = []
            for i in range(self.L):
                if i < w:
                    masked.append(std[i])
                elif i == w and rem:
                    masked.append(std[i] & np.uint32((1 << rem) - 1))
                else:
                    masked.append(jnp.zeros_like(std[i]))
            return limb.stack(limb.mont_mul(
                masked, [jnp.asarray(x) for x in self.r2_limbs],
                self.p_limbs, self.n0inv))
        return self._ew(name, _mp2, (1,))

    def to_bits(self, l: int):
        """Kernel: Mont (…, L) -> uint32 (…, l) of 0/1 bit values (LSB first).

        Values are de-Montgomeryized and their l low bits extracted — used on
        public opened values in comparison/bit-decomposition protocols.
        """
        assert 0 < l <= 32 * self.L
        one = _limbify(1, self.L)
        name = f'to_bits_{l}'

        def _tb(a):
            std = limb.mont_mul(limb.unstack(a, self.L),
                                [jnp.asarray(x) for x in one],
                                self.p_limbs, self.n0inv)
            bits = []
            for i in range(l):
                w, sh = i // 32, i % 32
                bits.append((std[w] >> sh) & 1)
            return jnp.stack(bits, axis=-1)
        return self._ew(name, _tb, (1,))

    @property
    def from_uint32(self):
        """Kernel: uint32 (…,) values -> Mont (…, L) field elements."""
        def _fu(v):
            zeros = jnp.zeros_like(v)
            std = [v] + [zeros] * (self.L - 1)
            return limb.stack(limb.mont_mul(
                std, [jnp.asarray(x) for x in self.r2_limbs],
                self.p_limbs, self.n0inv))
        return self._ew('from_uint32', _fu, (0,))

    def from_bits(self, l: int):
        """Kernel: uint32 (…, l) of 0/1 (LSB first) -> Mont (…, L)."""
        assert 0 < l <= 32 * self.L
        name = f'from_bits_{l}'

        def _fb(bits):
            words = []
            for w in range(self.L):
                acc = jnp.zeros_like(bits[..., 0])
                for sh in range(32):
                    i = 32 * w + sh
                    if i < l:
                        acc = acc | (bits[..., i] << sh)
                words.append(acc)
            return limb.stack(limb.mont_mul(
                words, [jnp.asarray(x) for x in self.r2_limbs],
                self.p_limbs, self.n0inv))
        return self._ew(name, _fb, (1,))

    def reduce_chunks(self, n_chunks: int):
        """Kernel reducing (…, n_chunks, L) wide LE values mod p -> Mont form.

        Used to map PRF output streams / uniform randomness into the field:
        value = sum_i chunk_i 2^(32 L i);  result = (value mod p) in Mont form.
        """
        radix = []
        for i in range(n_chunks):
            c = pow(2, 32 * self.L * i, self.p) * self.R2 % self.p
            radix.append(_limbify(c, self.L))
        name = f'reduce_chunks_{n_chunks}'

        def _red(w):
            chunks = [limb.unstack(w[..., i, :], self.L)
                      for i in range(n_chunks)]
            return limb.stack(limb.reduce_wide(chunks, radix, self.p_limbs,
                                               self.n0inv))
        return self._ew(name, _red, (2,))
