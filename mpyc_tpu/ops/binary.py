"""Device kernels for binary fields GF(2^d), d <= 32, and GF(2) itself.

Elements are d-bit polynomials packed one-per-lane in uint32 arrays (no
object dtype anywhere, unlike the reference's numpy object arrays,
cf. /root/reference/mpyc/finfields.py BinaryFieldArray).

Multiplication is carry-less: XLA has no clmul, so the product is built from
d conditional shift-XORs (VPU friendly, fully unrolled at trace time), and
the reduction mod f uses host-precomputed residues x^k mod f for
k in [d, 2d-2], turning reduction into d-1 masked XORs with constants.
"""

from __future__ import annotations

import functools

import os as _os

import numpy as np
from mpyc_tpu.utils import lazyjax as _lazyjax
from mpyc_tpu.utils.lazyjax import jax, jnp

# Host fast-path cutoffs (see ops/fieldops.py): Python-int/numpy twins of
# the kernels serve tiny batches where jax dispatch dominates; vectorized
# xor/and ops get a larger cutoff.  MPYC_TPU_NOHOSTOPS=1 disables.
_HOST_N = 0 if _os.getenv('MPYC_TPU_NOHOSTOPS') else 64
_HOST_N_VEC = 0 if _os.getenv('MPYC_TPU_NOHOSTOPS') else 4096


def _host_resident(arrays) -> bool:
    """True when every operand already lives on the host.

    Host fast paths must never np.asarray a device array: on
    remote-attached TPUs that is a ~50 ms tunnel pull per operand
    (measured: 0.75 s per GF(2) matmul in np_aes --sim), far beyond what
    the host kernel saves.
    """
    from mpyc_tpu.ops.fieldops import _cpu_backend
    if _cpu_backend():  # host "pulls" are free on the CPU backend
        return True
    return all(isinstance(a, np.ndarray)
               or np.isscalar(a) or not hasattr(a, 'devices')
               for a in arrays)

U32 = np.uint32


@functools.cache
def binary_field_ctx(modulus: int):
    return BinaryFieldCtx(modulus)


class BinaryFieldCtx:
    """Kernel cache for GF(2^d) with irreducible modulus (int bitmask)."""

    def __init__(self, modulus: int):
        self.modulus = int(modulus)
        self.d = d = self.modulus.bit_length() - 1
        assert 1 <= d <= 32, 'binary fields supported up to GF(2^32)'
        self.order = 1 << d
        self.mask = np.uint32(self.order - 1) if d < 32 else np.uint32(0xFFFFFFFF)
        # residues red[j] = x^(d+j) mod f for j in [0, d-2]
        red = []
        if d >= 2:
            r = self.modulus ^ (1 << d)  # x^d mod f
            red.append(np.uint32(r))
            for _ in range(d - 2):
                r <<= 1
                if (r >> d) & 1:
                    r ^= self.modulus
                red.append(np.uint32(r))
        self._red = red
        self._jit_cache = {}

    def _jit(self, name, fn):
        """Deferred jit: jits on first call (keeps kernel construction
        jax-free on the host-only scalar plane, utils/lazyjax.py)."""
        wrapper = self._jit_cache.get(name)
        if wrapper is None:
            real_key = name + '/jitted'

            def wrapper(*args, _rk=real_key, _fn=fn):
                real = self._jit_cache.get(_rk)
                if real is None:
                    real = jax.jit(_fn)
                    self._jit_cache[_rk] = real
                return real(*args)
            self._jit_cache[name] = wrapper
        return wrapper

    def _ew(self, name, fn, nargs):
        """Elementwise kernel with flatten+pad-to-pow2 shape bucketing."""
        jf = self._jit(name, fn)
        host_fn = None if _HOST_N == 0 else self._host_kernel(name)
        # all binary host kernels are numpy-vectorized (no per-element
        # Python), so the large cutoff applies across the board; only the
        # long pow chains WITHOUT log tables keep the small one
        # (e-fold mul cost per element; with tables pow is O(1) gathers)
        host_lim = _HOST_N if (name.startswith('pow_')
                               and self.d > 1
                               and self._log_tables is None
                               and int(name[4:]).bit_length() > 4) \
            else _HOST_N_VEC

        def call(*arrays):
            batch = arrays[0].shape
            n = 1
            for s in batch:
                n *= int(s)
            if host_fn is not None and 0 < n <= host_lim and \
                    not any(_lazyjax.is_tracer(a) for a in arrays) \
                    and _host_resident(arrays):
                out = host_fn([np.asarray(a, dtype=np.uint32)
                               for a in arrays])
                return np.asarray(out, dtype=np.uint32)  # stays on the host
            n_pad = max(8, 1 << max(0, (n - 1)).bit_length()) if n else 8
            flat = []
            for a in arrays:
                af = jnp.reshape(a, (n,))
                if n_pad != n:
                    af = jnp.concatenate(
                        [af, jnp.zeros((n_pad - n,), af.dtype)], axis=0)
                flat.append(af)
            out = jf(*flat)
            return out[:n].reshape(batch)
        return call

    # -- host fast path (small batches / GF(2)) ------------------------------

    def _hmul_int(self, x: int, y: int) -> int:
        """Carry-less product mod the field modulus (Python ints)."""
        r = 0
        while y:
            if y & 1:
                r ^= x
            x <<= 1
            y >>= 1
        d = self.d
        for i in range(r.bit_length() - 1, d - 1, -1):
            if (r >> i) & 1:
                r ^= self.modulus << (i - d)
        return r

    def _hpow_int(self, x: int, e: int) -> int:
        if e == 0:
            return 1
        res = x
        for bchr in bin(e)[3:]:
            res = self._hmul_int(res, res)
            if bchr == '1':
                res = self._hmul_int(res, x)
        return res

    @functools.cached_property
    def _log_tables(self):
        """(exp, log) discrete-log tables for d <= 16, else None.

        Host multiplication becomes two gathers and an add — the scalar
        protocol plane (AES over GF(2^8) especially) spends most of its
        local time in tiny-field products, where the table walk beats the
        d-step carry-less MAC by ~10x."""
        if not 2 <= self.d <= 16:
            return None
        q1 = self.order - 1
        # find a generator by order test (usually x = 2 works)
        for g in range(2, self.order):
            v, period = g, 1
            while v != 1:
                v = self._hmul_int(v, g)
                period += 1
            if period == q1:
                break
        exp = np.zeros(2 * q1, np.uint32)
        log = np.zeros(self.order, np.int64)
        v = 1
        for i in range(q1):
            exp[i] = v
            log[v] = i
            v = self._hmul_int(v, g)
        exp[q1:] = exp[:q1]      # doubled table: skip the mod after add
        return exp, log

    def _hmul_vec(self, a, b):
        """Vectorized host mul mod f: np uint32 -> np uint32 (tables for
        small d; d vector MACs + d-1 reduction steps otherwise)."""
        tables = self._log_tables
        if tables is not None:
            exp, log = tables
            prod = exp[log[a] + log[b]]
            return np.where((a != 0) & (b != 0), prod,
                            np.uint32(0)).astype(np.uint32)
        d = self.d
        a64 = a.astype(np.uint64)
        b64 = b.astype(np.uint64)
        r = np.zeros_like(a64)
        for i in range(d):
            r ^= (a64 << np.uint64(i)) * ((b64 >> np.uint64(i))
                                          & np.uint64(1))
        m = np.uint64(self.modulus)
        for i in range(2 * d - 2, d - 1, -1):
            bit = (r >> np.uint64(i)) & np.uint64(1)
            r ^= (m << np.uint64(i - d)) * bit
        return r.astype(np.uint32)

    def _hpow_vec(self, a, e: int):
        if e == 0:
            return np.ones_like(a)
        tables = self._log_tables
        if tables is not None:
            exp, log = tables
            q1 = self.order - 1
            powers = exp[(log[a] * (e % q1)) % q1]
            return np.where(a != 0, powers, np.uint32(0)).astype(np.uint32)
        res = a
        for bchr in bin(e)[3:]:
            res = self._hmul_vec(res, res)
            if bchr == '1':
                res = self._hmul_vec(res, a)
        return res

    def _host_kernel(self, name):
        """Host (vectorized numpy) twin of the elementwise kernel."""
        if name == 'add':
            return lambda ab: ab[0] ^ ab[1]
        if name == 'neg':
            return lambda ab: ab[0]
        if name == 'mul':
            if self.d == 1:
                return lambda ab: ab[0] & ab[1]
            return lambda ab: self._hmul_vec(ab[0], ab[1])
        if name == 'div':
            q2 = self.order - 2
            if self.d == 1:
                return lambda ab: ab[0] & ab[1]  # 1/b == b in GF(2)
            return lambda ab: self._hmul_vec(ab[0],
                                             self._hpow_vec(ab[1], q2))
        if name.startswith('pow_'):
            e = int(name[4:])
            if self.d == 1:
                return lambda ab: ab[0] if e else np.ones_like(ab[0])
            return lambda ab: self._hpow_vec(ab[0], e)
        return None

    # -- kernels ------------------------------------------------------------

    @property
    def add(self):
        return self._ew('add', lambda a, b: a ^ b, 2)

    sub = add

    @property
    def neg(self):
        return self._ew('neg', lambda a: a, 1)

    def _clmul_reduce(self, a, b):
        d = self.d
        zero = jnp.zeros_like(b)
        lo = zero
        hi = zero
        for i in range(d):
            bit = ((a >> i) & 1) != 0
            lo = lo ^ jnp.where(bit, b << i if i else b, zero)
            if i > 0 and d > 32 - i:
                hi = hi ^ jnp.where(bit, b >> (32 - i), zero)
        # reduce bits [d, 2d-2] using precomputed residues
        res = lo & self.mask
        for j in range(d - 1):
            k = d + j
            bit_k = ((lo >> k) & 1) if k < 32 else ((hi >> (k - 32)) & 1)
            res = res ^ jnp.where(bit_k != 0, jnp.asarray(self._red[j]), zero)
        return res

    @property
    def mul(self):
        return self._ew('mul', self._clmul_reduce, 2)

    def pow_const(self, e: int):
        """a**e, static exponent, exponent reduced mod 2^d - 1 (keeping >0)."""
        e = int(e)
        q1 = self.order - 1  # multiplicative group order
        if e < 0 or e >= q1:
            e = e % q1
            if e == 0:
                e = q1  # keeps 0**e == 0 and a**(q-1) == 1 for a != 0
        name = f'pow_{e}'

        def _pow(a):
            if e == 0:
                return jnp.ones_like(a)
            bits = bin(e)[2:]
            res = a
            for bchr in bits[1:]:
                res = self._clmul_reduce(res, res)
                if bchr == '1':
                    res = self._clmul_reduce(res, a)
            return res
        return self._ew(name, _pow, 1)

    @property
    def inv(self):
        """Multiplicative inverse a^(2^d - 2); inverse of 0 is 0."""
        return self.pow_const(self.order - 2)

    @property
    def div(self):
        def _div(a, b):
            return self._clmul_reduce(a, self.inv(b))
        return self._ew('div', _div, 2)

    @property
    def sqrt(self):
        """Square root: a^(2^(d-1)); every element of GF(2^d) is a square."""
        return self.pow_const(1 << (self.d - 1)) if self.d > 1 else \
            self._jit('sqrt_id', lambda a: a)

    @property
    def matmul(self):
        """(…, M, K) @ (…, K, N) over GF(2^d)."""
        def _matmul(a, b):
            K = a.shape[-1]
            acc = None
            for k in range(K):
                term = self._clmul_reduce(a[..., :, k][..., :, None],
                                          b[..., k, :][..., None, :])
                acc = term if acc is None else acc ^ term
            return acc
        jf = self._jit('matmul', _matmul)

        def call(a, b):
            work = 1
            for s in a.shape[:-1]:
                work *= int(s)
            work *= int(b.shape[-1]) if b.ndim else 1
            tracers = any(_lazyjax.is_tracer(x) for x in (a, b))
            host_res = _host_resident((a, b))
            if _HOST_N and not tracers and host_res and self.d == 1 and \
                    work * a.shape[-1] <= 1 << 22:
                # GF(2) matmul == parity of the integer matmul
                an = np.asarray(a, dtype=np.int64)
                bn = np.asarray(b, dtype=np.int64)
                return ((an @ bn) & 1).astype(np.uint32)
            if _HOST_N and not tracers and host_res and \
                    0 < work <= _HOST_N:
                # tiny GF(2^d) matmuls: Python-int clmul accumulation
                an = np.asarray(a, dtype=np.uint32)
                bn = np.asarray(b, dtype=np.uint32)
                bshape = np.broadcast_shapes(an.shape[:-2], bn.shape[:-2])
                M, K, N = an.shape[-2], an.shape[-1], bn.shape[-1]
                an = np.broadcast_to(an, bshape + (M, K)).reshape(-1, M, K)
                bn = np.broadcast_to(bn, bshape + (K, N)).reshape(-1, K, N)
                out = np.zeros((an.shape[0], M, N), np.uint32)
                hm = self._hmul_int
                for t in range(an.shape[0]):
                    for i in range(M):
                        arow = an[t, i]
                        for j in range(N):
                            acc = 0
                            for k in range(K):
                                acc ^= hm(int(arow[k]), int(bn[t, k, j]))
                            out[t, i, j] = acc
                return out.reshape(bshape + (M, N))
            return jf(a, b)
        return call

    # -- host encode/decode (trivial: value == representation) --------------

    def encode_ints(self, xs) -> np.ndarray:
        if isinstance(xs, np.ndarray) and xs.dtype != object and \
                issubclass(xs.dtype.type, (np.integer, np.bool_)):
            v = xs.astype(np.int64)
            if (v >= 0).all() and (v < self.order).all():
                # in-range numeric fast path (no per-element reduction)
                return v.astype(np.uint32)
        arr = np.asarray(xs, dtype=object)
        flat = arr.reshape(-1)
        out = np.empty(flat.shape[0], dtype=np.uint32)
        d, m = self.d, self.modulus
        for i in range(flat.shape[0]):
            v = int(flat[i])
            if v < 0:
                v = -v  # -f(x) == f(x) coefficientwise in char 2
            while v.bit_length() > d:
                # carry-less reduction mod the irreducible polynomial
                # (reference reduces arrays `value %= modulus` with a
                # Polynomial modulus, finfields.py:752-753)
                v ^= m << (v.bit_length() - 1 - d)
            out[i] = v
        return out.reshape(arr.shape)

    def decode_ints(self, vals) -> np.ndarray:
        vals = np.asarray(vals)
        out = np.empty(vals.shape, dtype=object)
        flat_in = vals.reshape(-1)
        flat_out = out.reshape(-1)
        for i in range(flat_in.shape[0]):
            flat_out[i] = int(flat_in[i])
        return out
