"""Device kernels for extension fields GF(p^d), odd prime p.

Elements are coefficient vectors over GF(p): stacked Montgomery limb arrays
of shape (..., d, L) (little-endian in the polynomial basis). Multiplication
is schoolbook convolution (d^2 Montgomery muls) followed by reduction with a
host-precomputed residue matrix: x^(d+j) mod f expressed over the basis, so
reduction is d^2 constant multiplications — no data-dependent control flow.

Reference semantics: /root/reference/mpyc/finfields.py ExtensionFieldElement
(values are gfpx polynomials reduced mod f).
"""

from __future__ import annotations

import functools

import numpy as np
from mpyc_tpu.utils.lazyjax import jax, jnp

from mpyc_tpu.ops import limb
from mpyc_tpu.ops.fieldops import prime_field_ctx


@functools.cache
def ext_field_ctx(p: int, modulus_coeffs: tuple):
    return ExtFieldCtx(p, modulus_coeffs)


class ExtFieldCtx:
    """Kernel cache for GF(p^d) with monic irreducible f (coeff tuple)."""

    def __init__(self, p: int, modulus_coeffs: tuple):
        self.p = p
        self.base = prime_field_ctx(p)
        f = list(modulus_coeffs)
        assert f[-1] == 1, 'modulus must be monic'
        self.d = d = len(f) - 1
        self.q = p ** d
        # residue matrix: red[j][i] = coeff of x^i in (x^(d+j) mod f)
        red = []
        if d >= 2:
            cur = [(-c) % p for c in f[:d]]  # x^d mod f
            red.append(list(cur))
            for _ in range(d - 2):
                # multiply by x: shift up, fold the leading term back in
                lead = cur[d - 1]
                cur = [0] + cur[:d - 1]
                if lead:
                    cur = [(cur[i] + lead * red[0][i]) % p for i in range(d)]
                red.append(list(cur))
        # encode residues in Montgomery form for constant mults
        self._red_mont = [[self.base.encode_const(c) for c in row]
                          for row in red]
        # (d-1, d, L) uint32 residue tensor for the batched reduction
        self._red_mont_arr = np.array(
            [[list(c) for c in row] for row in self._red_mont],
            dtype=np.uint32).reshape((max(d - 1, 0), d, self.base.L))
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

    # data: (..., d, L) uint32 Montgomery-form coefficients

    @property
    def add(self):
        def _add(a, b):
            return limb.stack(limb.add_mod(
                limb.unstack(a, self.base.L), limb.unstack(b, self.base.L),
                self.base.p_limbs))
        return self._jit('add', _add)

    @property
    def sub(self):
        def _sub(a, b):
            return limb.stack(limb.sub_mod(
                limb.unstack(a, self.base.L), limb.unstack(b, self.base.L),
                self.base.p_limbs))
        return self._jit('sub', _sub)

    @property
    def neg(self):
        def _neg(a):
            return limb.stack(limb.neg_mod(
                limb.unstack(a, self.base.L), self.base.p_limbs))
        return self._jit('neg', _neg)

    def _modsum_axis(self, x, axis):
        """Modular sum of stacked (..., L) limb values along a batch axis
        (pairwise-halving tree: O(log n) add_mod calls, vectorized)."""
        L = self.base.L
        x = jnp.moveaxis(x, axis, 0)
        while x.shape[0] > 1:
            n = x.shape[0]
            half = n // 2
            s = limb.stack(limb.add_mod(limb.unstack(x[:half], L),
                                        limb.unstack(x[half:2 * half], L),
                                        self.base.p_limbs))
            if n % 2:
                s = jnp.concatenate([s, x[2 * half:]], axis=0)
            x = s
        return x[0]

    def _mul_impl(self, a, b):
        """Coefficient convolution + residue reduction, fully vectorized.

        All d^2 coefficient products run as ONE batched Montgomery mul over
        a (..., d, d, L) broadcast (graph size O(L^2), independent of d —
        the coefficient axis rides the batch dims, so the MXU/VPU sees one
        big kernel instead of d^2 scalar chains). Anti-diagonal sums and the
        residue-matrix reduction are log-depth trees of vectorized add_mod.
        """
        ctx = self.base
        d, L = self.d, ctx.L
        if d == 1:
            return limb.stack(limb.mont_mul(limb.unstack(a, L),
                                            limb.unstack(b, L),
                                            ctx.p_limbs, ctx.n0inv))
        batch = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
        A = jnp.broadcast_to(a[..., :, None, :], batch + (d, d, L))
        B = jnp.broadcast_to(b[..., None, :, :], batch + (d, d, L))
        P = limb.stack(limb.mont_mul(limb.unstack(A, L), limb.unstack(B, L),
                                     ctx.p_limbs, ctx.n0inv))  # (...,d,d,L)
        # shift row i by i so column k collects the anti-diagonal i+j == k
        S = jnp.zeros(batch + (d, 2 * d - 1, L), P.dtype)
        for i in range(d):
            S = S.at[..., i, i:i + d, :].set(P[..., i, :, :])
        conv = self._modsum_axis(S, -3)                        # (...,2d-1,L)
        lo, hi = conv[..., :d, :], conv[..., d:, :]            # (...,d-1,L)
        # reduce high terms: out += conv[d+j] * (x^(d+j) mod f), batched
        R = jnp.asarray(self._red_mont_arr)                    # (d-1,d,L)
        Hb = jnp.broadcast_to(hi[..., :, None, :], batch + (d - 1, d, L))
        Rb = jnp.broadcast_to(R, batch + (d - 1, d, L))
        Pr = limb.stack(limb.mont_mul(limb.unstack(Hb, L), limb.unstack(Rb, L),
                                      ctx.p_limbs, ctx.n0inv))
        red = self._modsum_axis(Pr, -3)                        # (...,d,L)
        return limb.stack(limb.add_mod(limb.unstack(lo, L),
                                       limb.unstack(red, L), ctx.p_limbs))

    @property
    def mul(self):
        return self._jit('mul', self._mul_impl)

    def _one_arr(self, shape_like):
        ctx = self.base
        one = jnp.asarray(np.array(ctx.one_mont, dtype=np.uint32))
        z = jnp.zeros(shape_like.shape, dtype=jnp.uint32)
        return z.at[..., 0, :].set(one)

    def pow_const(self, e: int):
        """a**e elementwise over GF(p^d), static exponent e >= 0."""
        e = int(e)
        q1 = self.q - 1
        if e < 0 or e >= q1:
            e = e % q1
            if e == 0:
                e = q1
        name = f'pow_{e}'

        def _pow(a):
            if e == 0:
                return self._one_arr(a)
            bits = bin(e)[3:]
            if len(bits) <= 16:
                # short exponents: exact unrolled square-and-multiply
                res = a
                for bchr in bits:
                    res = self._mul_impl(res, res)
                    if bchr == '1':
                        res = self._mul_impl(res, a)
                return res
            # long exponents: lax.scan over the bit string (trace size O(1))
            bit_arr = jnp.asarray(np.array([int(c) for c in bits],
                                           dtype=np.uint32))

            def body(res, bit):
                res = self._mul_impl(res, res)
                mul = self._mul_impl(res, a)
                res = jnp.where((bit == 1)[..., None, None], mul, res)
                return res, None

            res, _ = jax.lax.scan(body, a, bit_arr)
            return res
        return self._jit(name, _pow)

    @property
    def inv(self):
        """Inverse via a^(q-2) (0 maps to 0)."""
        return self.pow_const(self.q - 2)

    @property
    def div(self):
        def _div(a, b):
            return self._mul_impl(a, self.inv(b))
        return self._jit('div', _div)

    @property
    def eq(self):
        def _eq(a, b):
            x = a ^ b
            return jnp.all(x == 0, axis=(-1, -2))
        return self._jit('eq', _eq)

    # -- host encode / decode ------------------------------------------------

    def encode_polys(self, polys) -> np.ndarray:
        """Object array/list of gfpx polynomials (or ints) -> (..., d, L)."""
        arr = np.asarray(polys, dtype=object)
        flat = arr.reshape(-1)
        out = np.empty((flat.shape[0], self.d, self.base.L), dtype=np.uint32)
        p = self.p
        for i in range(flat.shape[0]):
            v = flat[i]
            cs = list(v.value) if hasattr(v, 'value') else self._int_coeffs(int(v))
            cs = cs + [0] * (self.d - len(cs))
            enc = self.base.encode_ints(np.array(cs[:self.d], dtype=object))
            out[i] = enc
        return out.reshape(arr.shape + (self.d, self.base.L))

    def _int_coeffs(self, v: int):
        # negative ints encode the negated polynomial of |v| (reference
        # gfpx semantics: GF9(-3) == -(x) == 2x)
        neg = v < 0
        if neg:
            v = -v
        cs = []
        while v:
            v, r = divmod(v, self.p)
            cs.append((-r) % self.p if neg else r)
        return cs

    def decode_ints(self, data) -> np.ndarray:
        """(..., d, L) -> object ndarray of int encodings (base-p)."""
        coeffs = self.base.decode_ints(np.asarray(data))  # (..., d) ints
        flat = coeffs.reshape(-1, self.d)
        out = np.empty(flat.shape[0], dtype=object)
        for i in range(flat.shape[0]):
            v = 0
            for c in reversed(list(flat[i])):
                v = v * self.p + int(c)
            out[i] = v
        return out.reshape(coeffs.shape[:-1])
