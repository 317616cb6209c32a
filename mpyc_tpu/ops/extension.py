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
import jax
import jax.numpy as jnp

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
        self._jit_cache = {}

    def _jit(self, name, fn):
        if name not in self._jit_cache:
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

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

    def _mul_impl(self, a, b):
        ctx = self.base
        d, L = self.d, ctx.L
        # coefficient lists of limb-lists
        ai = [limb.unstack(a[..., i, :], L) for i in range(d)]
        bi = [limb.unstack(b[..., i, :], L) for i in range(d)]
        # schoolbook convolution: conv[k], k in [0, 2d-2]
        conv = [None] * (2 * d - 1)
        for i in range(d):
            for j in range(d):
                t = limb.mont_mul(ai[i], bi[j], ctx.p_limbs, ctx.n0inv)
                k = i + j
                conv[k] = t if conv[k] is None else \
                    limb.add_mod(conv[k], t, ctx.p_limbs)
        # reduce high terms: conv[d+j] * (x^(d+j) mod f)
        out = conv[:d]
        for j in range(d - 1):
            hi = conv[d + j]
            row = self._red_mont[j]
            for i in range(d):
                c = row[i]
                if all(int(x) == 0 for x in c):
                    continue
                t = limb.mont_mul(hi, [jnp.asarray(x) for x in c],
                                  ctx.p_limbs, ctx.n0inv)
                out[i] = limb.add_mod(out[i], t, ctx.p_limbs)
        return jnp.stack([limb.stack(o) for o in out], axis=-2)

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
            res = a
            for bchr in bin(e)[3:]:
                res = self._mul_impl(res, res)
                if bchr == '1':
                    res = self._mul_impl(res, a)
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
