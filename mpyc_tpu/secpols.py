"""Secure polynomials: coefficients secret, degree bound public.

Parity target: /root/reference/mpyc/secpols.py — polynomials over a secure
prime field with secret coefficients; only the degree *bound* (array length)
is public. This module provides the ring core (add/sub/mul/scalar ops),
evaluation, secret-degree helpers, and equality; oblivious divmod/gcd via
vectorized divsteps (secpols.py:355-583) are roadmap items.
"""

from mpyc_tpu import sectypes

runtime = None


def secpoly(sectype):
    """Create a secure polynomial class over the given secure field/number type."""
    name = f'SecPoly({sectype.__name__})'
    cls = type(name, (SecurePolynomial,), {'__slots__': ()})
    cls.sectype = sectype
    return cls


class SecurePolynomial:
    """Secure polynomial: list of secure coefficients (LSB first).

    The list length is a public degree bound; the actual degree is secret.
    """

    __slots__ = ('coeffs',)

    sectype = None

    def __init__(self, coeffs=()):
        cs = []
        for c in coeffs:
            if not isinstance(c, sectypes.SecureObject):
                c = self.sectype(c)
            cs.append(c)
        self.coeffs = cs

    def bound(self):
        """Public degree bound (number of stored coefficients)."""
        return len(self.coeffs)

    def _pad(self, n):
        cs = list(self.coeffs)
        while len(cs) < n:
            cs.append(self.sectype(0))
        return cs

    def __add__(self, other):
        other = self._coerce(other)
        n = max(self.bound(), other.bound())
        a, b = self._pad(n), other._pad(n)
        return type(self)([runtime.add(x, y) for x, y in zip(a, b)])

    __radd__ = __add__

    def __sub__(self, other):
        other = self._coerce(other)
        n = max(self.bound(), other.bound())
        a, b = self._pad(n), other._pad(n)
        return type(self)([runtime.sub(x, y) for x, y in zip(a, b)])

    def __rsub__(self, other):
        return self._coerce(other) - self

    def __neg__(self):
        return type(self)([runtime.neg(c) for c in self.coeffs])

    def __mul__(self, other):
        if isinstance(other, (int, sectypes.SecureNumber)):
            return type(self)([runtime.mul(c, other) for c in self.coeffs])
        other = self._coerce(other)
        na, nb = self.bound(), other.bound()
        if na == 0 or nb == 0:
            return type(self)([])
        out = [None] * (na + nb - 1)
        for i, a_i in enumerate(self.coeffs):
            for j, b_j in enumerate(other.coeffs):
                t = runtime.mul(a_i, b_j)
                out[i + j] = t if out[i + j] is None \
                    else runtime.add(out[i + j], t)
        return type(self)(out)

    __rmul__ = __mul__

    def _coerce(self, other):
        if isinstance(other, SecurePolynomial):
            return other
        if isinstance(other, (int, sectypes.SecureNumber)):
            return type(self)([other])
        if isinstance(other, (list, tuple)):
            return type(self)(other)
        raise TypeError(f'cannot coerce {type(other)} to secure polynomial')

    def __call__(self, x):
        """Secure Horner evaluation at x (secure or public)."""
        if not self.coeffs:
            return self.sectype(0)
        acc = self.coeffs[-1]
        for c in reversed(self.coeffs[:-1]):
            acc = runtime.add(runtime.mul(acc, x), c)
        return acc

    def degree(self):
        """Secret degree as a secure number (-1 encoded for zero poly)."""
        n = self.bound()
        if n == 0:
            return self.sectype(-1)
        nz = [1 - runtime.is_zero(c) for c in self.coeffs]
        # degree = max index with nz == 1: suffix-or scan
        deg = self.sectype(-1)
        seen = self.sectype(0)
        for i in range(n - 1, -1, -1):
            new = runtime.mul(1 - seen, nz[i])
            deg = runtime.add(deg, runtime.mul(new, i + 1))
            seen = runtime.add(seen, new)
        return deg

    def leading_coefficient(self):
        """Secret leading coefficient (0 for the zero polynomial)."""
        n = self.bound()
        if n == 0:
            return self.sectype(0)
        lead = self.sectype(0)
        seen = self.sectype(0)
        for i in range(n - 1, -1, -1):
            nz = 1 - runtime.is_zero(self.coeffs[i])
            new = runtime.mul(1 - seen, nz)
            lead = runtime.add(lead, runtime.mul(new, self.coeffs[i]))
            seen = runtime.add(seen, new)
        return lead

    def monic(self):
        """Secret-degree-aware monic scaling (zero poly stays zero)."""
        lead = self.leading_coefficient()
        z = runtime.is_zero(lead)
        inv = runtime.reciprocal(runtime.add(lead, z))  # avoid 1/0
        return type(self)([runtime.mul(c, inv) for c in self.coeffs])

    def reverse(self, d=None):
        """Reversal with respect to public degree bound d."""
        n = self.bound() if d is None else d + 1
        cs = self._pad(n)[:n]
        return type(self)(list(reversed(cs)))

    def __eq__(self, other):
        other = self._coerce(other)
        n = max(self.bound(), other.bound())
        a, b = self._pad(n), other._pad(n)
        eq = None
        for x, y in zip(a, b):
            e = runtime.eq(x, y)
            eq = e if eq is None else runtime.mul(eq, e)
        return eq if eq is not None else self.sectype(1)

    __hash__ = None

    def __repr__(self):
        return f'{type(self).__name__}(bound={self.bound()})'
