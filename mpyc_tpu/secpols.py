"""Secure (univariate) polynomial arithmetic over prime fields.

Capability parity target: /root/reference/mpyc/secpols.py (677 LoC).
A secure polynomial holds a secure 1-D field array of coefficients
[a_0 a_1 ... a_d 0 ... 0]; the array length is a public degree *bound*,
the actual degree stays secret.  Operators +,-,*,<<,>>,**,//,%, divmod,
the comparisons (lexicographic), and evaluation are overloaded; advanced
oblivious operations are provided as well:

  * secret degree / monic scaling           (secpols.py:252-353)
  * oblivious divmod via random self-reducibility: blind the reversed
    divisor by a random invertible power series, open, invert on the
    host, and unblind                        (secpols.py:355-403)
  * GCD / extended GCD / modular inverse via the x-adic variant of
    Bernstein-Yang divsteps (constant iteration count, straight-line —
    exactly the shape that batches onto the TPU)  (secpols.py:462-583)
  * powmod and a Rabin-style irreducibility test  (secpols.py:194-235,584-599)

Coefficient arrays ride the device field kernels; per-step control flow
is public, so every round is a fixed batched kernel + exchange.
"""

import operator

import numpy as np

from mpyc_tpu.gfpx import GFpX, Polynomial
from mpyc_tpu import sectypes
from mpyc_tpu.sectypes import SecureObject, SecureFiniteFieldArray
from mpyc_tpu.mpctools import reduce as _reduce

runtime = None


class secpoly(SecureObject):
    """Secure polynomial: secret coefficients, public degree bound."""

    __slots__ = ()

    def __init__(self, value=None, sectype=None, shape=None):
        """Wrap value as a secure polynomial.

        value may be a gfpx polynomial, a 1-D int/object array (sectype
        required), a secure finite field array, or None (placeholder of
        the given shape; sectype required).
        """
        if value is None:
            assert shape is not None and len(shape) == 1
            coeffs = sectype.array(shape=shape)
        elif isinstance(value, SecureFiniteFieldArray):
            coeffs = value
        elif isinstance(value, Polynomial):
            sectype = sectype or runtime.SecFld(value.p)
            coeffs = sectype.array(np.array(list(value), dtype=object))
        elif isinstance(value, (np.ndarray, list, tuple)):
            if sectype is None:
                raise TypeError('sectype required for plain coefficients')
            coeffs = sectype.array(np.asarray(value, dtype=object))
        else:
            raise TypeError(
                'None, polynomial, int array, or secure field array required')
        super().__init__(coeffs)
        if self.sectype is None:
            raise ValueError('sectype missing')

    @property
    def sectype(self):
        """Secure type of the coefficients."""
        return self.share.sectype

    def set_share(self, value):
        self.share.set_share(value.share)

    def _coerce(self, other):
        if isinstance(other, secpoly):
            if self.sectype != other.sectype:
                raise TypeError('inconsistent sectypes')
            return other
        return secpoly(other, self.sectype)

    # -- ring operations (on secure arrays) --------------------------------

    @staticmethod
    def _add(a, b):
        if len(a) == len(b):
            return a + b

        if len(a) < len(b):
            a, b = b, a
        return runtime.np_concatenate((a[:len(b)] + b, a[len(b):]))

    @staticmethod
    def _sub(a, b):
        m, n = len(a), len(b)
        if m == n:
            return a - b

        if m > n:
            return runtime.np_concatenate((a[:n] - b, a[n:]))

        b = runtime.np_negative(b)
        return runtime.np_concatenate((a + b[:m], b[m:]))

    @staticmethod
    def _mul(a, b):
        if len(a) == 0 or len(b) == 0:
            return type(a)(np.array([], dtype=object))

        return runtime.np_convolve(a, b)

    def __neg__(self):
        return secpoly(runtime.np_negative(self.share))

    def __pos__(self):
        return secpoly(self.share)

    # -- selection ---------------------------------------------------------

    @staticmethod
    def _if_else(c, a, b):
        if len(a) == len(b):
            return runtime.np_where(c, a, b)

        return secpoly._add(c * secpoly._sub(a, b), b)

    @staticmethod
    def _if_swap(c, a, b):
        if len(a) == len(b):
            return runtime.np_if_swap(c, a, b)

        d = c * secpoly._sub(a, b)
        return secpoly._sub(a, d), secpoly._add(b, d)

    # -- indexing / shifts / truncation ------------------------------------

    def __getitem__(self, key):
        if not isinstance(key, int):
            raise IndexError('use int for indexing secure polynomials')

        if key < 0:
            raise IndexError('negative index not allowed for secure polynomials')

        if key >= len(self.share):
            return self.sectype(0)

        return self.share[key]

    @staticmethod
    def _lshift(a, n):
        if not len(a):
            return runtime.np_copy(a)

        return runtime.np_concatenate((np.zeros(n, dtype=object), a))

    def __lshift__(self, n):
        """Multiply polynomial by X^n."""
        return secpoly(secpoly._lshift(self.share, n))

    @staticmethod
    def _rshift(a, n):
        return a[n:]

    def __rshift__(self, n):
        """Quotient of polynomial divided by X^n."""
        return secpoly(secpoly._rshift(self.share, n))

    def truncate(self, n):
        """Truncate polynomial modulo X^n, n >= 0."""
        return secpoly(self.share[:n])

    def copy(self):
        """Copy of polynomial."""
        return secpoly(runtime.np_copy(self.share))

    # -- secret degree / monic / reverse -----------------------------------

    @staticmethod
    def _degree(a):
        if not len(a):
            return type(a).sectype(-1)

        # leading-zero count via first nonzero in the reversed coefficients
        return len(a) - 1 - runtime.np_find(runtime.np_flip(a) == 0, 0, bits=True)

    def degree(self):
        """Secret degree of polynomial (-1 for the zero polynomial)."""
        return secpoly._degree(self.share)

    @staticmethod
    def _monic(a, lc_pinv=False):
        if not len(a):
            return (a, type(a).sectype(0)) if lc_pinv else a

        d = secpoly._degree(a)
        n = len(a)
        x = runtime.np_fromlist(runtime.unit_vector(d + 1, n + 1))
        lc = x @ runtime.np_concatenate((np.zeros(1, dtype=object), a))
        z = d == -1
        lc1 = 1 / (lc + z)  # guard the zero polynomial
        a = a * lc1
        if lc_pinv:
            return a, lc1 - z * lc1  # pseudoinverse: 0 for the zero poly

        return a

    def monic(self):
        """Monic version of polynomial (zero polynomial unchanged)."""
        return secpoly(secpoly._monic(self.share))

    @staticmethod
    def _reverse(a, d=None):
        n = len(a)
        if isinstance(d, int):
            if d < -1:
                raise ValueError('degree d must be at least -1')

            if d + 1 < n:
                return runtime.np_flip(a[:d+1])

            if d + 1 > n:
                return runtime.np_concatenate(
                    (np.zeros(d + 1 - n, dtype=object), runtime.np_flip(a)))

            return runtime.np_flip(a)

        if not n:
            return a

        if d is None:
            d = secpoly._degree(a)
        else:
            if not isinstance(d, type(a).sectype):
                d = runtime.convert(d, type(a).sectype)
            # oblivious truncation: keep positions <= d
            x = runtime.np_fromlist(runtime.unit_vector(d + 1, n + 1)[1:])
            mask = runtime.np_flip(runtime.np_cumsum(runtime.np_flip(x)))
            a = a * mask

        # rotate so position d lands at 0, flipped: one secret matmul
        u = runtime.np_fromlist(runtime.unit_vector(d, n))
        rot = runtime.np_stack([runtime.np_roll(u, -i) for i in range(n)])
        return rot @ a

    def reverse(self, d=None):
        """Reverse coefficients with respect to degree d (secret degree
        of the polynomial itself when d is None)."""
        return secpoly(secpoly._reverse(self.share, d=d))

    # -- oblivious division ------------------------------------------------

    @staticmethod
    def _roll_secret(a, shift):
        """Circular shift of secure array a by a secret amount in [0, n]."""
        n = len(a)
        uf = runtime.unit_vector(shift, n + 1)  # allow shift == n ...
        u = runtime.np_fromlist([uf[0] + uf[n]] + uf[1:n])  # ... == shift 0
        rows = runtime.np_stack(
            [runtime.np_roll(runtime.np_flip(u), i + 1) for i in range(n)])
        return rows @ a

    @staticmethod
    def _div(a, b):
        """Quotient a // b for nonzero b, hiding both degrees.

        Random self-reducibility: multiply the reversed divisor by a random
        invertible power series mod X^m, open the product (uniformly random,
        leaks nothing), invert it on the host, and unblind.  One opening,
        otherwise local kernels (reference: secpols.py:355-403).
        """
        m, n = len(a), len(b)
        if not m:
            return a

        stype = type(a)
        secfld = stype.sectype
        field = secfld.field
        poly = GFpX(field.modulus)

        degb = secpoly._degree(b)
        ar = runtime.np_flip(a)
        br = secpoly._roll_secret(runtime.np_flip(b), degb + 1)

        if field.order.bit_length() < 2 * runtime.options.sec_param:
            # small/medium field: force invertible constant term by rejection
            while True:
                s0 = runtime._wrap(secfld, runtime._np_randoms(field, 1),
                                   array=True, integral=False)
                if not runtime.is_zero_public(s0[0]):
                    break
            s = runtime._wrap(secfld, runtime._np_randoms(field, m - 1),
                              array=True, integral=False)
            s = runtime.np_concatenate((s0, s))
        else:
            s = runtime._wrap(secfld, runtime._np_randoms(field, m),
                              array=True, integral=False)
        u = secpoly._mul(br, s)[:m]   # random invertible series mod X^m
        u = runtime.output(u, raw=True)
        u = poly([int(c) for c in u.value.tolist()])
        u = poly.invert(u, poly([0]*m + [1]))  # u^-1 mod X^m on the host
        uarr = field.array(np.array(([0] if int(u) == 0 else list(u))
                                    + [0] * (m - max(len(list(u)), 1)),
                                    dtype=object))
        v = secpoly._mul(s, secfld.array(uarr))[:m]
        q = secpoly._mul(ar, v)[:m]
        l = max(m, n).bit_length() + runtime.options.sec_param
        degb_i = runtime.convert(degb, runtime.SecInt(l=l))
        d = runtime.max(m - degb_i, 0) - 1
        return secpoly._reverse(q, d)

    @staticmethod
    def _mod(a, b):
        if b is None:  # see _powmod
            return a

        q = secpoly._div(a, b)
        return secpoly._sub(a, secpoly._mul(q, b))[:len(b) - 1]

    # -- modular powers ----------------------------------------------------

    @staticmethod
    def _powmod(a, n, modulus=None):
        if n == 0:
            return type(a).sectype.array(np.array([1], dtype=object))

        if n < 0:
            if modulus is None:
                raise ValueError('negative exponent')

            a = secpoly._invert(a, modulus)
            n = -n
        c = a
        for i in range(n.bit_length() - 2, -1, -1):
            c = secpoly._mod(secpoly._mul(c, c), modulus)
            if (n >> i) & 1:
                c = secpoly._mod(secpoly._mul(c, a), modulus)
        return c

    @staticmethod
    def powmod(a, n, b):
        """Polynomial a to the (public) power n modulo nonzero b."""
        return secpoly(secpoly._powmod(a.share, n, modulus=b.share))

    def __pow__(self, other):
        return secpoly(secpoly._powmod(self.share, other))

    # -- gcd family (x-adic divsteps) --------------------------------------

    @staticmethod
    def _gcpx(a, b):
        """Secure largest power of x dividing both a and b."""
        x = a != 0
        y = b != 0
        z = x + y - x * y
        _, e = runtime.np_find(z, 1, e=None)
        return e

    @staticmethod
    def _gcd(a, b):
        if len(a) < len(b):
            a, b = b, a
        n = len(a)
        if not n:
            return a

        if n > len(b):
            b = runtime.np_concatenate((b, np.zeros(n - len(b), dtype=object)))
        e = secpoly._gcpx(a, b)
        f = secpoly._roll_secret(a, n - e)
        g = secpoly._roll_secret(b, n - e)
        c = f[0] == 0
        f, g = runtime.np_if_swap(c, f, g)
        # f[0] != 0 now, unless f = g = 0
        stype = type(a)
        secint = runtime.SecInt(
            l=1 + max(n.bit_length(), stype.sectype.field.modulus.bit_length()))
        delta = secint(1)
        for i in range(2*n - 1):
            delta_gt0 = 1 - runtime.sgn((delta - 1 - (i % 2)) / 2,
                                        l=max((i + 1).bit_length(), 1), LT=True)
            _delta_gt0 = runtime.convert(delta_gt0, stype.sectype)
            g_0 = g[0] != 0
            _g_0 = runtime.convert(g_0, secint)
            f, g = secpoly._if_swap(_delta_gt0 * g_0, f, g)
            delta *= 1 - 2 * delta_gt0 * _g_0
            g = (f[0]*g - g[0]*f)[1:]  # x | g now; exact shift
            delta += 1
            if not len(g):
                break
        f = secpoly._monic(f)
        return secpoly._roll_secret(f, e)

    @staticmethod
    def _divstepsx(n, a, b):
        """n constant-time x-adic divsteps on (a, b), a[0] = 1 enforced.

        Returns delta, f, g and the Bezout rows (u, v, q, r) with
        f = u*a + v*b and g = q*a + r*b (all x-adically shifted)."""
        stype = type(a)
        secfld = stype.sectype
        alpha = 1 / a[0]
        f, g = a, b
        a, b = alpha * a, alpha * b
        u = r = secfld.array(np.array([1], dtype=object))
        v = q = secfld.array(np.array([], dtype=object))
        secint = runtime.SecInt(
            l=1 + max(n.bit_length(), stype.sectype.field.modulus.bit_length()))
        delta = secint(1)
        for i in range(n):
            if not len(g):
                continue
            delta_gt0 = 1 - runtime.sgn((delta - 1 - (i % 2)) / 2,
                                        l=max((i + 1).bit_length(), 1), LT=True)
            _delta_gt0 = runtime.convert(delta_gt0, secfld)
            g_0 = g[0] != 0
            _g_0 = runtime.convert(g_0, secint)
            c = _delta_gt0 * g_0
            f, g = secpoly._if_swap(c, f, g)
            u, q = secpoly._if_swap(c, u, q)
            v, r = secpoly._if_swap(c, v, r)
            delta *= 1 - 2 * delta_gt0 * _g_0
            f0, g0 = f[0], g[0]
            g = f0*g - g0*f
            q = secpoly._sub(f0*q, g0*u)
            r = secpoly._sub(f0*r, g0*v)
            r0 = r[0]
            r = secpoly._sub(r, r0 * a)   # force r[0] = 0 ...
            q = secpoly._add(q, r0 * b)   # ... compensating via q
            g, r, q = g[1:], r[1:], q[1:]
            delta += 1
        return delta, f, g, (u, v, q, r)

    @staticmethod
    def _gcdext(a, b):
        m, n = len(a), len(b)
        if m < n:
            a = runtime.np_concatenate((a, np.zeros(n - m, dtype=object)))
        elif n < m:
            b = runtime.np_concatenate((b, np.zeros(m - n, dtype=object)))
        n = len(a)
        e = secpoly._gcpx(a, b)
        f = secpoly._roll_secret(a, n - e)
        g = secpoly._roll_secret(b, n - e)
        c = f[0] == 0
        f, g = runtime.np_if_swap(c, f, g)
        _, f, g, (u, v, _, _) = secpoly._divstepsx(2*n - 1, f, g)
        f, lc1 = secpoly._monic(f, lc_pinv=True)
        f = secpoly._roll_secret(f, e)
        u, v = runtime.np_if_swap(c, u * lc1, v * lc1)
        return f, u, v

    @staticmethod
    def _invert(a, b):
        return secpoly._gcdext(a, b)[1]

    @staticmethod
    def gcdext(a, b):
        """Extended GCD: (g, u, v) with g = gcd(a, b) = u*a + v*b."""
        f, u, v = secpoly._gcdext(a.share, b.share)
        return secpoly(f), secpoly(u), secpoly(v)

    @staticmethod
    def invert(a, b):
        """Inverse of polynomial a modulo b (assumed to exist)."""
        return secpoly(secpoly._invert(a.share, b.share))

    @staticmethod
    def is_irreducible(a):
        """Rabin-style irreducibility test for polynomial a."""
        D = len(a.share) - 1  # public degree bound
        if D <= 0:
            return a.sectype(0)

        p = a.sectype.field.modulus
        poly = GFpX(p)
        X = secpoly(poly('x'))
        b = X
        c = []
        for _ in range(D // 2):
            b = secpoly.powmod(b, p, a)
            c.append(secpoly.gcd(b - X, a))
        c = _reduce(operator.mul, c, secpoly(poly(1)))
        d = a.degree()
        return (d != -1) * (d != 0) * (c == poly(1))

    # -- comparisons (lexicographic; zero smallest) ------------------------

    @staticmethod
    def _lt(a, b):
        d = secpoly._degree(secpoly._sub(a, b))
        n = max(len(a), len(b))
        x = runtime.np_fromlist(runtime.unit_vector(d + 1, n + 1)[1:])
        av = a @ x[:len(a)] if len(a) else type(a).sectype(0)
        bv = b @ x[:len(b)] if len(b) else type(b).sectype(0)
        secfld = type(a).sectype
        secint = runtime.SecInt(l=secfld.field.order.bit_length() + 2)
        av, bv = runtime.convert([av, bv], secint)
        return runtime.convert(av < bv, secfld)

    def __eq__(self, other):
        other = self._coerce(other)
        d = secpoly._sub(self.share, other.share)
        if not len(d):
            return self.sectype(1)

        return runtime.np_all(d == 0)

    def __ne__(self, other):
        return 1 - self.__eq__(other)

    __hash__ = None

    # -- evaluation --------------------------------------------------------

    def __call__(self, x):
        """Evaluate polynomial at public or secure point x (Horner)."""
        cs = runtime.np_tolist(self.share) if len(self.share) else []
        if not cs:
            return self.sectype(0)

        acc = cs[-1]
        for c in reversed(cs[:-1]):
            acc = acc * x + c
        return acc

    def __repr__(self):
        return f'secpoly(bound={len(self.share)}, sectype={self.sectype.__name__})'

    # -- runtime I/O hooks -------------------------------------------------

    @classmethod
    def _input(cls, x, senders):
        """Input hook: share coefficient arrays per sender."""
        shares = [runtime.input(a.share, senders) for a in x]
        return [[secpoly(s) for s in per_poly]
                for per_poly in map(list, zip(*shares))]

    @classmethod
    def _output(cls, x, receivers, threshold):
        """Output hook: open coefficient arrays, return gfpx polynomials."""
        out = []
        for a in x:
            field = a.sectype.field
            poly = GFpX(field.modulus)
            y = runtime.output(a.share, receivers, threshold, raw=True)
            if y is None:
                out.append(None)
            else:
                out.append(poly([int(c) for c in y.value.tolist()]))
        return out


# ---------------------------------------------------------------------------
# generated operator / wrapper surface
#
# The protocol code above works on raw secure coefficient arrays; the
# public dunders and named helpers are stamped out from the tables below
# (forward + reflected variants share one factory).
# ---------------------------------------------------------------------------

def _poly_binop(impl, post, swapped):
    def op(self, other):
        other = self._coerce(other)
        a, b = (other.share, self.share) if swapped \
            else (self.share, other.share)
        return post(impl(a, b))
    return op


def _qr(a, b):
    """(quotient, remainder) pair on raw coefficient arrays."""
    q = secpoly._div(a, b)
    rem = secpoly._sub(a, secpoly._mul(q, b))[:len(b) - 1]
    return secpoly(q), secpoly(rem)


def _mul_op(self, other):
    if isinstance(other, (int, sectypes.SecureNumber)):
        return secpoly(self.share * other)           # scalar scaling
    other = self._coerce(other)
    return secpoly(secpoly._mul(self.share, other.share))


def _install_surface():
    ident = lambda r: r                              # noqa: E731
    complement = lambda r: 1 - r                     # noqa: E731
    dunders = {
        '__add__': (secpoly._add, secpoly, False),
        '__radd__': (secpoly._add, secpoly, False),
        '__sub__': (secpoly._sub, secpoly, False),
        '__rsub__': (secpoly._sub, secpoly, True),
        '__floordiv__': (secpoly._div, secpoly, False),
        '__rfloordiv__': (secpoly._div, secpoly, True),
        '__mod__': (secpoly._mod, secpoly, False),
        '__rmod__': (secpoly._mod, secpoly, True),
        '__divmod__': (_qr, ident, False),
        '__rdivmod__': (_qr, ident, True),
        '__lt__': (secpoly._lt, ident, False),
        '__gt__': (secpoly._lt, ident, True),
        '__le__': (secpoly._lt, complement, True),
        '__ge__': (secpoly._lt, complement, False),
    }
    for name, (impl, post, swapped) in dunders.items():
        setattr(secpoly, name, _poly_binop(impl, post, swapped))
    secpoly.__mul__ = _mul_op
    secpoly.__rmul__ = _mul_op

    def named(impl, doc):
        def op(a, b):
            return secpoly(impl(a.share, b.share))
        op.__doc__ = doc
        return staticmethod(op)

    secpoly.add = named(secpoly._add, 'Add polynomials a and b of secret degree.')
    secpoly.sub = named(secpoly._sub, 'Subtract polynomial b from a, degrees secret.')
    secpoly.mul = named(secpoly._mul, 'Multiply polynomials a and b of secret degree.')
    secpoly.mod = named(secpoly._mod, 'Reduce polynomial a modulo nonzero polynomial b.')
    secpoly.gcd = named(secpoly._gcd, 'Greatest common divisor of polynomials a and b.')

    def if_else(c, a, b):
        """Secure selection between polynomials a and b by condition c."""
        return secpoly(secpoly._if_else(c, a.share, b.share))

    def if_swap(c, a, b):
        """Secure conditional swap of polynomials a and b by condition c."""
        x, y = secpoly._if_swap(c, a.share, b.share)
        return secpoly(x), secpoly(y)

    secpoly.if_else = staticmethod(if_else)
    secpoly.if_swap = staticmethod(if_swap)


_install_surface()
