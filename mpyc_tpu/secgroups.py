"""Secure (secret-shared) finite group elements.

Capability parity target: /root/reference/mpyc/secgroups.py (945 LoC).
Secure counterparts for every mpyc_tpu.fingroups family:

  * symmetric groups       — permutation tuples of secure field elements,
    composed via oblivious secret-index reads (seclist)
  * quadratic residues / Schnorr groups — one secure field element
  * elliptic curves        — coordinate tuples; the *same* exception-free
    curve formulas from fingroups run verbatim on secure coordinates
    (requires oblivious coordinate systems: Edwards, Weierstrass
    projective)
  * hyperelliptic curves   — generic Cantor on secure polynomials
    (secpoly divsteps machinery) and the Costello--Lauter straight-line
    genus-2 formulas on secure 6-tuples
  * class groups           — forms over secure integers with the
    Agarwal--Frandsen division-free reduction loop

plus the three secure exponentiation protocols (secgroups.py:264-313):
secret base/secret exponent (bit ladder), public base/secret exponent
(Lagrange-local exponentiations combined with log-depth reduce), and
public base/public output (multi-exponentiation over opened local
exponents via transfer).
"""

import functools
import inspect

from mpyc_tpu.gfpx import GFpX
from mpyc_tpu.finfields import FiniteFieldElement
from mpyc_tpu import fingroups as fg
from mpyc_tpu.thresha import _recombination_vector
from mpyc_tpu.sectypes import SecureObject, SecureFiniteField, SecureInteger
from mpyc_tpu.secpols import secpoly
from mpyc_tpu.seclists import seclist
import mpyc_tpu.mpctools as mpctools

runtime = None


class SecureFiniteGroup(SecureObject):
    """Abstract base class for secure finite group elements."""

    __slots__ = ()

    group: type
    sectype: type
    identity = None

    def __matmul__(self, other):
        cls = type(self)
        if self is other:
            return cls.operation2(self)

        if isinstance(other, cls.group):
            other = cls(other)
        elif not isinstance(other, cls):
            return NotImplemented

        return cls.operation(self, other)

    def __rmatmul__(self, other):
        if not isinstance(other, self.group):
            return NotImplemented

        return type(self).operation(type(self)(other), self)

    def __invert__(self):
        return type(self).inversion(self)

    def __xor__(self, other):
        return type(self).repeat(self, other)

    def __add__(self, other):
        if not self.group.is_additive:
            raise TypeError('group not additive')

        return type(self).__matmul__(self, other)

    def __radd__(self, other):
        if not self.group.is_additive:
            raise TypeError('group not additive')

        return type(self).__rmatmul__(self, other)

    def __neg__(self):
        if not self.group.is_additive:
            raise TypeError('group not additive')

        return type(self).__invert__(self)

    def __sub__(self, other):
        if not self.group.is_additive:
            raise TypeError('group not additive')

        other = type(other).__invert__(other)
        return type(self).__matmul__(self, other)

    def __rsub__(self, other):
        if not self.group.is_additive:
            raise TypeError('group not additive')

        a = type(self).__invert__(self)
        return type(self).__rmatmul__(a, other)

    def __mul__(self, other):
        if self.group.is_multiplicative:
            return type(self).__matmul__(self, other)

        if self.group.is_additive:
            return NotImplemented

        raise TypeError('* not defined for group')

    def __rmul__(self, other):
        if self.group.is_multiplicative:
            if self.group.is_abelian:
                return type(self).__matmul__(self, other)

            return type(self).__matmul__(type(self)(other), self)

        if self.group.is_additive:
            return type(self).__xor__(self, other)

        raise TypeError('* not defined for group')

    def __truediv__(self, other):
        if not self.group.is_multiplicative:
            raise TypeError('group not multiplicative')

        other = type(other).__invert__(other)
        return type(self).__matmul__(self, other)

    def __rtruediv__(self, other):
        if not self.group.is_multiplicative:
            raise TypeError('group not multiplicative')

        a = type(self).__invert__(self)
        if isinstance(other, int) and other == 1:
            return a

        return type(self).__rmatmul__(a, other)

    def __pow__(self, other):
        if not self.group.is_multiplicative:
            raise TypeError('group not multiplicative')

        return type(self).__xor__(self, other)

    def __eq__(self, other):
        secgrp = type(self)
        if isinstance(other, self.group):
            other = secgrp(other)
        elif not isinstance(other, secgrp):
            return NotImplemented

        return secgrp.equality(self, other)

    def __ne__(self, other):
        return 1 - self.__eq__(other)

    __hash__ = None

    @classmethod
    def operation(cls, a, b, /):
        """Return a @ b."""
        raise NotImplementedError

    @classmethod
    def operation2(cls, a, /):
        """Return a @ a."""
        return cls.operation(a, a)

    @classmethod
    def inversion(cls, a, /):
        """Return @-inverse of a (written ~a)."""
        raise NotImplementedError

    @classmethod
    def equality(cls, a, b, /):
        """Return a == b as a secure bit."""
        raise NotImplementedError

    def inverse(self):
        """Inverse of self (convenience method)."""
        return self.inversion(self)

    @classmethod
    def _flat(cls, a):
        """Elementary share list of one secure group element."""
        if isinstance(a.share, tuple):
            return list(a.share)

        return [a.share]

    @classmethod
    def _input(cls, x, senders):
        """Input hook: share the elementary values per sender."""
        is_tuple = isinstance(x[0].share, tuple)
        if is_tuple:
            r = len(x[0].share)
            flat = [c for a in x for c in a.share]
        else:
            flat = [a.share for a in x]
        shares = runtime.input(flat, senders)
        out = []
        for s in shares:
            if is_tuple:
                s = [tuple(s[i:i + r]) for i in range(0, len(s), r)]
            out.append([cls(v) for v in s])
        return out

    @classmethod
    def _output(cls, x, receivers, threshold):
        """Output hook: open the elementary values, rebuild group elts."""
        is_tuple = isinstance(x[0].share, tuple)
        if is_tuple:
            r = len(x[0].share)
            flat = [c for a in x for c in a.share]
        else:
            flat = [a.share for a in x]
        y = runtime.output(flat, receivers, threshold)
        if y[0] is None:
            return [None] * len(x)

        if issubclass(cls, SecureSymmetricGroupElement):
            y = list(map(int, y))
        if is_tuple:
            y = [y[i:i + r] for i in range(0, len(y), r)]
        return [cls.group(a, check=False) for a in y]

    @classmethod
    def if_else(cls, c, a, b):
        """Secure selection between group elements a, b by condition c."""
        if not isinstance(c, cls.sectype):
            c = runtime.convert(c, cls.sectype)
        if not isinstance(a, SecureObject):
            a = cls(a)
        if not isinstance(b, SecureObject):
            b = cls(b)
        if isinstance(a.share, tuple):
            a = [v.share for v in a.share]
            b = [v.share for v in b.share]
        else:
            a = a.share
            b = b.share
        return cls(runtime.if_else(c, a, b))

    @classmethod
    def repeat(cls, a, x):
        """Return the x-th @-power of a: any mix of public/secret base a
        and public/secret integral exponent x."""
        if (isinstance(a, (SecureQuadraticResidue, SecureSchnorrGroupElement))
                and isinstance(x, int)):
            return type(a)(a.share**x)  # fast field exponentiation

        if isinstance(x, (int, FiniteFieldElement)):
            # public exponent: plain binary ladder over secure operations
            return type(a).group.repeat(a, x)

        if not isinstance(a, SecureObject):
            assert isinstance(x, (SecureFiniteField, SecureInteger))
            return repeat_public_base_secret_output(a, x, cls)

        return repeat_secret_base_secret_output(a, x, cls)

    @classmethod
    def repeat_public(cls, a, x):
        """Public output a^x for public base(s) a and secret exponent(s) x."""
        return repeat_public_base_public_output(a, x)


def repeat_secret_base_secret_output(a, x, secgrp):
    """[a]^[x] -> [a^x]: oblivious square-and-multiply over the bits of x."""
    x = runtime.to_bits(x)
    b = a
    c = secgrp.if_else(x[0], a, secgrp.identity)
    for x_i in x[1:]:
        b = b @ b
        c = secgrp.if_else(x_i, c @ b, c)
    return c


def _local_exponents(x, pid=None):
    """Party pid's Lagrange-weighted share(s) of x as public integers
    (pid defaults to the own pid; on the co-located simulator plane any
    party's local exponent can be extracted from the stacked share)."""
    import numpy as _np

    field = type(x[0]).field
    m = len(runtime.parties)
    if pid is None:
        pid = runtime.pid
    if m == 1:
        lambda_i = field(1)
    else:
        lambda_i = _recombination_vector(field, range(1, m+1), 0)[pid]
    sim = getattr(runtime, 'is_simulator', False)
    es = []
    for xi in x:
        sh = runtime._share(xi)
        if sim:
            v = field(int(_np.asarray(sh.value).reshape(-1)[pid]))
        else:
            v = field(int(sh.value[()]))
        e_i = int(lambda_i * v)  # signed representative iff field.is_signed
        if isinstance(xi, SecureFiniteField) and xi.subfield is not None:
            e_i %= field.characteristic
        es.append(e_i)
    return es


def repeat_public_base_secret_output(a, x, secgrp):
    """a^[x] -> [a^x]: each party exponentiates by its Lagrange-local
    exponent and inputs the result; a log-depth reduce combines them
    (reference: secgroups.py:275-291)."""
    if getattr(runtime, 'is_simulator', False):
        m = len(runtime.parties)
        c = [runtime.input(
                secgrp(secgrp.group.repeat(a, _local_exponents([x], p)[0])),
                senders=p) for p in range(m)]
        return mpctools.reduce(secgrp.operation, c)
    e_i = _local_exponents([x])[0]
    c_i = secgrp.group.repeat(a, e_i)
    c = runtime.input(secgrp(c_i))
    return mpctools.reduce(secgrp.operation, c)


def repeat_public_base_public_output(a, x):
    """Multi-exponentiation prod a_j^x_j with public output
    (reference: secgroups.py:294-313)."""
    if not isinstance(a, list):
        a, x = [a], [x]
    group = type(a[0])
    if getattr(runtime, 'is_simulator', False):
        m = len(runtime.parties)
        cs = [functools.reduce(group.operation,
                               map(group.repeat, a, _local_exponents(x, p)))
              for p in range(m)]
        return functools.reduce(group.operation, cs)
    e_i = _local_exponents(x)
    c_i = functools.reduce(group.operation, map(group.repeat, a, e_i))
    c = runtime.transfer(c_i)
    return functools.reduce(group.operation, c)


class SecureSymmetricGroupElement(SecureFiniteGroup):
    """Secure permutations: tuples of secure field elements."""

    __slots__ = ()

    def __init__(self, value=None):
        n = self.group.degree
        if value is None:
            value = [None] * n
        elif isinstance(value, self.group):
            value = value.value
        elif not (isinstance(value, (tuple, list)) and len(value) == n):
            raise ValueError(f'tuple/list of length {n} required')

        secfld = self.sectype
        value = tuple(v if isinstance(v, secfld) else secfld(v) for v in value)
        super().__init__(value)

    def set_share(self, value):
        for a, b in zip(self.share, value):
            a.set_share(b.share)

    @classmethod
    def operation(cls, p, q, /):
        """First p then q: oblivious reads q[p[i]]."""
        q = seclist(q.share)
        return cls(tuple(q[j] for j in p.share))

    @classmethod
    def inversion(cls, p, /):
        n = len(p.share)
        q = seclist(p.share)  # dummy of the right type
        for i in range(n):
            q[p.share[i]] = i
        return cls(tuple(q))

    @classmethod
    def equality(cls, p, q, /):
        return seclist(p.share) == seclist(q.share)


class SecureQuadraticResidue(SecureFiniteGroup):
    """Secure quadratic residues: one secure field element."""

    __slots__ = ()

    def __init__(self, value=None):
        if isinstance(value, self.group):
            value = value.value
        secfld = self.sectype
        if not isinstance(value, secfld):
            value = secfld(value)
        super().__init__(value)

    def set_share(self, value):
        self.share.set_share(value.share)

    @classmethod
    def operation(cls, a, b, /):
        return cls(a.share * b.share)

    @classmethod
    def inversion(cls, a, /):
        return cls(1/a.share)

    @classmethod
    def equality(cls, a, b, /):
        return a.share == b.share

    @classmethod
    def decode(cls, M, Z, gap=128):
        """Decode message from given group elements."""
        return (M.share - Z.share) / gap


class SecureSchnorrGroupElement(SecureFiniteGroup):
    """Secure Schnorr group elements: one secure field element."""

    __slots__ = ()

    def __init__(self, value=None):
        if isinstance(value, self.group):
            value = value.value
        secfld = self.sectype
        if not isinstance(value, secfld):
            value = secfld(value)
        super().__init__(value)

    def set_share(self, value):
        self.share.set_share(value.share)

    @classmethod
    def operation(cls, a, b, /):
        return cls(a.share * b.share)

    @classmethod
    def inversion(cls, a, /):
        return cls(1/a.share)

    @classmethod
    def equality(cls, a, b, /):
        return a.share == b.share

    @classmethod
    def decode(cls, M, Z):
        """Decode message from M = g^m by bounded secure search."""
        g = cls.group.generator
        h = cls.group.identity
        x = [h]
        for _ in range(15):
            h = cls.group.operation(h, g)
            x.append(h)
        return runtime.find(x, M, bits=False)


class SecureEllipticCurvePoint(SecureFiniteGroup):
    """Secure elliptic curve points: coordinate tuples of secure field
    elements, running the oblivious curve formulas from fingroups."""

    __slots__ = ()

    def __init__(self, value=None):
        n = len(self.group.identity.value)
        if value is None:
            value = [None] * n
        elif isinstance(value, self.group):
            value = value.value
        elif not (isinstance(value, (tuple, list)) and len(value) == n):
            raise ValueError(f'tuple/list of length {n} required')

        secfld = self.sectype
        value = tuple(v if isinstance(v, secfld) else secfld(v) for v in value)
        super().__init__(value)

    def set_share(self, value):
        for a, b in zip(self.share, value):
            a.set_share(b.share)

    def __getitem__(self, key):
        return self.share[key]

    @classmethod
    def operation(cls, a, b, /):
        group = cls.group
        c = group.operation(group(a.share, check=False),
                            group(b.share, check=False))
        return cls(c)

    @classmethod
    def inversion(cls, a, /):
        group = cls.group
        c = group.inversion(group(a.share, check=False))
        return cls(c)

    def normalize(self):
        """Convert to unique (affine) representation."""
        cls = type(self)
        group = cls.group
        if issubclass(group, fg.WeierstrassProjective):
            secfld = cls.sectype
            x, y, z = self
            zis0 = z == 0
            z_inv = 1 / (z + zis0)
            c = runtime.if_else(zis0, [secfld(0), secfld(1)], [x, y])
            c = runtime.scalar_mul(z_inv, c)
            return cls(c + [1 - zis0])

        c = group(self.share, check=False).normalize()
        return cls(c)

    @classmethod
    def equality(cls, a, b, /):
        return runtime.all(u == v for u, v in
                           zip(a.normalize().share, b.normalize().share))

    @classmethod
    def decode(cls, M, Z, gap=256):
        """Decode message from given group elements."""
        return (M.normalize()[0] - Z.normalize()[0]) / gap


class SecureHyperellipticCurveDivisor(SecureFiniteGroup):
    """Secure hyperelliptic divisors in Mumford form: a pair of secure
    polynomials, composed with Cantor's algorithm on secpoly arithmetic."""

    __slots__ = ()

    def __init__(self, value=None):
        if value is None:
            pass
        elif isinstance(value, self.group):
            value = value.value
        elif not (isinstance(value, (tuple, list)) and len(value) == 2):
            raise ValueError('tuple/list of length 2 required')

        secfld = runtime.SecFld(self.group.field.modulus)
        if value is None:
            value = (secpoly(None, sectype=secfld, shape=(self.group.genus+1,)),
                     secpoly(None, sectype=secfld, shape=(self.group.genus,)))
        else:
            value = tuple(a if isinstance(a, secpoly) else secpoly(a, secfld)
                          for a in value)
        super().__init__(value)

    def set_share(self, value):
        for a, b in zip(self.share, value):
            a.set_share(b.share)

    def __getitem__(self, key):
        return self.share[key]

    @classmethod
    def _reduce(cls, D):
        """Secure Cantor reduction of a semi-reduced divisor."""
        u, v = D
        poly = GFpX(cls.sectype.field.modulus)
        genus = cls.group.genus
        steps = 1 if genus <= 2 else 2
        for _ in range(steps):
            c = u >> genus+1 == poly(0)
            _u, _v = u, v
            u_ = (cls.group.f - v**2) // u
            z = u_ == poly(0)
            u_ = secpoly.if_else(z, u_ + poly(1), u_)  # avoid division by 0
            u, v = u_, (-v) % u_
            c = c + z - c*z
            u = secpoly.if_else(c, _u, u)
            v = secpoly.if_else(c, _v, v)
            u = u.truncate(genus + 3)
            v = v.truncate(genus + 2)

        u = u.truncate(genus + 1)
        v = v.truncate(genus)
        u = u.monic()
        return u, v

    @classmethod
    def operation(cls, D1, D2, /):
        u1, v1 = D1
        u2, v2 = D2
        d, _, h2 = secpoly.gcdext(u1, u2)
        d, h, h3 = secpoly.gcdext(d, v1 + v2)
        h2 *= h
        u = u1 * u2 // d**2
        v = (v2 + (h2 * u2 * (v1 - v2) + h3 * (cls.group.f - v2**2)) // d) % u
        return cls(cls._reduce((u, v)))

    @classmethod
    def operation2(cls, D, /):
        u, v = D
        d, _, h3 = secpoly.gcdext(u, v + v)
        u = (u // d)**2
        v = (v + h3 * ((cls.group.f - v**2) // d)) % u
        return cls(cls._reduce((u, v)))

    @classmethod
    def inversion(cls, D, /):
        u, v = D
        return cls((u, -v))

    @classmethod
    def equality(cls, D1, D2, /):
        e0 = D1.share[0] == D2.share[0]
        e1 = D1.share[1] == D2.share[1]
        return e0 * e1

    @classmethod
    def decode(cls, M, Z):
        """Decode message from given group elements."""
        return (M.share[0][0] - Z.share[0][0]) / cls.group.gap


class SecureHCDivisorCL(SecureFiniteGroup):
    """Secure genus-2 divisors in Costello--Lauter extended coordinates:
    6-tuples of secure field elements driven through the straight-line
    generic-case formulas (fingroups.HCDivisorCL._cl_add/_cl_dbl)."""

    __slots__ = ()

    def __init__(self, value=None):
        if value is None:
            value = (None,) * 6
        elif isinstance(value, self.group):
            value = value.value
        elif not (isinstance(value, (tuple, list)) and len(value) == 6):
            raise ValueError('tuple/list of length 6 required')

        secfld = runtime.SecFld(self.group.field.modulus)
        value = tuple(v if isinstance(v, secfld) else secfld(v) for v in value)
        super().__init__(value)

    def set_share(self, value):
        for a, b in zip(self.share, value):
            a.set_share(b.share)

    def __getitem__(self, key):
        return self.share[key]

    @classmethod
    def operation(cls, D1, D2, /):
        return cls(cls.group._cl_add(tuple(D1.share), tuple(D2.share)))

    @classmethod
    def operation2(cls, D, /):
        f = cls.group.f
        return cls(cls.group._cl_dbl(tuple(D.share), f[2], f[3]))

    @classmethod
    def inversion(cls, D, /):
        u1, u0, v1, v0, uu1, uu0 = D.share
        return cls((u1, u0, -v1, -v0, uu1, uu0))

    @classmethod
    def equality(cls, D1, D2, /):
        return runtime.all(a == b for a, b in zip(D1.share[:4], D2.share[:4]))

    @classmethod
    def decode(cls, M, Z):
        """Decode message from given group elements."""
        return (M[0] - Z[0]) / (2*cls.group.gap)


class SecureClassGroupForm(SecureFiniteGroup):
    """Secure class group forms (a, b, c) over secure integers, with a
    division-free reduction loop (Agarwal--Frandsen, LATIN 2006)."""

    __slots__ = ()

    def __init__(self, value=None):
        if value is None:
            value = [None] * 3
        elif isinstance(value, self.group):
            value = value.value
        elif not (isinstance(value, (tuple, list)) and len(value) == 3):
            raise ValueError('tuple/list of length 3 required')

        secint = self.sectype
        value = tuple(v if isinstance(v, secint) else secint(v) for v in value)
        super().__init__(value)

    def set_share(self, value):
        for a, b in zip(self.share, value):
            a.set_share(b.share)

    def __getitem__(self, key):
        return self.share[key]

    @classmethod
    def _reduce(cls, f):
        """Secure reduction of form f, avoiding secure division in the
        main loop (Algorithm 3, Agarwal--Frandsen LATIN 2006)."""

        def tm_action(m, f):
            a, b, c = f
            return [a, 2*m * a + b, m * (m * a + b) + c]

        a, b, c = f
        secint = cls.sectype
        len_b = secint.bit_length
        for _ in range((cls.group.discriminant.bit_length() + 1) // 2):
            sgn_b = 1 - 2*runtime.sgn(b, l=len_b, LT=True)
            len_b -= 1
            sizeb = runtime._bit_length(sgn_b * b)
            sizea = runtime._bit_length(a)
            pow2 = sizeb[1] / sizea[1] / 2  # 2**(len(b) - len(a) - 1)
            m = -sgn_b * pow2
            a, b, c = runtime.if_else(sgn_b * b > 2*a,
                                      tm_action(m, (a, b, c)), [a, b, c])
            a, b, c = runtime.if_else(a > c, [c, -b, a], [a, b, c])

        m, _ = runtime._divmod(a - b, 2*a)
        a, b, c = tm_action(m, (a, b, c))
        a, b, c = runtime.if_else(a > c, [c, -b, a], [a, b, c])
        b = runtime.if_else((b < 0) * (a == c), -b, b)
        b = runtime.if_else(b == -a, -b, b)
        return a, b, c

    @classmethod
    def operation(cls, f1, f2, /):
        """Shanks composition (Cohen, Algorithm 5.4.7) on secure forms."""
        a1, b1, _ = f1
        a2, b2, c2 = f2
        s = (b1 + b2)/2
        l = type(a1).bit_length // 2
        _d, _, y1 = runtime.gcdext(a1, a2, l=l)
        d, x2, y2 = runtime.gcdext(s, _d, l=l)
        v1 = a1 / d
        v2 = a2 / d
        r = runtime._divmod(
            runtime._divmod(y1*y2, v1)[1] * (s - b2) - x2 * c2, v1)[1]
        a3 = v1*v2
        b3 = b2 + 2*v2*r
        c3 = (b3**2 - cls.group.discriminant) / (4*a3)
        return cls(cls._reduce((a3, b3, c3)))

    @classmethod
    def operation2(cls, f, /):
        a, b, c = f  # a>0, b!=0, gcd(a,b)=1 since -discriminant is prime
        x2 = runtime.inverse(b, a, l=type(a).bit_length // 2)
        _, r = runtime._divmod(x2*c, a)
        a2 = a**2
        b2 = b - 2*a*r
        c2 = (b2**2 - cls.group.discriminant) / (4*a2)
        return cls(cls._reduce((a2, b2, c2)))

    @classmethod
    def inversion(cls, f, /):
        a, b, c = f
        b = runtime.if_else((b != a) * (a != c), -b, b)
        return cls((a, b, c))

    @classmethod
    def equality(cls, f1, f2, /):
        v0 = f1.share[0] == f2.share[0]
        v1 = f1.share[1] == f2.share[1]
        return v0 * v1

    @classmethod
    def decode(cls, M, Z):
        """Decode message from given group elements."""
        return (M.share[0] - Z.share[0]) / cls.group.gap


@functools.cache
def SecGrp(group):
    """Secure version of the given finite group type."""
    if issubclass(group, fg.SymmetricGroupElement):
        base = SecureSymmetricGroupElement
        sectype = runtime.SecFld(min_order=group.degree)
    elif issubclass(group, fg.QuadraticResidue):
        base = SecureQuadraticResidue
        sectype = runtime.SecFld(2*group.order + 1)
    elif issubclass(group, fg.SchnorrGroupElement):
        base = SecureSchnorrGroupElement
        sectype = runtime.SecFld(group.field.order)
    elif issubclass(group, fg.EllipticCurvePoint):
        base = SecureEllipticCurvePoint
        sectype = runtime.SecFld(group.field.order)
        assert group.oblivious
    elif issubclass(group, fg.HCDivisorCL):
        base = SecureHCDivisorCL
        sectype = runtime.SecFld(group.field.order)
    elif issubclass(group, fg.HyperellipticCurveDivisor):
        base = SecureHyperellipticCurveDivisor
        sectype = runtime.SecFld(group.field.order)
    elif issubclass(group, fg.ClassGroupForm):
        base = SecureClassGroupForm
        sectype = runtime.SecInt(group.bit_length + 3)
    else:
        raise NotImplementedError

    name = f'SecGrp({group.__name__})'
    secgrp = type(name, (base,), {'__slots__': ()})
    secgrp.__doc__ = 'Class of secret-shared finite group elements.'
    secgrp.group = group
    secgrp.sectype = sectype
    secgrp.identity = secgrp(group.identity)
    globals()[name] = secgrp
    return secgrp


def _toSecGrpFunc(GroupFunc):
    """Mint SecXxx(...) = SecGrp(Xxx(...)) convenience constructors."""
    name = f'Sec{GroupFunc.__name__}'
    sig = inspect.signature(GroupFunc)

    def SecGrpFunc(*args, **kwargs):
        return SecGrp(GroupFunc(*args, **kwargs))

    SecGrpFunc.__name__ = name
    SecGrpFunc.__doc__ = (f'Secure version of {GroupFunc.__name__} from '
                          f'mpyc_tpu.fingroups:\n\n{GroupFunc.__doc__}')
    SecGrpFunc.__signature__ = sig
    globals()[name] = SecGrpFunc


SecSymmetricGroup: type
SecQuadraticResidues: type
SecSchnorrGroup: type
SecEllipticCurve: type
SecHyperellipticCurve: type
SecClassGroup: type
for _f in (fg.SymmetricGroup, fg.QuadraticResidues, fg.SchnorrGroup,
           fg.EllipticCurve, fg.HyperellipticCurve, fg.ClassGroup):
    _toSecGrpFunc(_f)
