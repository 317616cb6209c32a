"""Secure (secret-shared) finite group elements.

Capability parity target: /root/reference/mpyc/secgroups.py (945 LoC).
Secure counterparts for every mpyc_tpu.fingroups family:

  * symmetric groups       — permutation tuples of secure field elements,
    composed through secret one-hot matrices (unit-vector rows), which
    also makes inversion LOCAL once the rows exist
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

plus the three secure exponentiation protocols (reference
secgroups.py:264-313): secret base/secret exponent (MSB-first oblivious
double-and-multiply ladder), public base/secret exponent (Lagrange-local
exponentiations combined with a log-depth reduce), and public base/public
output (multi-exponentiation over opened local exponents via transfer).

Structural notes (deltas from the reference implementation): the share
payload plumbing (construction, set_share, indexing, if_else, I/O hooks)
lives ONCE in the base class, driven by a per-family `_slots_count`;
operator overloading is grouped by trait guards; and the symmetric-group
protocols are expressed through one-hot matrices instead of oblivious
list writes.
"""

import functools
import inspect

from mpyc_tpu.gfpx import GFpX
from mpyc_tpu.finfields import FiniteFieldElement
from mpyc_tpu import fingroups as fg
from mpyc_tpu.thresha import _recombination_vector
from mpyc_tpu.sectypes import SecureObject, SecureFiniteField, SecureInteger
from mpyc_tpu.secpols import secpoly
import mpyc_tpu.mpctools as mpctools

runtime = None


class SecureFiniteGroup(SecureObject):
    """Abstract base class for secure finite group elements.

    Subclasses set `group` (the plain fingroups class), `sectype` (the
    secure number type of the share components) and `_slots_count`
    (None for single-component shares, else the tuple width).
    """

    __slots__ = ()

    group: type
    sectype: type
    identity = None

    # -- share payload plumbing (shared by all families) -----------------

    @classmethod
    def _slots_count(cls):
        """Number of share components; None means a single bare share."""
        return None

    @classmethod
    def _as_component(cls, v):
        return v if isinstance(v, cls.sectype) else cls.sectype(v)

    def __init__(self, value=None):
        cls = type(self)
        if isinstance(value, cls.group):
            value = value.value
        width = cls._slots_count()
        if width is None:
            super().__init__(cls._as_component(value))
            return
        if value is None:
            value = (None,) * width
        elif not (isinstance(value, (tuple, list)) and len(value) == width):
            raise ValueError(f'tuple/list of length {width} required')
        super().__init__(tuple(cls._as_component(v) for v in value))

    def set_share(self, value):
        if isinstance(self.share, tuple):
            for mine, new in zip(self.share, value):
                mine.set_share(new.share)
        else:
            self.share.set_share(value.share)

    def __getitem__(self, key):
        if not isinstance(self.share, tuple):
            raise TypeError('not an indexable secure group element')
        return self.share[key]

    @classmethod
    def _components(cls, a):
        """Secure components of a's share, as a flat list."""
        if isinstance(a.share, tuple):
            return list(a.share)
        return [a.share]

    @classmethod
    def _rebuild(cls, parts):
        """Inverse of _components for freshly produced shares."""
        if cls._slots_count() is None:
            return cls(parts[0])
        return cls(tuple(parts))

    # -- coercion and trait guards ---------------------------------------

    def _lift(self, other):
        cls = type(self)
        if isinstance(other, cls.group):
            return cls(other)
        if isinstance(other, cls):
            return other
        return None

    def _trait(self, name):
        if not getattr(self.group, name):
            kind = name.split('_', 1)[1]
            raise TypeError(f'group not {kind}')

    # -- operator overloading --------------------------------------------

    def __matmul__(self, other):
        if other is self:
            return type(self).operation2(self)
        peer = self._lift(other)
        if peer is None:
            return NotImplemented
        return type(self).operation(self, peer)

    def __rmatmul__(self, other):
        if not isinstance(other, self.group):
            return NotImplemented
        return type(self).operation(type(self)(other), self)

    def __invert__(self):
        return type(self).inversion(self)

    def __xor__(self, other):
        return type(self).repeat(self, other)

    def __add__(self, other):
        self._trait('is_additive')
        return self.__matmul__(other)

    def __radd__(self, other):
        self._trait('is_additive')
        return self.__rmatmul__(other)

    def __neg__(self):
        self._trait('is_additive')
        return self.__invert__()

    def __sub__(self, other):
        self._trait('is_additive')
        return self.__matmul__(~other)

    def __rsub__(self, other):
        self._trait('is_additive')
        return (~self).__rmatmul__(other)

    def __mul__(self, other):
        if self.group.is_additive:
            return NotImplemented
        self._trait('is_multiplicative')
        return self.__matmul__(other)

    def __rmul__(self, other):
        if self.group.is_additive:
            return self.__xor__(other)
        self._trait('is_multiplicative')
        if self.group.is_abelian:
            return self.__matmul__(other)
        return type(self)(other).__matmul__(self)

    def __truediv__(self, other):
        self._trait('is_multiplicative')
        return self.__matmul__(~other)

    def __rtruediv__(self, other):
        self._trait('is_multiplicative')
        inv = ~self
        if other == 1 and isinstance(other, int):
            return inv
        return inv.__rmatmul__(other)

    def __pow__(self, other):
        self._trait('is_multiplicative')
        return self.__xor__(other)

    def __eq__(self, other):
        peer = self._lift(other)
        if peer is None:
            return NotImplemented
        return type(self).equality(self, peer)

    def __ne__(self, other):
        return 1 - self.__eq__(other)

    __hash__ = None

    # -- family-specific protocol surface --------------------------------

    @classmethod
    def operation(cls, a, b, /):
        """Return a @ b."""
        raise NotImplementedError

    @classmethod
    def operation2(cls, a, /):
        """Return a @ a (override when squaring has a faster formula)."""
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

    # -- generic runtime hooks -------------------------------------------

    @classmethod
    def _input(cls, x, senders):
        """Input hook: share all elementary components per sender."""
        width = len(x[0].share) if isinstance(x[0].share, tuple) else None
        flat = [c for a in x for c in cls._components(a)]
        per_sender = runtime.input(flat, senders)
        out = []
        for shares in per_sender:
            if width is None:
                out.append([cls(s) for s in shares])
            else:
                grouped = (tuple(shares[i:i + width])
                           for i in range(0, len(shares), width))
                out.append([cls(g) for g in grouped])
        return out

    @classmethod
    def _output(cls, x, receivers, threshold):
        """Output hook: open all components, rebuild plain group elts."""
        width = len(x[0].share) if isinstance(x[0].share, tuple) else None
        flat = [c for a in x for c in cls._components(a)]
        opened = runtime.output(flat, receivers, threshold)
        if opened[0] is None:
            return [None] * len(x)
        if issubclass(cls, SecureSymmetricGroupElement):
            opened = [int(v) for v in opened]
        if width is None:
            vals = opened
        else:
            vals = [opened[i:i + width]
                    for i in range(0, len(opened), width)]
        return [cls.group(v, check=False) for v in vals]

    @classmethod
    def if_else(cls, c, a, b):
        """Secure selection between group elements a, b by condition c."""
        if not isinstance(c, cls.sectype):
            c = runtime.convert(c, cls.sectype)
        a = a if isinstance(a, SecureObject) else cls(a)
        b = b if isinstance(b, SecureObject) else cls(b)
        if isinstance(a.share, tuple):
            picked = runtime.if_else(c, [p.share for p in a.share],
                                     [p.share for p in b.share])
            return cls(tuple(picked))
        return cls(runtime.if_else(c, a.share, b.share))

    # -- exponentiation dispatch -----------------------------------------

    @classmethod
    def repeat(cls, a, x):
        """The x-th @-power of a: any mix of public/secret base a and
        public/secret integral exponent x."""
        if isinstance(x, int) and isinstance(a, _SecureFieldUnitGroup):
            return type(a)(a.share ** x)    # fast field exponentiation
        if isinstance(x, (int, FiniteFieldElement)):
            # public exponent: the group's own binary ladder runs fine on
            # secure operations
            return type(a).group.repeat(a, x)
        if isinstance(a, SecureObject):
            return _ladder_secret_base(a, x, cls)
        assert isinstance(x, (SecureFiniteField, SecureInteger))
        return repeat_public_base_secret_output(a, x, cls)

    @classmethod
    def repeat_public(cls, a, x):
        """Public output a^x for public base(s) a and secret exponent(s) x."""
        return repeat_public_base_public_output(a, x)


def _ladder_secret_base(a, x, secgrp):
    """[a]^[x] -> [a^x]: MSB-first oblivious double-and-multiply.

    The accumulator squares every step and a conditional multiplication by
    the (secret) base folds in each exponent bit — 2 group operations plus
    one selection per bit, like the reference's LSB-first variant
    (secgroups.py:264-272) with the roles of the two chains swapped.
    """
    bits = runtime.to_bits(x)
    acc = secgrp.if_else(bits[-1], a, secgrp.identity)
    for b in reversed(bits[:-1]):
        acc = acc @ acc
        acc = secgrp.if_else(b, acc @ a, acc)
    return acc


# keep the reference-parity public name for the protocol
repeat_secret_base_secret_output = _ladder_secret_base


def _lagrange_exponents(x, pid=None):
    """Party pid's Lagrange-weighted share(s) of x as public integers
    (pid defaults to the own pid; on the co-located simulator plane any
    party's local exponent can be extracted from the stacked share)."""
    import numpy as _np

    field = type(x[0]).field
    m = len(runtime.parties)
    if pid is None:
        pid = runtime.pid
    lam = field(1) if m == 1 else \
        _recombination_vector(field, range(1, m + 1), 0)[pid]
    sim = getattr(runtime, 'is_simulator', False)
    out = []
    for xi in x:
        sh = runtime._share(xi)
        if sim:
            v = field(int(_np.asarray(sh.value).reshape(-1)[pid]))
        else:
            v = field(int(sh.value[()]))
        e = int(lam * v)    # signed representative iff field.is_signed
        if isinstance(xi, SecureFiniteField) and xi.subfield is not None:
            e %= field.characteristic
        out.append(e)
    return out


_local_exponents = _lagrange_exponents  # parity alias


def repeat_public_base_secret_output(a, x, secgrp):
    """a^[x] -> [a^x]: each party exponentiates by its Lagrange-local
    exponent and inputs the result; a log-depth reduce combines them
    (reference: secgroups.py:275-291)."""
    group = secgrp.group
    if getattr(runtime, 'is_simulator', False):
        contribs = [
            runtime.input(
                secgrp(group.repeat(a, _lagrange_exponents([x], p)[0])),
                senders=p)
            for p in range(len(runtime.parties))]
    else:
        mine = group.repeat(a, _lagrange_exponents([x])[0])
        contribs = runtime.input(secgrp(mine))
    return mpctools.reduce(secgrp.operation, contribs)


def repeat_public_base_public_output(a, x):
    """Multi-exponentiation prod a_j^x_j with public output
    (reference: secgroups.py:294-313)."""
    bases = a if isinstance(a, list) else [a]
    exps = x if isinstance(a, list) else [x]
    group = type(bases[0])

    def local(pid=None):
        es = _lagrange_exponents(exps, pid)
        return functools.reduce(group.operation,
                                map(group.repeat, bases, es))

    if getattr(runtime, 'is_simulator', False):
        parts = [local(p) for p in range(len(runtime.parties))]
    else:
        parts = runtime.transfer(local())
    return functools.reduce(group.operation, parts)


class SecureSymmetricGroupElement(SecureFiniteGroup):
    """Secure permutations: tuples of secure field elements.

    Protocols run through secret ONE-HOT MATRICES: row i of hot(p) is the
    unit vector at p[i].  Composition contracts q against the rows;
    inversion weights the rows by their position (local once the rows
    exist) — a different construction from the reference's oblivious
    list reads/writes (secgroups.py:335-370)."""

    __slots__ = ()

    @classmethod
    def _slots_count(cls):
        return cls.group.degree

    @classmethod
    def _onehot_rows(cls, p):
        n = cls.group.degree
        return [runtime.unit_vector(entry, n) for entry in p.share]

    @classmethod
    def operation(cls, p, q, /):
        """First p then q: r[i] = q[p[i]] = <hot(p)[i], q>."""
        rows = cls._onehot_rows(p)
        qs = list(q.share)
        return cls(tuple(runtime.in_prod(row, qs) for row in rows))

    @classmethod
    def inversion(cls, p, /):
        """inverse[j] = sum_i i * hot(p)[i][j] — LOCAL given the rows
        (the weights i are public)."""
        rows = cls._onehot_rows(p)
        acc = runtime.scalar_mul(len(rows) - 1, rows[-1])
        for i, row in enumerate(rows[1:-1], start=1):
            acc = runtime.vector_add(acc, runtime.scalar_mul(i, row))
        return cls(tuple(acc))

    @classmethod
    def equality(cls, p, q, /):
        return runtime.all([u == v for u, v in zip(p.share, q.share)])


class _SecureFieldUnitGroup(SecureFiniteGroup):
    """Shared machinery for groups living inside one prime field
    (quadratic residues, Schnorr groups): one secure field element."""

    __slots__ = ()

    @classmethod
    def operation(cls, a, b, /):
        return cls(a.share * b.share)

    @classmethod
    def inversion(cls, a, /):
        return cls(1 / a.share)

    @classmethod
    def equality(cls, a, b, /):
        return a.share == b.share


class SecureQuadraticResidue(_SecureFieldUnitGroup):
    """Secure quadratic residues modulo a safe prime."""

    __slots__ = ()

    @classmethod
    def decode(cls, M, Z, gap=128):
        """Decode message from given group elements."""
        return (M.share - Z.share) / gap


class SecureSchnorrGroupElement(_SecureFieldUnitGroup):
    """Secure Schnorr group elements."""

    __slots__ = ()

    @classmethod
    def decode(cls, M, Z):
        """Decode message from M = g^m by bounded secure search."""
        g = cls.group.generator
        powers = [cls.group.identity]
        while len(powers) < 16:
            powers.append(cls.group.operation(powers[-1], g))
        return runtime.find(powers, M, bits=False)


class SecureEllipticCurvePoint(SecureFiniteGroup):
    """Secure elliptic curve points: coordinate tuples of secure field
    elements, running the oblivious curve formulas from fingroups."""

    __slots__ = ()

    @classmethod
    def _slots_count(cls):
        return len(cls.group.identity.value)

    @classmethod
    def _via_group(cls, fn, *elts):
        """Run a plain-group formula on secure coordinates."""
        args = (cls.group(e.share, check=False) for e in elts)
        return cls(fn(*args))

    @classmethod
    def operation(cls, a, b, /):
        return cls._via_group(cls.group.operation, a, b)

    @classmethod
    def inversion(cls, a, /):
        return cls._via_group(cls.group.inversion, a)

    def normalize(self):
        """Convert to unique (affine) representation."""
        cls = type(self)
        if issubclass(cls.group, fg.WeierstrassProjective):
            secfld = cls.sectype
            x, y, z = self.share
            at_infinity = z == 0
            scale = 1 / (z + at_infinity)   # guard the 1/0
            xy = runtime.scalar_mul(
                scale, runtime.if_else(at_infinity,
                                       [secfld(0), secfld(1)], [x, y]))
            return cls(xy + [1 - at_infinity])
        return cls._via_group(cls.group.normalize, self)

    @classmethod
    def equality(cls, a, b, /):
        pairs = zip(a.normalize().share, b.normalize().share)
        return runtime.all(u == v for u, v in pairs)

    @classmethod
    def decode(cls, M, Z, gap=256):
        """Decode message from given group elements."""
        return (M.normalize()[0] - Z.normalize()[0]) / gap


class SecureHyperellipticCurveDivisor(SecureFiniteGroup):
    """Secure hyperelliptic divisors in Mumford form: a pair of secure
    polynomials, composed with Cantor's algorithm on secpoly arithmetic."""

    __slots__ = ()

    @classmethod
    def _slots_count(cls):
        return 2

    def __init__(self, value=None):
        cls = type(self)
        if isinstance(value, cls.group):
            value = value.value
        elif value is not None and not (isinstance(value, (tuple, list))
                                        and len(value) == 2):
            raise ValueError('tuple/list of length 2 required')
        secfld = runtime.SecFld(cls.group.field.modulus)
        genus = cls.group.genus
        if value is None:
            value = (secpoly(None, sectype=secfld, shape=(genus + 1,)),
                     secpoly(None, sectype=secfld, shape=(genus,)))
        else:
            value = tuple(v if isinstance(v, secpoly)
                          else secpoly(v, secfld) for v in value)
        SecureObject.__init__(self, value)

    def set_share(self, value):
        for mine, new in zip(self.share, value):
            mine.set_share(new.share)

    def __getitem__(self, key):
        return self.share[key]

    @classmethod
    def _reduce(cls, D):
        """Secure Cantor reduction of a semi-reduced divisor."""
        u, v = D
        poly = GFpX(cls.sectype.field.modulus)
        genus = cls.group.genus
        for _ in range(1 if genus <= 2 else 2):
            done = u >> genus + 1 == poly(0)
            keep_u, keep_v = u, v
            nxt = (cls.group.f - v ** 2) // u
            vanished = nxt == poly(0)
            nxt = secpoly.if_else(vanished, nxt + poly(1), nxt)  # no 1/0
            u, v = nxt, (-v) % nxt
            done = done + vanished - done * vanished
            u = secpoly.if_else(done, keep_u, u).truncate(genus + 3)
            v = secpoly.if_else(done, keep_v, v).truncate(genus + 2)
        return u.truncate(genus + 1).monic(), v.truncate(genus)

    @classmethod
    def operation(cls, D1, D2, /):
        """Cantor composition (general case) on secure polynomials."""
        u1, v1 = D1
        u2, v2 = D2
        g1, _, s2 = secpoly.gcdext(u1, u2)
        d, t, s3 = secpoly.gcdext(g1, v1 + v2)
        u = u1 * u2 // d ** 2
        cross = (t * s2) * u2 * (v1 - v2) + s3 * (cls.group.f - v2 ** 2)
        v = (v2 + cross // d) % u
        return cls(cls._reduce((u, v)))

    @classmethod
    def operation2(cls, D, /):
        u, v = D
        d, _, s3 = secpoly.gcdext(u, v + v)
        u = (u // d) ** 2
        v = (v + s3 * ((cls.group.f - v ** 2) // d)) % u
        return cls(cls._reduce((u, v)))

    @classmethod
    def inversion(cls, D, /):
        u, v = D
        return cls((u, -v))

    @classmethod
    def equality(cls, D1, D2, /):
        same = [D1.share[k] == D2.share[k] for k in (0, 1)]
        return same[0] * same[1]

    @classmethod
    def decode(cls, M, Z):
        """Decode message from given group elements."""
        return (M.share[0][0] - Z.share[0][0]) / cls.group.gap


class SecureHCDivisorCL(SecureFiniteGroup):
    """Secure genus-2 divisors in Costello--Lauter extended coordinates:
    6-tuples of secure field elements driven through the straight-line
    generic-case formulas (fingroups.HCDivisorCL._cl_add/_cl_dbl)."""

    __slots__ = ()

    @classmethod
    def _slots_count(cls):
        return 6

    @classmethod
    def operation(cls, D1, D2, /):
        return cls(cls.group._cl_add(tuple(D1.share), tuple(D2.share)))

    @classmethod
    def operation2(cls, D, /):
        f = cls.group.f
        return cls(cls.group._cl_dbl(tuple(D.share), f[2], f[3]))

    @classmethod
    def inversion(cls, D, /):
        u1, u0, v1, v0, w1, w0 = D.share
        return cls((u1, u0, -v1, -v0, w1, w0))

    @classmethod
    def equality(cls, D1, D2, /):
        pairs = zip(D1.share[:4], D2.share[:4])
        return runtime.all(a == b for a, b in pairs)

    @classmethod
    def decode(cls, M, Z):
        """Decode message from given group elements."""
        return (M[0] - Z[0]) / (2 * cls.group.gap)


class SecureClassGroupForm(SecureFiniteGroup):
    """Secure class group forms (a, b, c) over secure integers, with a
    division-free reduction loop (Agarwal--Frandsen, LATIN 2006)."""

    __slots__ = ()

    @classmethod
    def _slots_count(cls):
        return 3

    @classmethod
    def _reduce(cls, f):
        """Secure reduction of form f, avoiding secure division in the
        main loop (Algorithm 3, Agarwal--Frandsen LATIN 2006)."""

        def shear(m, form):
            a, b, c = form
            return [a, 2 * m * a + b, m * (m * a + b) + c]

        a, b, c = f
        secint = cls.sectype
        len_b = secint.bit_length
        for _ in range((cls.group.discriminant.bit_length() + 1) // 2):
            sgn_b = 1 - 2 * runtime.sgn(b, l=len_b, LT=True)
            len_b -= 1
            sizeb = runtime._bit_length(sgn_b * b)
            sizea = runtime._bit_length(a)
            pow2 = sizeb[1] / sizea[1] / 2  # 2**(len(b) - len(a) - 1)
            m = -sgn_b * pow2
            a, b, c = runtime.if_else(sgn_b * b > 2 * a,
                                      shear(m, (a, b, c)), [a, b, c])
            a, b, c = runtime.if_else(a > c, [c, -b, a], [a, b, c])

        m, _ = runtime._divmod(a - b, 2 * a)
        a, b, c = shear(m, (a, b, c))
        a, b, c = runtime.if_else(a > c, [c, -b, a], [a, b, c])
        b = runtime.if_else((b < 0) * (a == c), -b, b)
        b = runtime.if_else(b == -a, -b, b)
        return a, b, c

    @classmethod
    def operation(cls, f1, f2, /):
        """Shanks composition (Cohen, Algorithm 5.4.7) on secure forms."""
        a1, b1, _ = f1
        a2, b2, c2 = f2
        s = (b1 + b2) / 2
        l = type(a1).bit_length // 2
        g1, _, y1 = runtime.gcdext(a1, a2, l=l)
        d, x2, y2 = runtime.gcdext(s, g1, l=l)
        v1, v2 = a1 / d, a2 / d
        r = runtime._divmod(
            runtime._divmod(y1 * y2, v1)[1] * (s - b2) - x2 * c2, v1)[1]
        a3 = v1 * v2
        b3 = b2 + 2 * v2 * r
        c3 = (b3 ** 2 - cls.group.discriminant) / (4 * a3)
        return cls(cls._reduce((a3, b3, c3)))

    @classmethod
    def operation2(cls, f, /):
        a, b, c = f  # a>0, b!=0, gcd(a,b)=1 since -discriminant is prime
        x2 = runtime.inverse(b, a, l=type(a).bit_length // 2)
        _, r = runtime._divmod(x2 * c, a)
        a2 = a ** 2
        b2 = b - 2 * a * r
        c2 = (b2 ** 2 - cls.group.discriminant) / (4 * a2)
        return cls(cls._reduce((a2, b2, c2)))

    @classmethod
    def inversion(cls, f, /):
        a, b, c = f
        b = runtime.if_else((b != a) * (a != c), -b, b)
        return cls((a, b, c))

    @classmethod
    def equality(cls, f1, f2, /):
        same = [f1.share[k] == f2.share[k] for k in (0, 1)]
        return same[0] * same[1]

    @classmethod
    def decode(cls, M, Z):
        """Decode message from given group elements."""
        return (M.share[0] - Z.share[0]) / cls.group.gap


# family dispatch table: (fingroups base, secure base, sectype builder)
def _family_table():
    return [
        (fg.SymmetricGroupElement, SecureSymmetricGroupElement,
         lambda g: runtime.SecFld(min_order=g.degree)),
        (fg.QuadraticResidue, SecureQuadraticResidue,
         lambda g: runtime.SecFld(2 * g.order + 1)),
        (fg.SchnorrGroupElement, SecureSchnorrGroupElement,
         lambda g: runtime.SecFld(g.field.order)),
        (fg.EllipticCurvePoint, SecureEllipticCurvePoint,
         lambda g: runtime.SecFld(g.field.order)),
        (fg.HCDivisorCL, SecureHCDivisorCL,
         lambda g: runtime.SecFld(g.field.order)),
        (fg.HyperellipticCurveDivisor, SecureHyperellipticCurveDivisor,
         lambda g: runtime.SecFld(g.field.order)),
        (fg.ClassGroupForm, SecureClassGroupForm,
         lambda g: runtime.SecInt(g.bit_length + 3)),
    ]


@functools.cache
def SecGrp(group):
    """Secure version of the given finite group type."""
    for plain_base, secure_base, mk_sectype in _family_table():
        if issubclass(group, plain_base):
            break
    else:
        raise NotImplementedError(f'no secure version of {group.__name__}')
    if issubclass(group, fg.EllipticCurvePoint):
        assert group.oblivious, 'oblivious coordinates required'
    name = f'SecGrp({group.__name__})'
    secgrp = type(name, (secure_base,), {'__slots__': ()})
    secgrp.__doc__ = 'Class of secret-shared finite group elements.'
    secgrp.group = group
    secgrp.sectype = mk_sectype(group)
    secgrp.identity = secgrp(group.identity)
    globals()[name] = secgrp
    return secgrp


def _mint_constructor(plain_factory):
    """Mint SecXxx(...) = SecGrp(Xxx(...)) convenience constructors."""
    name = f'Sec{plain_factory.__name__}'

    def construct(*args, **kwargs):
        return SecGrp(plain_factory(*args, **kwargs))

    construct.__name__ = name
    construct.__doc__ = (f'Secure version of {plain_factory.__name__} from '
                         f'mpyc_tpu.fingroups:\n\n{plain_factory.__doc__}')
    construct.__signature__ = inspect.signature(plain_factory)
    globals()[name] = construct


SecSymmetricGroup: type
SecQuadraticResidues: type
SecSchnorrGroup: type
SecEllipticCurve: type
SecHyperellipticCurve: type
SecClassGroup: type
for _factory in (fg.SymmetricGroup, fg.QuadraticResidues, fg.SchnorrGroup,
                 fg.EllipticCurve, fg.HyperellipticCurve, fg.ClassGroup):
    _mint_constructor(_factory)
