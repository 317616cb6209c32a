"""Secure (secret-shared) types: numbers and arrays with operator overloading.

Capability parity target: /root/reference/mpyc/sectypes.py. Every dunder
forwards into the runtime's protocol ops (reference pattern,
sectypes.py:95-349); the type factories SecFld/SecInt/SecFxp mint cached
classes per parameter set (sectypes.py:568-737).

TPU-first delta: every secure value's share is a *device field array*
(mpyc_tpu.finfields array classes); scalar secure numbers are shape-()
arrays, so one kernel library serves both scalars and arrays and the
runtime's protocol code is shape-agnostic (cf. SURVEY.md §7 design delta 4).
"""

from __future__ import annotations

import functools
import math

import numpy as np

from mpyc_tpu import gmpy as gmpy2
from mpyc_tpu import gfpx
from mpyc_tpu import finfields
from mpyc_tpu import fingroups

runtime = None  # set by mpyc_tpu.runtime at setup


class LazyShare:
    """Placeholder for a share whose exchange receive is still pending.

    Created by protocol ops inside ``with mpc.pipeline():`` — the round's
    sends are issued eagerly, and the receive + recombine (the thunk) runs
    on first use of the share.  This is the eager-rounds counterpart of the
    reference's asyncio dataflow latency hiding (reference
    asyncoro.py:416-464): independent ops issue their messages
    back-to-back without waiting for each other's replies; the pc-tagged
    transport buffers make out-of-order completion safe.
    """

    __slots__ = ('_thunk', '_index', '_value', 'shape')

    def __init__(self, thunk, index, shape):
        self._thunk = thunk
        self._index = index
        self._value = None
        self.shape = shape

    def force(self):
        if self._value is None:
            self._value = self._thunk()[self._index]
            self._thunk = None
        return self._value

    # transparent proxy: any field-array use of a pending share forces it,
    # so protocol code that keeps computing on a reshare result is oblivious
    # to pipeline mode (only shares stored in secure objects stay lazy)

    def __getattr__(self, name):
        return getattr(self.force(), name)

    def __getitem__(self, idx):
        return self.force()[idx]

    def __mul__(self, other):
        return self.force() * other

    def __rmul__(self, other):
        return other * self.force()

    def __add__(self, other):
        return self.force() + other

    def __radd__(self, other):
        return other + self.force()

    def __sub__(self, other):
        return self.force() - other

    def __rsub__(self, other):
        return other - self.force()

    def __matmul__(self, other):
        return self.force() @ other

    def __rmatmul__(self, other):
        return other @ self.force()

    def __rshift__(self, n):
        return self.force() >> n

    def __lshift__(self, n):
        return self.force() << n

    def __neg__(self):
        return -self.force()


class SecureObject:
    """Base class for secret-shared objects.

    The share attribute holds a finite field array (device data). For
    scalar secure numbers the share has shape ().  In pipeline mode the
    share may transiently be a LazyShare; reading .share forces it.
    """

    __slots__ = ('_sh',)

    field: type = None
    bit_length: int = None
    frac_length: int = 0

    def __init__(self, value=None):
        self._sh = value

    @property
    def share(self):
        sh = self._sh
        if type(sh) is LazyShare:
            sh = sh.force()
            self._sh = sh
        return sh

    @share.setter
    def share(self, value):
        self._sh = value

    def set_share(self, value):
        self._sh = value

    def __bool__(self):
        raise TypeError('cannot use secure type in Boolean expressions')


class SecureNumber(SecureObject):
    """Base class for secure scalar numbers."""

    __slots__ = ()

    def _coerce(self, other):
        """Coerce other to the same secure type (or NotImplemented)."""
        if isinstance(other, SecureObject):
            if not isinstance(other, type(self)):
                return NotImplemented
            return other
        if isinstance(other, (int, float)) or isinstance(other, self.field):
            return type(self)(other)
        return NotImplemented

    def _coerce2(self, other):
        """Like _coerce but leaves public Python numbers unwrapped."""
        if isinstance(other, SecureObject):
            if not isinstance(other, type(self)):
                return NotImplemented
        return other

    # arithmetic

    def __neg__(self):
        return runtime.neg(self)

    def __pos__(self):
        return runtime.pos(self)

    def __abs__(self):
        return runtime.abs(self)

    def __add__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.add(self, other)

    __radd__ = __add__

    def __sub__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.sub(self, other)

    def __rsub__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.sub(other, self)

    def __mul__(self, other):
        if isinstance(other, fingroups.FiniteGroupElement) and \
                type(other).is_additive:
            # n*a for additive group element a: secure repeat
            from mpyc_tpu import secgroups
            return secgroups.SecGrp(type(other)).repeat(other, self)

        other = self._coerce2(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.mul(self, other)

    __rmul__ = __mul__

    def __truediv__(self, other):
        other = self._coerce2(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.div(self, other)

    def __rtruediv__(self, other):
        other = self._coerce2(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.div(other, self)

    def __mod__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.mod(self, other)

    def __rmod__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.mod(other, self)

    def __floordiv__(self, other):
        q, _ = self.__divmod__(other)
        return q

    def __rfloordiv__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        q, _ = other.__divmod__(self)
        return q

    def __divmod__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        r = runtime.mod(self, other)
        # exact field inverse of the raw divisor: (self-r) is an exact
        # multiple of other, so the quotient is exact (no fxp division
        # error); reference sectypes.py:233-240.
        q = runtime.mul(self - r, runtime.reciprocal(other))
        return q, r

    def __rdivmod__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return other.__divmod__(self)

    def __pow__(self, other):
        if not isinstance(other, int):
            return NotImplemented
        return runtime.pow(self, other)

    def __rpow__(self, other):
        if isinstance(other, fingroups.FiniteGroupElement) and \
                type(other).is_multiplicative:
            # a**x for multiplicative group element a: secure repeat
            from mpyc_tpu import secgroups
            return secgroups.SecGrp(type(other)).repeat(other, self)

        return NotImplemented

    # shifts

    def __lshift__(self, other):
        if not isinstance(other, int):
            return NotImplemented
        return runtime.mul(self, 1 << other)

    def __rshift__(self, other):
        # exact floor division by 2**other (reference sectypes.py:279-285;
        # probabilistic rounding is only via explicit mpc.trunc)
        if not isinstance(other, int):
            return NotImplemented
        return self.__floordiv__(1 << other)

    # bitwise: 1-bit semantics for secint/secfxp (reference
    # sectypes.py:291-319); char-2 secure fields override these with
    # coefficientwise variants

    def __and__(self, other):
        return self * other

    __rand__ = __and__

    def __xor__(self, other):
        return self + other - 2 * self * other

    def __rxor__(self, other):
        if isinstance(other, fingroups.FiniteGroupElement):
            # a^x for group element a and secret exponent x: secure repeat
            from mpyc_tpu import secgroups
            return secgroups.SecGrp(type(other)).repeat(other, self)

        return self + other - 2 * self * other

    def __or__(self, other):
        return self + other - self * other

    __ror__ = __or__

    def __invert__(self):
        return 1 - self

    # comparisons

    def __lt__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.lt(self, other)

    def __le__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return 1 - runtime.lt(other, self)

    def __gt__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.lt(other, self)

    def __ge__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return 1 - runtime.lt(self, other)

    def __eq__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.eq(self, other)

    def __ne__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return 1 - runtime.eq(self, other)

    __hash__ = None

    def if_else(self, x, y):
        """Secure selection: x if self else y (self assumed 0/1)."""
        return runtime.if_else(self, x, y)

    def if_swap(self, x, y):
        """Secure swap: (y, x) if self else (x, y) (self assumed 0/1)."""
        return runtime.if_swap(self, x, y)


class SecureFiniteField(SecureNumber):
    """Secure finite field element (no order; comparisons unsupported)."""

    __slots__ = ()

    subfield = None

    @classmethod
    def _output_conversion(cls, a):
        """Opened shape-() field array -> field element."""
        v = a.value[()]
        return cls.field(int(v) if isinstance(v, int) else v)

    def __init__(self, value=None):
        if value is not None:
            if isinstance(value, int):
                if self.subfield is not None:
                    value = self.subfield(value)
                    value = self.field(value.value)  # embed into ext field
                else:
                    value = self.field(value)
            if isinstance(value, gfpx.Polynomial):
                value = self.field(value)
            if isinstance(value, finfields.FiniteFieldElement):
                if self.subfield is not None and isinstance(value, self.subfield):
                    value = self.field(value.value)
                elif not isinstance(value, self.field):
                    # foreign field element (reference sectypes.py:119-122)
                    raise TypeError(
                        f'cannot convert {type(value)} to {type(self)}')
                value = self.field.array(np.array(value.value, dtype=object))
            elif not isinstance(value, (finfields.FiniteFieldArray, LazyShare)):
                raise TypeError(f'cannot convert {type(value)} to {type(self)}')
        super().__init__(value)

    def __abs__(self):
        raise TypeError("bad operand type for abs()")

    def __mod__(self, other):
        raise TypeError("bad operand type for %")

    __rmod__ = __mod__
    __floordiv__ = __mod__
    __rfloordiv__ = __mod__
    __divmod__ = __mod__
    __rdivmod__ = __mod__

    def __lshift__(self, other):
        raise TypeError("bad operand type for <<")

    __rlshift__ = __lshift__
    __rshift__ = __lshift__
    __rrshift__ = __lshift__

    def __and__(self, other):
        # char 2: coefficientwise; otherwise 1-bit semantics
        # (reference sectypes.py:433-438)
        if self.field.characteristic == 2:
            return runtime.and_(self, other)
        return super().__and__(other)

    __rand__ = __and__

    def __xor__(self, other):
        if self.field.characteristic == 2:
            return runtime.xor(self, other)
        return super().__xor__(other)

    def __rxor__(self, other):
        if isinstance(other, fingroups.FiniteGroupElement):
            from mpyc_tpu import secgroups
            return secgroups.SecGrp(type(other)).repeat(other, self)

        return self.__xor__(other)

    def __or__(self, other):
        if self.field.characteristic == 2:
            return runtime.or_(self, other)
        return super().__or__(other)

    __ror__ = __or__

    def __invert__(self):
        if self.field.characteristic == 2:
            return runtime.invert(self)
        return super().__invert__()

    def __lt__(self, other):
        raise TypeError("field elements are unordered")

    __le__ = __lt__
    __gt__ = __lt__
    __ge__ = __lt__

    def __eq__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.eq(self, other)

    def __ne__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return 1 - runtime.eq(self, other)

    __hash__ = None

    def _coerce(self, other):
        if isinstance(other, SecureObject):
            if not isinstance(other, type(self)):
                return NotImplemented
            return other
        if isinstance(other, (int, self.field)) or \
                isinstance(other, gfpx.Polynomial):
            return type(self)(other)
        if self.subfield is not None and isinstance(other, self.subfield):
            return type(self)(other)
        return NotImplemented

    _coerce2 = _coerce


class SecureInteger(SecureNumber):
    """Secure (signed) l-bit integer."""

    __slots__ = ()

    def __init__(self, value=None):
        if value is not None:
            if isinstance(value, int):
                value = self.field.array(np.array(value, dtype=object))
            elif isinstance(value, self.field):
                value = self.field.array(np.array(value.value, dtype=object))
            elif not isinstance(value, (finfields.FiniteFieldArray, LazyShare)):
                raise TypeError(f'cannot convert {type(value)} to {type(self)}')
        super().__init__(value)

    @classmethod
    def _output_conversion(cls, a):
        # explicit signed representative: the GF class is shared and its
        # is_signed flag is flipped by SecFld factories (reference has
        # the same mutable-flag pattern, sectypes.py:626)
        return cls.field(int(a.value[()])).signed_()


class SecureFixedPoint(SecureNumber):
    """Secure fixed-point number with l-bit total, f-bit fraction."""

    __slots__ = ('integral',)

    def __init__(self, value=None, integral=None):
        f = self.frac_length
        if value is not None:
            if isinstance(value, int):
                self.integral = True if integral is None else integral
                value = self.field.array(np.array(value << f, dtype=object))
            elif isinstance(value, float):
                self.integral = value.is_integer() if integral is None else integral
                value = self.field.array(
                    np.array(round(value * (1 << f)), dtype=object))
            elif isinstance(value, self.field):
                self.integral = integral
                value = self.field.array(np.array(value.value, dtype=object))
            else:
                self.integral = integral
                if not isinstance(value, (finfields.FiniteFieldArray, LazyShare)):
                    raise TypeError(f'cannot convert {type(value)} to {type(self)}')
        else:
            self.integral = integral
        super().__init__(value)

    @classmethod
    def _output_conversion(cls, a):
        f = cls.frac_length
        v = cls.field(int(a.value[()])).signed_()
        return v / (1 << f)


class SecureFloat(SecureNumber):
    """Secure floating-point number: (secfxp significand, secint exponent).

    Reference semantics (sectypes.py:740-958): a nonzero significand is
    normalized with 0.5 <= |s| <= 1; arithmetic renormalizes via secure bit
    operations. Supports +,-,*,/ and comparisons, input/output and sorting;
    aggregates like sum/in_prod are not supported (as in the reference).
    """

    __slots__ = ()

    significand_type: type
    exponent_type: type

    def __init__(self, value=None):
        if value is None:
            value = (self.significand_type(None), self.exponent_type(None))
        elif isinstance(value, (int, float)):
            e = math.ceil(math.log(abs(value), 2)) if value else 0
            s = value / 2 ** e
            assert s == 0 or 0.5 <= abs(s) <= 1, (value, s, e)
            value = (self.significand_type(s, integral=False),
                     self.exponent_type(e))
        elif isinstance(value, tuple):
            if len(value) != 2 or \
                    not isinstance(value[0], self.significand_type) or \
                    not isinstance(value[1], self.exponent_type):
                raise TypeError('significand/exponent pair required')
        else:
            raise TypeError('None, int, float, or significand/exponent '
                            'pair required')
        super().__init__(value)

    def set_share(self, value):
        self.share[0].set_share(value[0].share)
        self.share[1].set_share(value[1].share)

    def __neg__(self):
        s, e = self.share
        return type(self)((-s, e))

    def __pos__(self):
        return self

    def __abs__(self):
        s, e = self.share
        return type(self)((abs(s), e))

    def __add__(self, other):
        secflt = type(self)
        if isinstance(other, (int, float)):
            other = secflt(other)
        s1, e1 = self.share
        s2, e2 = other.share
        secfxp = type(s1)
        secint = type(e1)
        f = secfxp.frac_length

        c_e = e1 < e2
        c_s = runtime.convert(c_e, secfxp)
        e1, e2 = runtime.if_swap(c_e, e1, e2)
        s1, s2 = runtime.if_swap(c_s, s1, s2)
        # now e1 >= e2: align s2 by d = min(e1-e2, f) fractional shifts,
        # computing 2^-d from the bits of d (the significand type has only
        # ~2 integer bits of headroom, so comparisons over [0, f] as in the
        # reference's unit-vector approach would overflow)
        d = runtime.min(runtime.sub(e1, e2), secint(f))
        nb = f.bit_length()
        d_bits = runtime.to_bits(d, nb)
        d_bits_fxp = runtime.convert(d_bits, secfxp)
        d2 = None
        for j in range(nb):
            factor = runtime.if_else(d_bits_fxp[j],
                                     secfxp(2.0 ** -(1 << j), integral=False),
                                     secfxp(1))
            d2 = factor if d2 is None else runtime.mul(d2, factor)
        s = s1 + runtime.mul(s2, d2)
        # renormalize: s = b * 2^k with |b| in [1/2, 1) — the unsigned
        # factor keeps s's sign (reference sectypes.py:84-92)
        v, k = runtime._norm2(s, signed=False)
        b = runtime.mul(s, v)
        k_int = runtime.convert(k, secint)
        return secflt((b, runtime.add(e1, k_int)))

    __radd__ = __add__

    def __sub__(self, other):
        return self + (-other)

    def __rsub__(self, other):
        return (-self) + other

    def __mul__(self, other):
        secflt = type(self)
        if isinstance(other, (int, float)):
            other = secflt(other)
        s1, e1 = self.share
        s2, e2 = other.share
        s = runtime.mul(s1, s2)       # 1/4 <= |s| <= 1
        e = runtime.add(e1, e2)
        x = runtime.to_bits(s)
        # |s| in [1/2, 1] iff the two bits below the sign agree (see
        # reference sectypes.py:856-866)
        c_s = runtime.mul(x[-2] - x[-3], x[-2] - x[-3])
        c_e = runtime.convert(c_s, type(e1))
        s = runtime.if_else(c_s, s, runtime.mul(s, 2))
        e = runtime.if_else(c_e, e, runtime.sub(e, 1))
        return secflt((s, e))

    __rmul__ = __mul__

    def __truediv__(self, other):
        if isinstance(other, (int, float)):
            return self * (1 / other)
        return self * other.reciprocal()

    def __rtruediv__(self, other):
        return other * self.reciprocal()

    def reciprocal(self):
        s, e = self.share
        s = runtime.mul(runtime._rec(s), 0.5)  # 1/2 <= |1/(2s)| <= 1
        return type(self)((s, runtime.sub(1, e)))

    def _cmp(self, other, op):
        if isinstance(other, (int, float)):
            other = type(self)(other)
        s = (self - other).share[0]
        return type(self)((op(s), self.exponent_type(0)))

    def __lt__(self, other):
        return self._cmp(other, lambda s: runtime.sgn(s, LT=True))

    def __le__(self, other):
        return self._cmp(other, lambda s: 1 - runtime.sgn(runtime.neg(s),
                                                          LT=True))

    def __gt__(self, other):
        return self._cmp(other, lambda s: runtime.sgn(runtime.neg(s),
                                                      LT=True))

    def __ge__(self, other):
        return self._cmp(other, lambda s: 1 - runtime.sgn(s, LT=True))

    def __eq__(self, other):
        return self._cmp(other, lambda s: runtime.is_zero(s))

    def __ne__(self, other):
        return self._cmp(other, lambda s: 1 - runtime.is_zero(s))

    __hash__ = None

    @staticmethod
    def is_zero_public(a):
        """Called by runtime.is_zero_public()."""
        return runtime.is_zero_public(a.share[0])

    @classmethod
    def _input(cls, x, senders):
        """Called by runtime.input()."""
        x_s = [a.share[0] for a in x]
        x_e = [a.share[1] for a in x]
        shares_s = runtime.input(x_s, senders)
        shares_e = runtime.input(x_e, senders)
        return [[cls(a) for a in zip(r_s, r_e)]
                for r_s, r_e in zip(shares_s, shares_e)]

    @classmethod
    def _output(cls, x, receivers, threshold):
        """Called by runtime.output(): open as Python floats."""
        x_s = runtime.output([a.share[0] for a in x], receivers, threshold)
        # zero exponent where significand is zero (avoids leaking e for 0)
        e_0 = cls.exponent_type(0)
        x_e = [a.share[1] if x_s[i] else e_0 for i, a in enumerate(x)]
        x_e = runtime.output(x_e, receivers, threshold)
        if x_s[0] is None:
            return x_e
        return [s * 2 ** e for s, e in zip(x_s, x_e)]


def SecFlt(l=None, s=None, e=None):
    """Secure l-bit float: s-bit significand + e-bit exponent (l = s+e)."""
    if l is None:
        if s is None or e is None:
            l = runtime.options.bit_length
        else:
            l = s + e
    if s is None:
        if e is None:
            s = round(6.2 + 0.99 * l - 4.1 * math.log(l))  # IEEE-like
        else:
            s = l - e
    if e is None:
        e = l - s
    if l != s + e:
        raise ValueError(f'inconsistent bit lengths: l={l} != s+e={s + e}')
    return _SecFlt(s, e)


@functools.cache
def _SecFlt(s, e):
    name = f'SecFlt{s + e}:{s}:{e}'
    secflt = type(name, (SecureFloat,), {'__slots__': ()})
    secflt.__doc__ = 'Class of secret-shared floating-point numbers.'
    secflt.bit_length = s + e
    secflt.significand_type = SecFxp(s + 1, s - 1)
    secflt.exponent_type = SecInt(e)
    globals()[name] = secflt  # make dynamic class picklable (reference sectypes.py:996)
    return secflt


def SecFld(order=None, modulus=None, char=None, ext_deg=None, min_order=None,
           signed=False):
    """Secure finite field of order q = p**d (reference: sectypes.py:568)."""
    if order is not None:
        p, d = gmpy2.factor_prime_power(order)
        char = char or p
        assert char == p
        ext_deg = ext_deg or d
        assert ext_deg == d

    if isinstance(modulus, str):
        char = char or 2
        modulus = gfpx.GFpX(char)(modulus)
    if isinstance(modulus, int) and char and modulus > char:
        modulus = gfpx.GFpX(char)(modulus)
    if isinstance(modulus, gfpx.Polynomial):
        char = char or modulus.p
        assert char == modulus.p
        ext_deg = ext_deg or modulus.degree()
    elif isinstance(modulus, int):
        char = char or modulus
        assert char == modulus
        ext_deg = ext_deg or 1
        assert ext_deg == 1
    else:
        assert modulus is None
        if min_order is None:
            char = char or 2
            ext_deg = ext_deg or 1
            min_order = char ** ext_deg
        else:
            if char is None:
                ext_deg = ext_deg or 1
                root, exact = gmpy2.iroot(min_order, ext_deg)
                min_char = root + (not exact)
                char = int(gmpy2.next_prime(min_char - 1))
            elif ext_deg is None:
                ext_deg = math.ceil(math.log(min_order, char))

        if ext_deg == 1:
            modulus = char
        else:
            modulus = finfields.find_irreducible(char, ext_deg)

    field = finfields.GF(modulus)
    field.is_signed = signed
    # cache key includes the runtime's (m, t): whether the field needs a
    # Shamir extension depends on the party count, and one process can
    # host several runtimes (tests switch m=1 / sim m=3 fixtures)
    if runtime is None:
        m, t = 1, 0
    else:
        m, t = len(runtime.parties), runtime.threshold
    return _SecFld(field, m, t)


@functools.cache
def _SecFld(field, m, t):
    l = (field.order - 1).bit_length()
    name = f'SecFld{l}({field.__name__})'
    secfld = type(name, (SecureFiniteField,), {'__slots__': ()})
    secfld.__doc__ = 'Class of secret-shared finite field elements.'
    q = field.order
    if t == 0 or m < q:
        secfld.subfield = None
        secfld.field = field
    else:
        # extend the field so Shamir interpolation points exist for m parties,
        # computing in the subfield (reference: sectypes.py:630-652)
        secfld.subfield = field
        assert field.ext_deg == 1
        e = max(2, math.ceil(math.log(m + 1, q)))
        modulus = finfields.find_irreducible(field.characteristic, e)
        secfld.field = finfields.GF(modulus)

        @classmethod
        def out_conv(cls, a):
            return cls.subfield.array(
                np.vectorize(int, otypes=[object])(a.value))
        secfld._output_conversion = out_conv
    secfld.bit_length = l

    arr_name = f'Array{name}'
    secarr = type(arr_name, (SecureFiniteFieldArray,), {'__slots__': ()})
    secarr.sectype = secfld
    secarr.field = secfld.field
    secarr.subfield = secfld.subfield
    if secfld.subfield is not None:
        secarr._output_conversion = secfld._output_conversion
    secfld.array = secarr
    # make dynamic classes picklable (reference sectypes.py:656,668)
    globals()[name] = secfld
    globals()[arr_name] = secarr
    return secfld


def _pfield(l, f, p, n, k=None):
    if k is None:
        k = runtime.options.sec_param
    if p is None:
        p = finfields.find_prime_root(l + f + k + 2, n=n)
    elif p.bit_length() <= l + f + k + 1:
        raise ValueError(f'prime {p} too small')
    field = finfields.GF(p)
    assert runtime.threshold == 0 or len(runtime.parties) < field.order
    return field


def SecInt(l=None, p=None, n=2):
    """Secure l-bit integers."""
    if l is None:
        l = runtime.options.bit_length
    # the field width depends on the runtime's security parameter: it
    # must be part of the cache key, or a class minted under one k is
    # silently reused under another (an l+k+2-bit protocol then
    # overflows the smaller cached field)
    return _SecInt(l, p, n, runtime.options.sec_param)


@functools.cache
def _SecInt(l, p, n, k):
    name = f'SecInt{l}' if p is None else f'SecInt{l}({p})'
    secint = type(name, (SecureInteger,), {'__slots__': ()})
    secint.__doc__ = 'Class of secret-shared integers.'
    secint.field = _pfield(l, 0, p, n, k)
    secint.bit_length = l

    secarr = type(f'Array{name}', (SecureIntegerArray,), {'__slots__': ()})
    secarr.sectype = secint
    secarr.field = secint.field
    secarr.bit_length = l
    secint.array = secarr
    # make dynamic classes picklable (reference sectypes.py:699,704)
    globals()[name] = secint
    globals()[f'Array{name}'] = secarr
    return secint


def SecFxp(l=None, f=None, p=None, n=2):
    """Secure l-bit fixed-point numbers, f-bit fractional part."""
    if l is None:
        l = runtime.options.bit_length
    if f is None:
        f = l // 2
    return _SecFxp(l, f, p, n, runtime.options.sec_param)


@functools.cache
def _SecFxp(l, f, p, n, k):
    name = f'SecFxp{l}:{f}' if p is None else f'SecFxp{l}:{f}({p})'
    secfxp = type(name, (SecureFixedPoint,), {'__slots__': ()})
    secfxp.__doc__ = 'Class of secret-shared fixed-point numbers.'
    secfxp.field = _pfield(l, f, p, n, k)
    secfxp.bit_length = l
    secfxp.frac_length = f

    secarr = type(f'Array{name}', (SecureFixedPointArray,), {'__slots__': ()})
    secarr.sectype = secfxp
    secarr.field = secfxp.field
    secarr.bit_length = l
    secarr.frac_length = f
    secfxp.array = secarr
    # make dynamic classes picklable (reference sectypes.py:729,735)
    globals()[name] = secfxp
    globals()[f'Array{name}'] = secarr
    return secfxp


# ===========================================================================
# secure arrays
# ===========================================================================

class SecureArray(SecureObject):
    """Base class for secure arrays; share is a shaped field array."""

    __slots__ = ('shape',)

    sectype: type = None
    _output_conversion = None

    def __init__(self, value=None, shape=None):
        if value is not None and not isinstance(value, (finfields.FiniteFieldArray, LazyShare)):
            value = self._encode_public(value)
        elif isinstance(value, finfields.FiniteFieldArray) and \
                value.field is not self.sectype.field:
            # foreign field array (reference sectypes.py:1361-1365)
            raise TypeError(
                f'cannot convert {type(value)} to {type(self)}')
        if value is not None:
            shape = value.shape
        self.shape = shape
        super().__init__(value)

    @classmethod
    def _encode_public(cls, value):
        """Encode a public numpy/list of numbers into a field array share."""
        f = cls.frac_length
        if isinstance(value, np.ndarray) and value.dtype != object:
            # numeric fast path: vectorized scaling, no per-element Python
            if issubclass(value.dtype.type, (np.integer, np.bool_)):
                arr = value.astype(object)          # boxes to Python ints
                if f:
                    arr = arr << f
                return cls.sectype.field.array(arr)
            if f and issubclass(value.dtype.type, np.floating):
                scaled = np.round(value * (1 << f))
                return cls.sectype.field.array(scaled.astype(np.int64)
                                               .astype(object))
        arr = np.asarray(value, dtype=object)
        if arr.size == 0:
            return cls.sectype.field.array(arr)
        first = arr.reshape(-1)[0]
        if isinstance(first, np.integer):
            # numpy scalars inside object arrays keep their fixed width,
            # so << frac_length would wrap (np.int8(2) << 16 == 0);
            # unbox to exact Python ints first
            arr = np.vectorize(int, otypes=[object])(arr)
            first = arr.reshape(-1)[0]
        if isinstance(first, int):
            # plain-int object array: shift vectorized, let the field's
            # encode take its kernel fast path (mixed arrays fall through)
            try:
                return cls.sectype.field.array(arr << f if f else arr)
            except (TypeError, AttributeError, OverflowError):
                pass

        def enc(v):
            if isinstance(v, SecureObject):
                raise TypeError('cannot mix secure scalars into public array')
            if isinstance(v, finfields.FiniteFieldElement):
                return v.value
            if f and isinstance(v, float):
                return round(v * (1 << f))
            if f:
                return int(v) << f
            return int(v) if isinstance(v, (int, np.integer)) else v
        return cls.sectype.field.array(np.vectorize(enc, otypes=[object])(arr))

    @property
    def size(self):
        return int(np.prod(self.shape, dtype=np.int64)) if self.shape else 1

    @property
    def ndim(self):
        return len(self.shape)

    def __bool__(self):
        """True iff the secure array is nonempty (reference
        sectypes.py:1024-1026); never reveals anything secret."""
        return bool(self.size)

    def __len__(self):
        if not self.shape:
            raise TypeError('len() of unsized secure array')
        return self.shape[0]

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    def _coerce(self, other):
        if isinstance(other, SecureArray):
            if other.sectype != self.sectype:
                return NotImplemented
            return other
        if isinstance(other, SecureNumber):
            if not isinstance(other, self.sectype):
                return NotImplemented
            return other
        if isinstance(other, (int, np.integer)):
            # unbox numpy scalars: an object array holding np.int8(2)
            # would wrap in the << frac_length scaling (np.int8(2) << 16
            # == 0), flipping/zeroing the product — Python ints are exact
            return type(self)(np.array(int(other), dtype=object))
        if isinstance(other, (float, np.floating)):
            return type(self)(np.array(float(other), dtype=object))
        if isinstance(other, (list, tuple, np.ndarray)):
            return type(self)(np.asarray(other, dtype=object))
        if isinstance(other, finfields.FiniteFieldArray):
            return type(self)(other)
        if isinstance(other, finfields.FiniteFieldElement):
            return type(self)(np.array(other, dtype=object))
        return NotImplemented

    # arithmetic — forwarded to the same runtime ops as scalars

    def __neg__(self):
        return runtime.neg(self)

    def __pos__(self):
        return runtime.pos(self)

    def __abs__(self):
        return runtime.abs(self)

    def __add__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.add(self, other)

    __radd__ = __add__

    def __sub__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.sub(self, other)

    def __rsub__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.sub(other, self)

    def __mul__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.mul(self, other)

    __rmul__ = __mul__

    def _div_operand_ok(self, other):
        """Divisor/dividend type gate for truediv (reference coercion
        rejects complex and cross-sectype operands with TypeError)."""
        if isinstance(other, SecureArray):
            return other.sectype == self.sectype
        if isinstance(other, SecureObject):
            return isinstance(other, self.sectype)
        if isinstance(other, (bool, int, float, np.integer, np.floating)):
            return True
        if isinstance(other, np.ndarray):
            return other.dtype == object or \
                issubclass(other.dtype.type, (np.integer, np.floating,
                                              np.bool_))
        return isinstance(other, (list, tuple,
                                  finfields.FiniteFieldArray,
                                  finfields.FiniteFieldElement))

    def __truediv__(self, other):
        # public divisors (ints/floats/arrays/raw field values) pass
        # through uncoerced: runtime.div computes the exact public
        # reciprocal instead of a secure Newton iteration (reference
        # np_divide: runtime.py:1183-1196)
        if not self._div_operand_ok(other):
            return NotImplemented
        return runtime.div(self, other)

    def __rtruediv__(self, other):
        if not self._div_operand_ok(other):
            return NotImplemented
        return runtime.div(other, self)

    def __pow__(self, other):
        if isinstance(other, float):
            # fractional public exponent (reference sectypes.py:1164-1171
            # via np_pow: requires positive base)
            return runtime.np_pow(self, other)
        if not isinstance(other, int):
            return NotImplemented
        return runtime.pow(self, other)

    def __rpow__(self, other):
        if not isinstance(other, (int, float)):
            return NotImplemented
        return runtime.np_pow(other, self)

    def __matmul__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.np_matmul(self, other)

    def __rmatmul__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.np_matmul(other, self)

    def __lshift__(self, other):
        if not isinstance(other, (int, np.integer)):
            return NotImplemented
        return runtime.np_left_shift(self, other)

    def __rshift__(self, other):
        if not isinstance(other, int):
            return NotImplemented
        return runtime.np_trunc(self, f=other)

    # comparisons (elementwise; return secure 0/1 arrays)

    def __lt__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.np_less(self, other)

    def __le__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return 1 - runtime.np_less(other, self)

    def __gt__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.np_less(other, self)

    def __ge__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return 1 - runtime.np_less(self, other)

    def __eq__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.np_equal(self, other)

    def __ne__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return 1 - runtime.np_equal(self, other)

    __hash__ = None

    # shape manipulation (local, no communication)

    def __getitem__(self, idx):
        return runtime.np_getitem(self, idx)

    def reshape(self, *shape, order='C'):
        return runtime.np_reshape(self, shape if len(shape) != 1 else shape[0],
                                  order=order)

    def flatten(self):
        return runtime.np_flatten(self)

    @property
    def T(self):
        return runtime.np_transpose(self)

    def transpose(self, *axes):
        return runtime.np_transpose(self, axes if axes else None)

    def swapaxes(self, a, b):
        return runtime.np_swapaxes(self, a, b)

    def copy(self):
        return runtime.np_copy(self)

    def sum(self, axis=None, keepdims=False, initial=0):
        return runtime.np_sum(self, axis=axis, keepdims=keepdims,
                              initial=initial)

    def flip(self, axis=None):
        return runtime.np_flip(self, axis=axis)

    def tolist(self):
        return runtime.np_tolist(self)

    @property
    def flat(self):
        """1D iterator over the array (reference sectypes.py:1227)."""
        yield from self.flatten()

    def diagonal(self, offset=0, axis1=0, axis2=1):
        """Diagonals of 2D (sub)arrays (reference sectypes.py:1270)."""
        return runtime.np_diagonal(self, offset=offset, axis1=axis1,
                                   axis2=axis2)

    def trace(self, offset=0, axis1=0, axis2=1):
        """Sums along diagonals of 2D (sub)arrays (reference
        sectypes.py:1279)."""
        return runtime.np_trace(self, offset=offset, axis1=axis1,
                                axis2=axis2)

    def sort(self, *args, **kwargs):
        """New array sorted along an axis, default -1 (reference
        sectypes.py:1304)."""
        return runtime.np_sort(self, *args, **kwargs)

    def argmin(self, *args, **kwargs):
        """Indices of minimum values; defaults arg_unary=True,
        arg_only=False — NB: different from np_argmin (reference
        sectypes.py:1312)."""
        kwargs.setdefault('arg_unary', True)
        kwargs.setdefault('arg_only', False)
        return runtime.np_argmin(self, *args, **kwargs)

    def argmax(self, *args, **kwargs):
        """Indices of maximum values; defaults arg_unary=True,
        arg_only=False — NB: different from np_argmax (reference
        sectypes.py:1329)."""
        kwargs.setdefault('arg_unary', True)
        kwargs.setdefault('arg_only', False)
        return runtime.np_argmax(self, *args, **kwargs)


class SecureFiniteFieldArray(SecureArray):
    __slots__ = ()

    subfield = None

    def __lt__(self, other):
        raise TypeError('field elements are unordered')

    __le__ = __lt__
    __gt__ = __lt__
    __ge__ = __lt__

    def __xor__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.xor(self, other)

    __rxor__ = __xor__

    def __and__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.and_(self, other)

    __rand__ = __and__

    def __or__(self, other):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        return runtime.or_(self, other)

    __ror__ = __or__

    def __invert__(self):
        return runtime.invert(self)

    @classmethod
    def _encode_public(cls, value):
        arr = np.asarray(value, dtype=object)

        def enc(v):
            if isinstance(v, finfields.FiniteFieldElement):
                return v.value
            if cls.subfield is not None and isinstance(v, int):
                return v  # subfield int embeds directly as constant poly
            return v
        return cls.sectype.field.array(np.vectorize(enc, otypes=[object])(arr))


class SecureIntegerArray(SecureArray):
    __slots__ = ()

    @classmethod
    def _output_conversion(cls, a):
        signed = np.vectorize(
            lambda v: cls.sectype.field(int(v)).signed_(), otypes=[object])
        return signed(a.value)


class SecureFixedPointArray(SecureArray):
    __slots__ = ('integral',)

    def __init__(self, value=None, shape=None, integral=None):
        if integral is None and value is not None and \
                not isinstance(value, (finfields.FiniteFieldArray, LazyShare)):
            arr = np.asarray(value, dtype=object)
            integral = all(isinstance(v, (int, np.integer))
                           or (isinstance(v, float) and v.is_integer())
                           for v in arr.reshape(-1))
        self.integral = integral
        super().__init__(value, shape)

    @classmethod
    def _output_conversion(cls, a):
        f = cls.frac_length
        conv = np.vectorize(
            lambda v: cls.sectype.field(int(v)).signed_() / (1 << f),
            otypes=[object])
        return conv(a.value).astype(np.float64)


# ===========================================================================
# numpy interoperability protocol (reference sectypes.py:21-92,1028-1034)
# ===========================================================================
# Makes numpy calls on secure operands dispatch into the runtime, e.g.
# np.less(secint(9), 10), np.sum(a), np.block([[c, c], [c, c]]).

import operator as _operator  # noqa: E402

_NP_BINARY_UFUNCS = {
    np.less: _operator.lt, np.less_equal: _operator.le,
    np.equal: _operator.eq, np.not_equal: _operator.ne,
    np.greater: _operator.gt, np.greater_equal: _operator.ge,
    np.add: _operator.add, np.subtract: _operator.sub,
    np.multiply: _operator.mul, np.divide: _operator.truediv,
    np.floor_divide: _operator.floordiv, np.remainder: _operator.mod,
    np.divmod: divmod, np.power: _operator.pow,
    np.left_shift: _operator.lshift, np.right_shift: _operator.rshift,
}
_NP_UNARY_UFUNCS = {
    np.negative: _operator.neg, np.positive: _operator.pos,
    np.absolute: _operator.abs,
}
_WRAP_SCALAR_FUNCS = ('log', 'log2', 'log10', 'exp', 'exp2')
_FXP_ONLY_UFUNCS = ('sin', 'cos', 'tan', 'log', 'log2', 'log10',
                    'exp', 'exp2')  # reference: fxp-only transcendentals


def _secure_array_ufunc(self, ufunc, method, *inputs, **kwargs):
    """np.<ufunc>(a, b) on secure operands -> operator / runtime call."""
    if method != '__call__':
        return NotImplemented
    inputs = list(inputs)
    for i, v in enumerate(inputs):
        if isinstance(v, np.integer):
            inputs[i] = int(v)
        elif isinstance(v, np.floating):
            inputs[i] = float(v)
    if (op := _NP_BINARY_UFUNCS.get(ufunc)) is not None:
        a, b = inputs[0], inputs[1]
        if isinstance(a, SecureObject):
            return op(a, b)
        # public-first operand: use the reflected operation
        if op is _operator.sub:
            return b.__rsub__(a)
        if op is _operator.truediv:
            return b.__rtruediv__(a)
        if op is _operator.pow:
            return b.__rpow__(a)
        return op(b, a)
    if (op := _NP_UNARY_UFUNCS.get(ufunc)) is not None:
        return op(inputs[0])
    name = ufunc.__name__
    if name in _FXP_ONLY_UFUNCS and isinstance(inputs[0], SecureObject):
        st = type(inputs[0])
        if not getattr(getattr(st, 'sectype', st), 'frac_length', 0):
            raise TypeError(
                f'np.{name} requires a fixed-point secure type')
    wrapped = False
    if name in _WRAP_SCALAR_FUNCS and not isinstance(inputs[0], SecureArray):
        inputs = [runtime.np_fromlist(list(inputs))]
        wrapped = True
    fn = getattr(runtime, f'np_{name}', None) or getattr(runtime, name, None)
    if fn is None:
        raise TypeError(
            f'np.{name} not supported for {type(self).__name__}')
    out = fn(*inputs, **kwargs)
    if wrapped:
        out = runtime.np_tolist(out)[0]
    return out


def _secure_array_function(self, func, types, args, kwargs):
    """np.<func>(...) on secure arrays -> runtime.np_<func>(...)."""
    name = func.__name__
    if name == 'vstack':
        kwargs = {}  # numpy may inject kwargs converting row_stack
    fn = getattr(runtime, f'np_{name}', None) or getattr(runtime, name, None)
    if fn is None:
        raise TypeError(f'np.{name} not supported for secure arrays')
    return fn(*args, **kwargs)


def _secure_scalar_function(self, func, types, args, kwargs):
    """Scalar secure numbers reuse the array dispatch (reference
    sectypes.py:84-89)."""
    return _secure_array_function(self, func, types, args, kwargs)


SecureObject.__array_ufunc__ = _secure_array_ufunc
SecureObject.__array_function__ = _secure_scalar_function
SecureArray.__array_ufunc__ = _secure_array_ufunc
SecureArray.__array_function__ = _secure_array_function
