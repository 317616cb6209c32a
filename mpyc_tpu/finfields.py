"""Finite (Galois) fields: scalar elements on the host, arrays on the TPU.

Capability parity target: /root/reference/mpyc/finfields.py. Same public
factory surface (``GF``, ``find_prime_root``, ``find_irreducible``; element
classes with overloaded operators and an attached ``.array`` type), but a
TPU-first split of responsibilities:

  * **scalar elements** hold Python ints / gfpx polynomials and compute on the
    host — they appear in configuration math (Lagrange vectors, curve
    constants) where single-value latency beats device dispatch;
  * **arrays** hold device uint32 limb data (Montgomery form for GF(p),
    packed bitmasks for GF(2^d), coefficient stacks for GF(p^d)) and execute
    cached jit kernels from mpyc_tpu.ops — these are the protocol hot path,
    replacing the reference's numpy object-dtype arrays
    (finfields.py:695-1563) with MXU/VPU-friendly fixed-width data.
"""

from __future__ import annotations

import functools

import numpy as np
from mpyc_tpu.utils import lazyjax as _lazyjax
from mpyc_tpu.utils.lazyjax import jax, jnp

from mpyc_tpu import gmpy as gmpy2
from mpyc_tpu import gfpx
from mpyc_tpu.ops import limb
from mpyc_tpu.ops.fieldops import prime_field_ctx
from mpyc_tpu.ops.binary import binary_field_ctx
from mpyc_tpu.ops.extension import ext_field_ctx


def GF(modulus):
    """Create a finite field type for a prime number or irreducible polynomial."""
    if isinstance(modulus, gfpx.Polynomial):
        field = xGF(type(modulus), int(modulus))
    else:
        if isinstance(modulus, tuple):
            p, n, w = modulus
        else:
            p = modulus
            n, w = (1, 1) if p == 2 else (2, p - 1)
        field = pGF(p, n, w)
    return field


def find_prime_root(l, blum=True, n=1):
    """Find prime p of bit length >= l, p % 4 == 3 if blum, with a primitive
    root w of prime order >= n. Returns (p, n, w).

    Mirrors the reference construction (finfields.py:311-344) so generated
    field moduli agree between frameworks.
    """
    if l <= 2:
        if not blum:
            p = 2
            assert n == 1
            w = 1
        else:
            p = 3
            n, w = 2, p - 1
    elif n <= 2:
        p = gmpy2.prev_prime(1 << l)
        if blum:
            while p % 4 != 3:
                p = gmpy2.prev_prime(p)
        w = p - 1 if n == 2 else 1
    else:
        assert blum
        if not gmpy2.is_prime(n):
            n = gmpy2.next_prime(n)
        p = 1 + 2 * n * (3 + 2 * ((1 << (l - 3)) // n))
        while not gmpy2.is_prime(p):
            p += 4 * n
        a = 2
        while (w := gmpy2.powmod(a, (p - 1) // n, p)) == 1:
            a += 1
    return int(p), int(n), int(w)


def find_irreducible(p, d):
    """Smallest irreducible polynomial of degree d over GF(p)."""
    return gfpx.GFpX(p).next_irreducible(p ** d - 1)


def _unpickle_pgf_elt(p, n, w, value):
    """Recreate a prime field element for the pickle module."""
    return pGF(p, n, w)(value)


def _unpickle_xgf_elt(char, modulus_int, value_int):
    """Recreate an extension/binary field element for the pickle module."""
    return xGF(gfpx.GFpX(char), modulus_int)(value_int)


def _unpickle_field_array(elt, values):
    """Recreate a field array from a carrier element + object values."""
    return type(elt).array(values)


# ===========================================================================
# scalar elements (host-side values)
# ===========================================================================



def _coerce_int_const(cls, v):
    """Shared scalar field array for a public int constant.

    Cached instances are frozen (``__setitem__`` raises) so an
    index-assignment into a coerced constant cannot corrupt later
    coercions of the same (field, value).  The cache lives in a dict on
    each array class — it is collected with the class, so runtime-scoped
    SecFld classes are not pinned by a module-global cache."""
    cache = cls.__dict__.get('_const_cache')
    if cache is None:
        cache = {}
        cls._const_cache = cache
    inst = cache.get(v)
    if inst is None:
        inst = cls(np.array(v, dtype=object))
        inst._frozen = True
        if len(cache) < 4096:
            cache[v] = inst
    return inst


def _xp(*arrays):
    """Array namespace for shape plumbing: numpy while every operand is
    host-resident (keeps tiny protocol data off the device so the kernels'
    host fast paths stay applicable), jnp as soon as any operand lives on
    the device."""
    return np if all(isinstance(a, np.ndarray) for a in arrays) else jnp


def _pair_broadcast(ad, bd):
    """Broadcast two data arrays to a common shape, staying in numpy when
    both operands are host-side (so the kernels' host fast path applies).

    Mixed host representations (object rep (..., 1) vs uint32 limbs
    (..., L), see fieldops._mont_out) are unified first — broadcasting
    the element axis across representations would corrupt values."""
    a_obj = getattr(ad, 'dtype', None) == object
    b_obj = getattr(bd, 'dtype', None) == object
    if a_obj != b_obj:
        from mpyc_tpu.ops import limb as _limb
        if a_obj:
            if isinstance(bd, np.ndarray):
                bd = _limb.limbs_to_ints(bd)[..., None]
            else:
                ad = _limb.ints_to_limbs(ad[..., 0], bd.shape[-1])
        else:
            if isinstance(ad, np.ndarray):
                ad = _limb.limbs_to_ints(ad)[..., None]
            else:
                bd = _limb.ints_to_limbs(bd[..., 0], ad.shape[-1])
    if ad.shape == bd.shape:
        return ad, bd
    shape = np.broadcast_shapes(ad.shape, bd.shape)
    if isinstance(ad, np.ndarray) and isinstance(bd, np.ndarray):
        return (np.broadcast_to(ad, shape), np.broadcast_to(bd, shape))
    return (jnp.broadcast_to(ad, shape), jnp.broadcast_to(bd, shape))

def _unify_host_reps(datas):
    """Unify mixed host data representations to uint32 limbs.

    On the jax-free plane, prime-field data is either the object rep
    (..., 1) of Montgomery ints or the canonical uint32 limb rep (..., L)
    (the native kernels produce the latter).  Structural ops (concat,
    stack) must not mix them — the element axis widths differ."""
    if not any(isinstance(d, np.ndarray) and d.dtype == object
               for d in datas):
        return datas
    Ls = [d.shape[-1] for d in datas
          if getattr(d, 'dtype', None) != object]
    if not Ls:
        return datas
    L = max(Ls)
    from mpyc_tpu.ops import limb as _limb
    return [_limb.ints_to_limbs(d[..., 0], L)
            if getattr(d, 'dtype', None) == object else d for d in datas]


def _data_at_set(data, idx, value):
    """Functional indexed update working for both jax and numpy data."""
    if isinstance(data, np.ndarray):
        out = np.array(data, copy=True)
        out[idx] = np.asarray(value)
        return out
    return data.at[idx].set(value)

class FiniteFieldElement:
    """Abstract base for field elements; value is host-side and reduced."""

    __slots__ = ('value',)

    modulus = None
    order = None
    characteristic = None
    ext_deg = None
    byte_length = None
    is_signed = None
    array: type = None
    _mix_types: type = int

    def __init__(self, value):
        self.value = value

    def __int__(self):
        raise NotImplementedError('abstract method')

    @classmethod
    def to_bytes(cls, x):
        """Wire marshal: iterable of int-encoded values -> little-endian bytes."""
        r = cls.byte_length
        return b''.join(int(v).to_bytes(r, 'little') for v in x)

    @classmethod
    def from_bytes(cls, data):
        """Wire unmarshal: bytes -> list of int-encoded values."""
        r = cls.byte_length
        return [int.from_bytes(data[i:i + r], 'little')
                for i in range(0, len(data), r)]

    # subclasses define _v(other) -> raw value or NotImplemented,
    # plus raw-value ops _vadd/_vsub/_vmul/...

    @classmethod
    def _v(cls, other):
        if isinstance(other, cls):
            return other.value
        if isinstance(other, cls._mix_types):
            return other
        return NotImplemented

    def __add__(self, other):
        v = self._v(other)
        if v is NotImplemented:
            return NotImplemented
        return type(self)(self.value + v)

    __radd__ = __add__

    def __sub__(self, other):
        v = self._v(other)
        if v is NotImplemented:
            return NotImplemented
        return type(self)(self.value - v)

    def __rsub__(self, other):
        v = self._v(other)
        if v is NotImplemented:
            return NotImplemented
        return type(self)(v - self.value)

    def __neg__(self):
        return type(self)(-self.value)

    def __pos__(self):
        return type(self)(+self.value)

    def __mul__(self, other):
        v = self._v(other)
        if v is NotImplemented:
            return NotImplemented
        return type(self)(self.value * v)

    __rmul__ = __mul__

    def __truediv__(self, other):
        v = self._v(other)
        if v is NotImplemented:
            return NotImplemented
        return type(self)(self.value * type(self)._reciprocal(v))

    def __rtruediv__(self, other):
        v = self._v(other)
        if v is NotImplemented:
            return NotImplemented
        return type(self)(type(self)._reciprocal(self.value) * v)

    def __lshift__(self, other):
        if not isinstance(other, int):
            return NotImplemented
        return type(self)(self.value << other)

    def __rshift__(self, other):
        raise NotImplementedError('abstract method')

    @classmethod
    def _reciprocal(cls, a):
        raise NotImplementedError('abstract method')

    def reciprocal(self):
        """Multiplicative inverse."""
        cls = type(self)
        return cls(cls._reciprocal(self.value))

    @classmethod
    def _sqrt(cls, a, INV=False):
        raise NotImplementedError('abstract method')

    def sqrt(self, INV=False):
        """Modular (inverse) square root."""
        cls = type(self)
        return cls(cls._sqrt(self.value, INV=INV))

    @classmethod
    def _is_sqr(cls, a):
        raise NotImplementedError('abstract method')

    def is_sqr(self):
        """Quadratic residuosity test (0 counts as square)."""
        return self._is_sqr(self.value)

    def __eq__(self, other):
        v = self._v(other)
        if v is NotImplemented:
            return NotImplemented
        return self.value == self._reduce(v)

    @classmethod
    def _reduce(cls, v):
        return v % cls.modulus

    def __hash__(self):
        return hash((type(self).__name__, self.value))

    def __bool__(self):
        return bool(self.value)

    def __reduce__(self):
        cls = type(self)
        if cls.ext_deg == 1:
            return _unpickle_pgf_elt, (cls.modulus, cls.nth, cls.root,
                                       self.value)

        return _unpickle_xgf_elt, (cls.characteristic, int(cls.modulus),
                                   int(self.value))

    def __array_function__(self, func, types, args, kwargs):
        # delegate to the field's array class (reference finfields.py:83-85)
        return type(self).array.__array_function__(
            self, func, types, args, kwargs)

    # --- array duck-typing -------------------------------------------------
    # Scalar indexing / scalar reductions of field arrays return elements
    # (reference semantics, finfields.py:1004-1009); protocol code treats
    # shares uniformly as shaped values, so elements expose the minimal
    # 0-d array surface (shape/ndim/size/flatten/reshape).
    shape = ()
    ndim = 0
    size = 1

    @property
    def field(self):
        # the element class IS the field (arrays carry it as `.field` too)
        return type(self)

    def flatten(self):
        return type(self).array(np.array([self.value], dtype=object))

    def reshape(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return self.flatten().reshape(shape)


@functools.cache
def pGF(p, n, w):
    """Create the prime field GF(p) with n-th root of unity w (cached so
    repeated GF(p) calls return the identical class — required for
    isinstance checks and pickling across party processes)."""
    if not gmpy2.is_prime(p):
        raise ValueError('modulus is not a prime')

    cls = type(f'GF({p})', (PrimeFieldElement,), {'__slots__': ()})
    cls.__doc__ = 'Prime field element class.'
    cls.modulus = p
    cls.order = p
    cls.characteristic = p
    cls.ext_deg = 1
    cls.byte_length = (p.bit_length() + 7) >> 3
    cls.is_signed = True
    cls.nth = n
    cls.root = w % p
    cls.array = _make_prime_array_class(cls)
    return cls


class PrimeFieldElement(FiniteFieldElement):
    """GF(p) element: a Python int reduced mod p (host-side)."""

    __slots__ = ()

    nth = None
    root = None
    _mix_types = int

    def __init__(self, value):
        if not isinstance(value, int):
            raise TypeError(f'int required, got {type(value).__name__}')
        super().__init__(value % self.modulus)

    def __int__(self):
        """Signed int representation if is_signed, else unsigned."""
        return self.signed_() if self.is_signed else self.unsigned_()

    def __abs__(self):
        return abs(self.__int__())

    def __pow__(self, other):
        if not isinstance(other, int):
            return NotImplemented
        return type(self)(pow(self.value, other, self.modulus))

    @classmethod
    def _reciprocal(cls, a):
        return gmpy2.invert(a, cls.modulus)

    @classmethod
    @functools.lru_cache(maxsize=1)
    def _reciprocal2(cls, n):
        """Inverse of 2**n (1-place cache: trunc uses one n repeatedly)."""
        return cls._reciprocal(1 << n)

    def __rshift__(self, other):
        """Right shift = multiplication by the inverse of 2**other."""
        if not isinstance(other, int):
            return NotImplemented
        cls = type(self)
        return cls(self.value * cls._reciprocal2(other))

    @classmethod
    def _sqrt(cls, a, INV=False):
        p = cls.modulus
        if a == 0:
            if INV:
                raise ZeroDivisionError('no inverse sqrt of 0')
            return a
        if p == 2:
            return a
        if p & 3 == 3:
            # a^((p+1)/4) is a root; INV folds in the inversion exponent
            e = (p * 3 - 5) >> 2 if INV else (p + 1) >> 2
            return pow(a, e, p)
        # p % 4 == 1: Cipolla-Lehmer in GF(p^2) = GF(p)[X]/(X^2 - b X + a)
        b = 1
        while gmpy2.legendre(b * b - 4 * a, p) != -1:
            b += 1
        u, v = 0, 1  # u X + v = X^e mod (X^2 - b X + a)
        e = (p + 1) >> 1
        for i in range(e.bit_length() - 1, -1, -1):
            u2 = u * u % p
            u = ((u << 1) * v + b * u2) % p
            v = (v * v - a * u2) % p
            if (e >> i) & 1:
                u, v = (v + b * u) % p, (-a * u) % p
        if INV:
            v = cls._reciprocal(v)
        return v

    @classmethod
    def _is_sqr(cls, a):
        p = cls.modulus
        return True if p == 2 else gmpy2.legendre(a, p) != -1

    def signed_(self):
        v = self.value
        if v > self.modulus >> 1:
            v -= self.modulus
        return v

    def unsigned_(self):
        return self.value

    def __repr__(self):
        return f'{self.__int__()}'


@functools.cache
def xGF(polycls, modulus_int):
    """Create the field GF(p^d) for irreducible modulus (cached; see pGF)."""
    modulus = polycls(modulus_int)
    p = polycls.p
    if not polycls.is_irreducible(modulus):
        raise ValueError('modulus is not irreducible')

    d = modulus.degree()
    base = BinaryFieldElement if p == 2 else ExtensionFieldElement
    cls = type(f'GF({p}^{d})', (base,), {'__slots__': ()})
    cls.__doc__ = f'{"Binary" if p == 2 else "Extension"} field element class.'
    cls.modulus = modulus
    cls.order = p ** d
    cls.characteristic = p
    cls.ext_deg = d
    cls.byte_length = (cls.order.bit_length() + 7) >> 3
    if p == 2:
        cls.array = _make_binary_array_class(cls)
    else:
        cls.array = _make_ext_array_class(cls)
    return cls


class ExtensionFieldElement(FiniteFieldElement):
    """GF(p^d) element: a gfpx polynomial reduced mod the field modulus."""

    __slots__ = ()

    is_signed = False
    _mix_types = (int, gfpx.Polynomial)

    def __init__(self, value):
        cls = type(self.modulus)
        value = cls(value) % self.modulus
        super().__init__(value)

    @classmethod
    def _v(cls, other):
        if isinstance(other, cls):
            return other.value
        if isinstance(other, cls._mix_types):
            return type(cls.modulus)(other)
        return NotImplemented

    @classmethod
    def _reduce(cls, v):
        return type(cls.modulus)(v) % cls.modulus

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)

    def __int__(self):
        return int(self.value)

    def __add__(self, other):
        v = self._v(other)
        if v is NotImplemented:
            return NotImplemented
        return type(self)((self.value + v) % self.modulus)

    __radd__ = __add__

    def __sub__(self, other):
        v = self._v(other)
        if v is NotImplemented:
            return NotImplemented
        return type(self)((self.value - v) % self.modulus)

    def __rsub__(self, other):
        v = self._v(other)
        if v is NotImplemented:
            return NotImplemented
        return type(self)((v - self.value) % self.modulus)

    def __mul__(self, other):
        v = self._v(other)
        if v is NotImplemented:
            return NotImplemented
        return type(self)((self.value * v) % self.modulus)

    __rmul__ = __mul__

    def __truediv__(self, other):
        v = self._v(other)
        if v is NotImplemented:
            return NotImplemented
        return type(self)((self.value * type(self)._reciprocal(v)) % self.modulus)

    def __rtruediv__(self, other):
        v = self._v(other)
        if v is NotImplemented:
            return NotImplemented
        return type(self)((type(self)._reciprocal(self.value) * v) % self.modulus)

    def __pow__(self, other):
        if not isinstance(other, int):
            return NotImplemented
        if other < 0:
            base = type(self)._reciprocal(self.value)
            other = -other
        else:
            base = self.value
        return type(self)(pow(base, other, self.modulus))

    def __neg__(self):
        return type(self)((-self.value) % self.modulus)

    def __rshift__(self, other):
        # divide by the polynomial with int encoding 1<<other (x^other for
        # char 2, the constant 2^other for larger char) — reference
        # finfields.py:562-566
        if not isinstance(other, int):
            return NotImplemented
        return self * type(self)(self._reciprocal(1 << other))

    @classmethod
    def _reciprocal(cls, a):
        poly = type(cls.modulus)
        return poly.invert(a, cls.modulus)

    @classmethod
    def _sqrt(cls, a, INV=False):
        poly = type(cls.modulus)
        a = poly(a)
        if int(a) == 0:
            if INV:
                raise ZeroDivisionError('no inverse sqrt of 0')
            return a
        q = cls.order
        if q % 2 == 0:
            return pow(a, q >> 1, cls.modulus)
        if q & 3 == 3:
            e = (q * 3 - 5) >> 2 if INV else (q + 1) >> 2
            return pow(a, e, cls.modulus)
        # Tonelli-Shanks over GF(q), q = p^d odd
        n = cls._tonelli_nonsquare()
        q1 = q - 1
        s = (q1 & -q1).bit_length() - 1
        t = q1 >> s
        A = pow(a, t, cls.modulus)
        D = pow(n, t, cls.modulus)
        m = 0
        one = poly(1)
        for i in range(s):
            x = A * pow(D, m, cls.modulus) % cls.modulus
            if pow(x, 1 << (s - 1 - i), cls.modulus) != one:
                m += 1 << i
        x = pow(a, (t + 1) >> 1, cls.modulus) * pow(D, m >> 1, cls.modulus) \
            % cls.modulus
        if INV:
            x = poly(cls._reciprocal(x))
        return x

    @classmethod
    @functools.lru_cache(maxsize=None)
    def _tonelli_nonsquare(cls):
        poly = type(cls.modulus)
        q = cls.order
        i = 2
        while True:
            n = poly(i)
            if int(n) and pow(n, (q - 1) >> 1, cls.modulus) != poly(1):
                return n
            i += 1

    @classmethod
    def _is_sqr(cls, a):
        poly = type(cls.modulus)
        a = poly(a)
        q = cls.order
        if q % 2 == 0:
            return True
        return int(a) == 0 or pow(a, (q - 1) >> 1, cls.modulus) == poly(1)

    def __eq__(self, other):
        v = self._v(other)
        if v is NotImplemented:
            return NotImplemented
        return self.value == self._reduce(v)

    def __hash__(self):
        return hash((type(self).__name__, int(self.value)))

    def __bool__(self):
        return bool(self.value)

    def __repr__(self):
        return repr(self.value)


class BinaryFieldElement(ExtensionFieldElement):
    """GF(2^d) element: a binary polynomial (int bitmask) reduced mod f."""

    __slots__ = ()

    _mix_types = (int, gfpx.BinaryPolynomial)

    @classmethod
    def _sqrt(cls, a, INV=False):
        poly = type(cls.modulus)
        a = poly(a)
        if int(a) == 0:
            if INV:
                raise ZeroDivisionError('no inverse sqrt of 0')
            return a
        e = cls.order >> 1
        x = pow(a, e, cls.modulus)
        if INV:
            x = poly(cls._reciprocal(x))
        return x

    @classmethod
    def _is_sqr(cls, a):
        return True


# ===========================================================================
# arrays (device-side limb data)
# ===========================================================================

class FiniteFieldArray:
    """Abstract base for device-backed field arrays.

    Subclasses store `_data` (a jax uint32 array) whose trailing axes encode
    the element representation; `shape` is the logical element shape.
    """

    __slots__ = ('_data', '_frozen')

    field: type = None            # scalar element class
    _elem_ndim: int = 0           # trailing representation axes

    def __init__(self, value, _internal=False, check=True):
        if _internal:
            if isinstance(value, np.ndarray) or _lazyjax.is_jax_array(value):
                self._data = value
            elif isinstance(value, np.generic) or not _lazyjax.loaded():
                # numpy scalars (indexing results) and everything on the
                # jax-free plane stay host-side
                self._data = np.asarray(value)
            else:
                self._data = jnp.asarray(value)
            return
        if not check and isinstance(value, np.ndarray) and \
                value.dtype != object:
            # reference API: array(np.empty(n), check=False) allocates an
            # arbitrary-content array to be filled by item assignment
            # (reference finfields.py); start from zeros
            value = np.zeros(value.shape, dtype=object)
        enc = self._encode(value)
        # tiny arrays stay host-side (numpy): the elementwise kernels have a
        # bit-identical host fast path, so no device_put is needed until a
        # genuinely large op lifts the data. While jax has not been
        # imported at all (host-only scalar plane), EVERY array stays host:
        # a single device_put would cost the whole jax import.
        self._data = enc if isinstance(enc, np.ndarray) and \
            (enc.size <= 256 or not _lazyjax.loaded()) else jnp.asarray(enc)

    # -- construction ----------------------------------------------------

    @classmethod
    def _encode(cls, value):
        raise NotImplementedError

    @classmethod
    def from_data(cls, data):
        """Wrap raw device representation data (no validation)."""
        return cls(data, _internal=True)

    @property
    def data(self):
        """Raw device representation (uint32)."""
        return self._data

    # -- shape interface ---------------------------------------------------

    @property
    def shape(self):
        nd = self._data.ndim - self._elem_ndim
        return self._data.shape[:nd]

    @property
    def ndim(self):
        return self._data.ndim - self._elem_ndim

    @property
    def size(self):
        return int(np.prod(self.shape, dtype=np.int64)) if self.shape else 1

    def __len__(self):
        if not self.shape:
            raise TypeError('len() of unsized (scalar) field array')
        return self.shape[0]

    def __bool__(self):
        if self.size != 1:
            raise ValueError('truth value of multi-element field array '
                             'is ambiguous')
        return any(int(v) != 0 for v in np.asarray(self._decode()).reshape(-1))

    def reshape(self, *shape, order='C'):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        shape = tuple(shape)
        tail = self._data.shape[self._data.ndim - self._elem_ndim:]
        if order == 'F':
            # F-order = reverse logical axes, C-reshape reversed, reverse back
            nd = self.ndim
            perm = tuple(range(nd))[::-1] + tuple(range(nd, self._data.ndim))
            rev = _xp(self._data).transpose(self._data, perm)
            out = rev.reshape(tuple(reversed(shape)) + tail)
            k = len(shape)
            out = _xp(out).transpose(
                out, tuple(range(k))[::-1] + tuple(range(k, out.ndim)))
            return type(self).from_data(out)
        return type(self).from_data(self._data.reshape(shape + tail))

    def flatten(self):
        return self.reshape(-1)

    def copy(self):
        return type(self).from_data(self._data)

    @property
    def T(self):
        return self.transpose()

    def transpose(self, *axes):
        nd = self.ndim
        if not axes:
            axes = tuple(range(nd - 1, -1, -1))
        elif len(axes) == 1 and isinstance(axes[0], (tuple, list)):
            axes = tuple(axes[0])
        perm = tuple(a % nd for a in axes) + tuple(range(nd, self._data.ndim))
        return type(self).from_data(_xp(self._data).transpose(self._data, perm))

    def swapaxes(self, a, b):
        nd = self.ndim
        return type(self).from_data(_xp(self._data).swapaxes(self._data, a % nd, b % nd))

    def __getitem__(self, idx):
        # full-scalar indexing returns a field element, like the reference
        # (finfields.py:1004-1009); partial indexing returns an array view
        d = self._data[self._expand_idx(idx)]
        if d.ndim == self._elem_ndim:
            v = type(self).from_data(d)._decode()[()]
            return self.field(v)
        return type(self).from_data(d)

    def __contains__(self, value):
        # reference finfields.py:992-1002
        cls = type(self)
        if not isinstance(value, (cls, cls.field)):
            value = cls(value)
            if value.ndim == 0:
                value = value[()]
        value = value.value
        return self.value.__contains__(value)

    def _expand_idx(self, idx):
        """Translate logical indexing (incl. Ellipsis/newaxis) to data axes.

        User indices address logical element dims only; the trailing
        representation axes (limbs/coefficients) must be left untouched.
        """
        if not isinstance(idx, tuple):
            idx = (idx,)
        if any(i is Ellipsis for i in idx):  # NB: `in` would == numpy arrays
            k = next(k for k, i in enumerate(idx) if i is Ellipsis)
            consumed = sum(1 for i in idx
                           if i is not Ellipsis and i is not None)
            fill = self.ndim - consumed
            idx = idx[:k] + (slice(None),) * fill + idx[k + 1:]
        # jax rejects plain list indices; lift them to arrays
        idx = tuple(np.asarray(i) if isinstance(i, list) else i for i in idx)
        return idx

    def at_set(self, idx, value):
        """Functional update: new array with self[idx] = value."""
        value = self._coerce(value)
        idx = self._expand_idx(idx)
        sd, vd = _unify_host_reps([self._data, value._data])
        target_shape = sd[idx].shape
        return type(self).from_data(_data_at_set(
            sd, idx, _xp(sd, vd).broadcast_to(vd, target_shape)))

    def roll(self, shift, axis):
        """Circular shift along a logical axis."""
        return type(self).from_data(
            _xp(self._data).roll(self._data, shift, axis=axis % self.ndim))

    # -- generic views / reductions (reference finfields.py:980-1375) ------

    def ravel(self):
        return self.flatten()

    def diag(a, k=0):
        """np.diag semantics: 2D -> k-th diagonal, 1D -> diagonal matrix
        (reference finfields.py:980)."""
        cls = type(a)
        if a.ndim == 1:
            n = a.shape[0]
            m = n + abs(k)
            tail = a._data.shape[1:]
            xp = _xp(a._data)
            z = xp.zeros((m, m) + tail, dtype=a._data.dtype)
            r = np.arange(n) + max(0, -k)
            c = np.arange(n) + max(0, k)
            z = _data_at_set(z, (r, c), a._data)
            return cls.from_data(z)
        if a.ndim == 2:
            return a.diagonal(offset=k)
        raise ValueError('diag expects a 1D or 2D array')

    def diagonal(self, offset=0, axis1=0, axis2=1):
        nd = self.ndim
        xp = _xp(self._data)
        d = xp.diagonal(self._data, offset, axis1 % nd, axis2 % nd)
        # diagonal appends the diagonal axis last (after elem axes);
        # move it to the last *logical* position
        d = xp.moveaxis(d, -1, d.ndim - 1 - self._elem_ndim)
        return type(self).from_data(d)

    def trace(self, offset=0, axis1=0, axis2=1):
        return self.diagonal(offset, axis1, axis2).sum(axis=-1)

    def take(self, indices, axis=None):
        a = self if axis is not None else self.flatten()
        ax = (axis % a.ndim) if axis is not None else 0
        ax += 0 if ax >= 0 else 0
        return type(a).from_data(
            _xp(a._data).take(a._data, np.asarray(indices), axis=ax))

    def compress(self, condition, axis=None):
        a = self if axis is not None else self.flatten()
        ax = (axis % a.ndim) if axis is not None else 0
        idx = np.nonzero(np.asarray(condition, dtype=bool))[0]
        return type(a).from_data(_xp(a._data).take(a._data, idx, axis=ax))

    def repeat(self, repeats, axis=None):
        a = self if axis is not None else self.flatten()
        ax = (axis % a.ndim) if axis is not None else 0
        if isinstance(repeats, int):
            return type(a).from_data(_xp(a._data).repeat(a._data, repeats, axis=ax))
        # per-element repeat counts: host-computed gather plan (public shape)
        idx = np.repeat(np.arange(a.shape[ax]), np.asarray(repeats))
        return type(a).from_data(_xp(a._data).take(a._data, idx, axis=ax))

    def nonzero(self):
        vals = np.asarray(self._decode())
        return np.nonzero(vals != 0)

    @property
    def flat(self):
        """1D iterator of scalar field elements (reference
        finfields.py:985)."""
        f = self.field
        for v in np.asarray(self._decode()).reshape(-1):
            yield f(int(v))

    def prod(self, axis=None):
        """Product reduction (log-depth tree of field multiplications)."""
        if axis is None:
            d = self.flatten()._data
        else:
            d = _xp(self._data).moveaxis(self._data, axis % self.ndim, 0)
        cur = type(self).from_data(d)
        if cur.shape and cur.shape[0] == 0:
            ones = np.ones(cur.shape[1:], dtype=object)
            return type(self)(ones)
        while cur.shape and cur.shape[0] > 1:
            n = cur.shape[0]
            h = n // 2
            head = cur[:h] * cur[h:2 * h]
            if n % 2:
                tail = _unify_host_reps([head._data, cur._data[2 * h:]])
                head = type(self).from_data(
                    _xp(*tail).concatenate(tail, axis=0))
            cur = head
        return cur[0] if cur.shape else cur

    # -- linear algebra mod the field (host; config-time scale) ------------

    @staticmethod
    def gauss_solve(A, B):
        """Solve A X = B by Gauss-Jordan elimination over the field
        (reference finfields.py:874)."""
        cls = type(A)
        field = cls.field
        n = A.shape[0]
        if A.shape != (n, n):
            raise np.linalg.LinAlgError('array must be square')
        if not isinstance(B, FiniteFieldArray):
            B = cls(np.asarray(B, dtype=object))
        b_vals = np.asarray(B.value)
        b_2d = b_vals.reshape(n, -1)
        W = [[field(int(v)) for v in row_a] + [field(int(v)) for v in row_b]
             for row_a, row_b in zip(np.asarray(A.value).tolist(),
                                     b_2d.tolist())]
        for k in range(n):
            piv = next((r for r in range(k, n) if int(W[r][k]) != 0), None)
            if piv is None:
                raise ZeroDivisionError('no inverse exists')
            if piv != k:
                W[k], W[piv] = W[piv], W[k]
            inv = W[k][k].reciprocal()
            W[k] = [x * inv for x in W[k]]
            for r in range(n):
                if r != k and int(W[r][k]) != 0:
                    f_ = W[r][k]
                    W[r] = [x - f_ * y for x, y in zip(W[r], W[k])]
        X = np.array([[int(x) for x in row[n:]] for row in W], dtype=object)
        return cls(X.reshape(b_vals.shape))

    @staticmethod
    def gauss_inv(A):
        """Matrix inverse by Gaussian elimination (reference
        finfields.py:910)."""
        return FiniteFieldArray.gauss_solve(
            A, type(A)(np.eye(len(A), dtype=object)))

    @staticmethod
    def gauss_det(a):
        """Determinant(s) over the last 2 dimensions (reference
        finfields.py:918)."""
        cls = type(a)
        field = cls.field
        if a.ndim < 2 or a.shape[-1] != a.shape[-2]:
            raise np.linalg.LinAlgError('last 2 dimensions must be square')
        n = a.shape[-1]
        blocks = np.asarray(a.value).reshape(-1, n, n)
        dets = []
        for blk in blocks:
            M = [[field(int(v)) for v in row] for row in blk.tolist()]
            det = field(1)
            for k in range(n):
                piv = next((r for r in range(k, n) if int(M[r][k]) != 0),
                           None)
                if piv is None:
                    det = field(0)
                    break
                if piv != k:
                    M[k], M[piv] = M[piv], M[k]
                    det = -det
                det = det * M[k][k]
                inv = M[k][k].reciprocal()
                for r in range(k + 1, n):
                    if int(M[r][k]) != 0:
                        f_ = M[r][k] * inv
                        M[r] = [x - f_ * y for x, y in zip(M[r], M[k])]
            dets.append(int(det))
        d = np.array(dets, dtype=object).reshape(a.shape[:-2])
        if d.shape == ():
            return field(int(d[()]))
        return cls(d)

    @staticmethod
    def matrix_pow(A, n):
        """Matrix power with negative-exponent support (reference
        finfields.py:959)."""
        cls = type(A)
        if n < 0:
            A = FiniteFieldArray.gauss_inv(A)
            n = -n
        C = cls(np.eye(len(A), dtype=object))
        D = A
        while n:
            if n & 1:
                C = C @ D
            n >>= 1
            if n:
                D = D @ D
        return C

    @classmethod
    def _sqrt(cls, a, INV=False):
        """Classmethod sqrt, reference API (finfields.py:1424-1458)."""
        if not isinstance(a, FiniteFieldArray):
            a = cls(a)
        return a.sqrt(INV=INV)

    def _sqrt_unchecked(self, INV=False):
        """sqrt without the INV zero-divisor readback — protocol code that
        has already rejected zeros (random_bits over odd-characteristic
        fields, reference runtime.py:4160-4174).  PrimeFieldArray overrides
        with the branch-free device kernel; extension/binary arrays fall
        back to the host sqrt."""
        return self.sqrt(INV=INV)

    def _value_objs(self):
        """Decoded values in the reference's object representation
        (ints for GF(p); gfpx polynomials for GF(p^d)/GF(2^d))."""
        return self._decode()

    def __array_ufunc__(self, ufunc, method, *inputs, **kwargs):
        """numpy ufunc protocol, mirroring the reference's semantics
        (finfields.py:727-764).  Field arithmetic routes to the device
        kernels; anything else computes host-side on the decoded values.
        """
        cls = type(self)
        name = ufunc.__name__
        if any(isinstance(a, np.ndarray) and a.dtype != object
               and not issubclass(a.dtype.type, (np.integer, np.bool_))
               for a in inputs):
            return NotImplemented

        if name == 'equal':
            return inputs[1].__eq__(inputs[0])

        if name == 'not_equal':
            return inputs[1].__ne__(inputs[0])

        if name == 'left_shift':
            return inputs[0] << inputs[1]

        if name == 'right_shift':
            return inputs[0] >> inputs[1]

        if name == 'power' and isinstance(inputs[1], cls):
            return NotImplemented

        if name == 'reciprocal':
            return cls.reciprocal(inputs[0])

        if name == 'sqrt':
            return cls.sqrt(inputs[0])

        if method == '__call__' and 'out' not in kwargs:
            # device fast paths for field arithmetic
            if name == 'add':
                return cls.__add__(self, inputs[0] if inputs[1] is self
                                   else inputs[1])
            if name == 'subtract':
                a, b = inputs
                return a - b if isinstance(a, cls) else cls.__rsub__(b, a)
            if name == 'multiply':
                return cls.__mul__(self, inputs[0] if inputs[1] is self
                                   else inputs[1])
            if name in ('divide', 'true_divide'):
                a, b = inputs
                return a / b if isinstance(a, cls) else cls.__rtruediv__(b, a)
            if name == 'matmul':
                a, b = inputs
                return a @ b if isinstance(a, cls) else cls.__rmatmul__(b, a)
            if name == 'negative':
                return cls.__neg__(inputs[0])
            if name == 'positive':
                return cls.__pos__(inputs[0])

        # generic host fallback on object values (reference
        # finfields.py:757-764)
        inputs = tuple(
            a._value_objs() if isinstance(a, FiniteFieldArray) else
            a.value if isinstance(a, cls.field) else a for a in inputs)
        a = getattr(ufunc, method)(*inputs, **kwargs)
        if method != 'at':
            if isinstance(a, np.ndarray):
                a = cls(a)
            else:
                a = cls.field(int(a) if isinstance(a, (int, np.integer))
                              else a)
        return a

    def __array_function__(self, func, types, args, kwargs):
        h = _FF_ARRAY_FUNCTIONS.get(func)
        if h is not None:
            # registered handlers expect arrays; lift bare field elements
            # (delegated here per reference finfields.py:83-85) to 0-d arrays
            args = tuple(
                a.array(np.array(a.value, dtype=object))
                if isinstance(a, FiniteFieldElement) else a for a in args)
            return h(*args, **kwargs)
        # NB: unbound call — `self` may be a FiniteFieldElement delegating
        # through its field's array class (reference finfields.py:83-85)
        return FiniteFieldArray._array_function_fallback(
            self, func, args, kwargs)

    def _array_function_fallback(self, func, args, kwargs):
        """Generic numpy-function dispatch: apply `func` to the decoded
        object-value arrays and wrap the result, mirroring the reference's
        __array_function__ fallback (finfields.py:766-819).  These entry
        points are API-compat glue, not hot paths — heavy ops (matmul,
        elementwise arithmetic) have dedicated device kernels.
        """
        if isinstance(self, FiniteFieldArray):
            cls = type(self)
        else:
            cls = type(self).array
        args = list(args)
        for i, arg in enumerate(args):
            if isinstance(arg, (cls, cls.field)):
                args[i] = arg.value
            elif isinstance(arg, tuple):
                arg = list(arg)
                for j, a in enumerate(arg):
                    if isinstance(a, (cls, cls.field)):
                        a = a.value
                    elif not isinstance(a, (int, np.ndarray)):
                        return NotImplemented
                    arg[j] = a
                args[i] = tuple(arg)
            elif isinstance(arg, list):
                args[i] = [a.value if isinstance(a, (cls, cls.field)) else a
                           for a in arg]
            elif func.__name__ == 'convolve':
                pass
            elif not isinstance(arg, (int, np.ndarray)):
                return NotImplemented

        a = func(*args, **kwargs)

        if isinstance(a, np.ndarray):
            if func.__name__ != 'flatnonzero':
                a = cls(a)
        elif isinstance(a, list):
            a = list(map(cls, a))
        elif isinstance(a, bool) or a is np.True_ or a is np.False_:
            pass
        elif func.__name__.startswith('atleast_'):
            a = tuple(map(cls, a))
        elif isinstance(a, tuple):
            pass
        else:
            if isinstance(a, (int, np.integer)):
                a = int(a)
            a = cls.field(a)
        return a

    def __setitem__(self, idx, value):
        if getattr(self, '_frozen', False):
            raise ValueError('assignment into a shared cached constant; '
                             'copy() it first')
        value = self._coerce(value)
        if value is NotImplemented:
            raise TypeError('cannot assign this type into field array')
        sd, vd = _unify_host_reps([self._data, value._data])
        self._data = _data_at_set(
            sd, idx, _xp(sd, vd).broadcast_to(vd, sd[idx].shape))

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]

    # -- coercion ----------------------------------------------------------

    @classmethod
    def _coerce(cls, other):
        """Coerce to same-field array; NotImplemented if impossible."""
        if isinstance(other, cls):
            return other
        if isinstance(other, FiniteFieldArray):
            if other.field.modulus != cls.field.modulus:
                return NotImplemented
            return cls.from_data(other._data)
        if isinstance(other, cls.field):
            return cls(np.array(other.value if isinstance(other.value, int)
                                else int(other.value), dtype=object))
        if isinstance(other, (int, np.integer)):
            # public protocol constants (2, 3, 1<<f, ...) recur on every
            # op; encoding one is ~100 us of kernel dispatch, so share a
            # cached immutable instance per (field, value)
            return _coerce_int_const(cls, int(other))
        if isinstance(other, (list, tuple, np.ndarray)):
            return cls(other)
        return NotImplemented

    # -- value extraction ----------------------------------------------------

    @property
    def value(self):
        """Object ndarray of int-encoded values (host transfer + decode)."""
        return self._decode()

    def tolist(self):
        """Nested list of scalar field elements."""
        vals = self._decode()
        f = self.field
        if vals.ndim == 0:
            return f(int(vals[()]))
        return np.vectorize(lambda v: f(int(v)), otypes=[object])(vals).tolist()

    def __reduce__(self):
        # pickle via the (picklable) scalar field class + decoded values,
        # so transfer() of field arrays between parties round-trips
        # (reference wires share arrays as pickles, runtime.py:478-485)
        return _unpickle_field_array, (self.field(0), self._decode())

    def __int__(self):
        if self.shape != ():
            raise TypeError('only scalar (shape-()) arrays convert to int')
        return int(self.field(int(self._decode()[()])))

    # -- operators (implemented per representation subclass) -----------------

    def _binop(self, other, opname, reflected=False):
        raise NotImplementedError

    def __add__(self, other):
        return self._binop(other, 'add')

    def __radd__(self, other):
        return self._binop(other, 'add')

    def __sub__(self, other):
        return self._binop(other, 'sub')

    def __rsub__(self, other):
        return self._binop(other, 'sub', reflected=True)

    def __mul__(self, other):
        return self._binop(other, 'mul')

    def __rmul__(self, other):
        return self._binop(other, 'mul')

    def __truediv__(self, other):
        return self._binop(other, 'div')

    def __rtruediv__(self, other):
        return self._binop(other, 'div', reflected=True)

    def __matmul__(self, other):
        return self._matmul(other)

    def __rmatmul__(self, other):
        return self._matmul(other, reflected=True)

    def __repr__(self):
        return f'{type(self).__name__}({self._decode()!r})'


def _as_pytree(cls):
    # deferred: registering a pytree node needs jax, which the host-only
    # scalar plane never imports (utils/lazyjax.py)
    _lazyjax.on_jax_load(lambda: jax.tree_util.register_pytree_node(
        cls,
        lambda a: ((a._data,), None),
        lambda aux, ch: cls.from_data(ch[0])))
    return cls


class PrimeFieldArray(FiniteFieldArray):
    """GF(p) array: (..., L) uint32 Montgomery-form limbs on device."""

    __slots__ = ()

    ctx = None
    _elem_ndim = 1

    @classmethod
    def _encode(cls, value):
        ctx = cls.ctx
        if isinstance(value, FiniteFieldArray):
            return value._data
        if _lazyjax.is_jax_array(value) and value.dtype == np.uint32:
            # raw limbs passed explicitly; must already be Montgomery form
            return value
        if isinstance(value, np.ndarray) and value.dtype != object and \
                issubclass(value.dtype.type, (np.integer, np.bool_)):
            if not _lazyjax.loaded():
                # jax-free plane: vectorized object-int encode writes the
                # object rep directly — cheaper than limb packing + the
                # from_std kernel dispatch of _encode_i64
                return ctx.encode_ints(value)
            enc = cls._encode_i64(value.astype(np.int64))
            if enc is not None:
                return enc
            return ctx.encode_ints(value)      # rare fallback (INT64_MIN)
        arr = np.asarray(value, dtype=object)
        if arr.size and isinstance(arr.reshape(-1)[0], (int, np.integer)):
            if not _lazyjax.loaded():
                try:
                    return ctx.encode_ints(arr)
                except (TypeError, AttributeError, OverflowError):
                    pass
            # common case: plain-int object array — int64-cast when it fits
            # (kernel-side Montgomery encode beats host bigint arithmetic)
            try:
                v64 = arr.astype(np.int64)
            except (TypeError, OverflowError, ValueError):
                v64 = None
            if v64 is not None:
                enc = cls._encode_i64(v64)
                if enc is not None:
                    return enc
            # mixed element/int or wide-int arrays: host object path
            try:
                return ctx.encode_ints(arr)
            except (TypeError, AttributeError, OverflowError):
                pass
        conv = np.vectorize(
            lambda v: int(v.value) if isinstance(v, PrimeFieldElement) else int(v),
            otypes=[object])
        arr = conv(arr) if arr.size else arr
        return ctx.encode_ints(arr)

    @classmethod
    def _encode_i64(cls, v):
        """int64 ndarray -> Montgomery limb data via the from_std kernel
        (device for large batches, bit-identical host twin for tiny ones) —
        no per-element host bigint arithmetic. Returns None on the one
        unrepresentable value (INT64_MIN, |v| overflows)."""
        ctx = cls.ctx
        L = ctx.L
        if (v == np.iinfo(np.int64).min).any():
            return None
        if L == 1:
            u = (v % np.int64(ctx.p)).astype(np.uint32)[..., None]
            return ctx.from_std(u)
        neg = v < 0
        av = np.where(neg, -v, v).astype(np.uint64)
        limbs = np.zeros(v.shape + (L,), np.uint32)
        limbs[..., 0] = (av & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        limbs[..., 1] = (av >> np.uint64(32)).astype(np.uint32)
        data = ctx.from_std(limbs)
        if neg.any():
            negd = ctx.neg(data)
            data = _xp(data, negd).where(neg[..., None], negd, data)
        return data

    def _decode(self):
        return self.ctx.decode_ints(np.asarray(self._data))

    def signed_(self):
        """Signed integer representation, symmetric around zero
        (reference finfields.py:1395)."""
        p = self.field.modulus
        v = self._decode()
        return np.where(v > p >> 1, v - p, v)

    def unsigned_(self):
        """Unsigned integer representation (reference finfields.py:1404)."""
        return self._decode().copy()

    @classmethod
    def intarray(cls, a):
        """Extract field array as a (signed) integer object ndarray
        (reference finfields.py:1378)."""
        vals = np.asarray(a._decode())
        if cls.field.is_signed and vals.size:
            p = cls.field.modulus
            half = p >> 1
            vals = np.vectorize(
                lambda v: int(v) - p if int(v) > half else int(v),
                otypes=[object])(vals)
        return vals

    def _binop(self, other, opname, reflected=False):
        o = self._coerce(other)
        if o is NotImplemented:
            return NotImplemented
        a, b = (o, self) if reflected else (self, o)
        ad, bd = _pair_broadcast(a._data, b._data)
        out = getattr(self.ctx, opname)(ad, bd)
        return type(self).from_data(out)

    def __neg__(self):
        return type(self).from_data(self.ctx.neg(self._data))

    def __pos__(self):
        return self

    def __pow__(self, e):
        if not isinstance(e, int):
            return NotImplemented
        return type(self).from_data(self.ctx.pow_const(e)(self._data))

    def __lshift__(self, n):
        if not isinstance(n, int):
            return NotImplemented
        return type(self).from_data(self.ctx.mul_const(1 << n)(self._data))

    def __rshift__(self, n):
        if not isinstance(n, int):
            return NotImplemented
        inv2n = gmpy2.invert(1 << n, self.ctx.p)
        return type(self).from_data(self.ctx.mul_const(inv2n)(self._data))

    def __eq__(self, other):
        o = self._coerce(other)
        if o is NotImplemented:
            return NotImplemented
        xp = _xp(self._data, o._data)
        ad = xp.broadcast_to(
            self._data, np.broadcast_shapes(self._data.shape, o._data.shape))
        bd = xp.broadcast_to(o._data, ad.shape)
        return np.asarray(self.ctx.eq(ad, bd))

    def __ne__(self, other):
        r = self.__eq__(other)
        return NotImplemented if r is NotImplemented else ~r

    def __hash__(self):
        raise TypeError('field arrays are unhashable')

    def reciprocal(self):
        return type(self).from_data(self.ctx.inv(self._data))

    def sqrt(self, INV=False):
        if INV and bool(np.any(np.asarray(self.ctx.is_zero(self._data)))):
            raise ZeroDivisionError('no inverse sqrt of 0')
        return self._sqrt_unchecked(INV=INV)

    def _sqrt_unchecked(self, INV=False):
        """sqrt without the INV zero-divisor readback — for protocol code
        that has already rejected zeros (e.g. random_bits)."""
        # device/host twin kernels for both p % 4 cases: Blum exponent for
        # p % 4 == 3, constant-iteration Tonelli-Shanks for p % 4 == 1
        return type(self).from_data(self.ctx.sqrt(INV=INV)(self._data))

    def is_sqr(self):
        leg = np.asarray(self.ctx.legendre(self._data))
        return leg != -1

    def to_bits_public(self, l: int):
        """Public value bits: uint32 (…, l) LSB-first (device)."""
        return self.ctx.to_bits(l)(self._data)

    @classmethod
    def from_bits_uint(cls, bits):
        """uint32 0/1 (…, l) -> field array of the packed values."""
        return cls.from_data(cls.ctx.from_bits(bits.shape[-1])(bits))

    @classmethod
    def from_uint32(cls, v):
        """uint32 (…,) -> field array (values taken mod p implicitly small)."""
        return cls.from_data(cls.ctx.from_uint32(v))

    def mod_pow2(self, f: int):
        """Elementwise (value mod 2**f) as a new field array (device)."""
        return type(self).from_data(self.ctx.mod_pow2(f)(self._data))

    def to_uint_limbs(self):
        """Standard-form little-endian uint32 limbs (device array)."""
        return self.ctx.to_std(self._data)

    @classmethod
    def from_uint_limbs(cls, limbs):
        """Wrap standard-form limbs (values < p) as a field array."""
        return cls.from_data(cls.ctx.from_std(limbs))

    def sum(self, axis=None):
        scalar_out = axis is None or (
            isinstance(axis, tuple) and len(axis) == self.ndim) or \
            self.ndim == 1
        if isinstance(axis, tuple):
            # tuple-axis: reduce highest-numbered axes first
            res = self
            for ax in sorted((a % self.ndim for a in axis), reverse=True):
                res = res.sum(axis=ax) if res.ndim > 1 else res.sum()
            return res
        d = self._data
        if isinstance(d, np.ndarray) and (d.size <= 4096
                                          or d.dtype == object
                                          or not _lazyjax.loaded()):
            # host fast path: Montgomery sums are plain modular sums
            # (the jax-free plane serves EVERY size: one big reduction
            # must not pull in the jax import + XLA-CPU compiles)
            ctx = self.ctx
            vals = limb.limbs_to_ints(d)  # object ints, Montgomery domain
            s = vals.sum() if axis is None else vals.sum(axis % self.ndim)
            out = np.vectorize(lambda v: int(v) % ctx.p, otypes=[object])(
                np.asarray(s, dtype=object))
            res = type(self).from_data(
                ctx._mont_out(out.reshape(-1), out.shape))
        else:
            if axis is None:
                d = d.reshape(-1, self.ctx.L)
                axis = 0
            else:
                axis = axis % self.ndim
                d = jnp.moveaxis(d, axis, 0)
            res = type(self).from_data(self.ctx.sum(d))
        if scalar_out and res.ndim == 0:
            # scalar reduction yields a field element (reference
            # finfields.py:1332-1335)
            return self.field(res._decode()[()])
        return res

    def cumsum(self, axis=-1):
        """Inclusive prefix sums along a logical axis."""
        ctx = self.ctx
        ax = axis % self.ndim
        d = self._data
        if isinstance(d, np.ndarray) and (d.size <= 4096
                                          or d.dtype == object
                                          or not _lazyjax.loaded()):
            vals = limb.limbs_to_ints(d)  # Montgomery ints (linear in sums)
            cs = np.cumsum(vals, axis=ax)
            out = np.vectorize(lambda v: int(v) % ctx.p, otypes=[object])(
                np.asarray(cs, dtype=object))
            return type(self).from_data(
                ctx._mont_out(out.reshape(-1), out.shape))
        # device: Hillis-Steele doubling (log n modular adds)
        cur = self
        n = self.shape[ax]
        zeros_block = type(self)(np.zeros(1, dtype=object))
        dstep = 1
        while dstep < n:
            rolled = type(cur).from_data(
                _xp(cur._data).roll(cur._data, dstep, axis=ax))
            idx = tuple(slice(None) if i != ax else slice(0, dstep)
                        for i in range(self.ndim))
            rolled = rolled.at_set(idx, zeros_block)
            cur = cur + rolled
            dstep *= 2
        return cur

    def _matmul(self, other, reflected=False):
        o = self._coerce(other)
        if o is NotImplemented:
            return NotImplemented
        a, b = (o, self) if reflected else (self, o)
        ad, bd = a._data, b._data
        a1 = ad.ndim - 1 == 1  # logical 1-D
        b1 = bd.ndim - 1 == 1
        if a1:
            ad = ad[None, :, :]
        if b1:
            bd = bd[:, None, :]
        out = self.ctx.matmul(ad, bd)
        if a1:
            out = out[..., 0, :, :]
        if b1:
            out = out[..., 0, :]
        return type(self).from_data(out)


class BinaryFieldArray(FiniteFieldArray):
    """GF(2^d) array: one packed d-bit polynomial per uint32 lane."""

    __slots__ = ()

    ctx = None
    _elem_ndim = 0

    @classmethod
    def _coerce(cls, other):
        if isinstance(other, gfpx.Polynomial):
            return cls(np.array(int(other), dtype=object))
        return super()._coerce(other)

    @classmethod
    def _encode(cls, value):
        if isinstance(value, FiniteFieldArray):
            return value._data
        if _lazyjax.is_jax_array(value) and value.dtype == np.uint32:
            return value
        arr = np.asarray(value, dtype=object)
        if arr.size and isinstance(arr.reshape(-1)[0], FiniteFieldElement):
            flat = arr.reshape(-1)
            arr = np.array([int(v.value) if isinstance(
                v, FiniteFieldElement) else int(v) for v in flat],
                dtype=object).reshape(arr.shape)
        return cls.ctx.encode_ints(arr)

    def _decode(self):
        return self.ctx.decode_ints(np.asarray(self._data))

    def _binop(self, other, opname, reflected=False):
        o = self._coerce(other)
        if o is NotImplemented:
            return NotImplemented
        a, b = (o, self) if reflected else (self, o)
        ad, bd = _pair_broadcast(a._data, b._data)
        out = getattr(self.ctx, opname)(ad, bd)
        return type(self).from_data(out)

    def __neg__(self):
        return self

    __pos__ = __neg__

    def __pow__(self, e):
        if not isinstance(e, int):
            return NotImplemented
        return type(self).from_data(self.ctx.pow_const(e)(self._data))

    def __eq__(self, other):
        o = self._coerce(other)
        if o is NotImplemented:
            return NotImplemented
        return np.asarray(self._data == o._data)

    def __ne__(self, other):
        r = self.__eq__(other)
        return NotImplemented if r is NotImplemented else ~r

    def __hash__(self):
        raise TypeError('field arrays are unhashable')

    def _value_objs(self):
        # reference binary arrays hold BinaryPolynomial values
        poly = type(self.field.modulus)
        return np.vectorize(lambda v: poly(int(v)), otypes=[object])(
            self._decode()) if self.size else \
            np.empty(self.shape, dtype=object)

    @property
    def value(self):
        return self._value_objs()

    def reciprocal(self):
        return type(self).from_data(self.ctx.inv(self._data))

    def sqrt(self, INV=False):
        if INV and bool(np.any(np.asarray(self._data) == 0)
                        if isinstance(self._data, np.ndarray)
                        else jnp.any(self._data == 0)):
            raise ZeroDivisionError('no inverse sqrt of 0')
        out = self.ctx.sqrt(self._data)
        if INV:
            out = self.ctx.inv(out)
        return type(self).from_data(out)

    def is_sqr(self):
        return np.ones(self.shape, dtype=bool)

    def sum(self, axis=None):
        # field (XOR) sum: the reference stores BinaryPolynomial values, so
        # its object-sum (finfields.py:1332-1337) is polynomial addition
        d = self._data
        if axis is None:
            d = d.reshape(-1)
            axis = 0
        elif isinstance(axis, tuple):
            res = self
            for ax in sorted((a % self.ndim for a in axis), reverse=True):
                res = res.sum(axis=ax)
                if not isinstance(res, FiniteFieldArray):
                    return res
            return res
        else:
            axis = axis % max(d.ndim, 1)
        if isinstance(d, np.ndarray):
            red = np.bitwise_xor.reduce(d, axis=axis)
            res = type(self).from_data(np.asarray(red, dtype=np.uint32))
        else:
            redf = jax.jit(lambda x: jax.lax.reduce(
                x, jnp.uint32(0), lambda p, q: p ^ q, (axis,)))
            res = type(self).from_data(redf(d))
        if res.ndim == 0:
            # scalar reduction yields a field element (reference
            # finfields.py:1332-1335)
            return self.field(int(res._decode()[()]))
        return res

    def _matmul(self, other, reflected=False):
        o = self._coerce(other)
        if o is NotImplemented:
            return NotImplemented
        a, b = (o, self) if reflected else (self, o)
        ad, bd = a._data, b._data
        a1 = ad.ndim == 1
        b1 = bd.ndim == 1
        if a1:
            ad = ad[None, :]
        if b1:
            bd = bd[:, None]
        out = self.ctx.matmul(ad, bd)
        if a1:
            out = out[..., 0, :]
        if b1:
            out = out[..., 0]
        return type(self).from_data(out)


class ExtensionFieldArray(FiniteFieldArray):
    """GF(p^d) array, odd p: (..., d, L) Montgomery coefficient stacks."""

    __slots__ = ()

    ctx = None
    _elem_ndim = 2

    @classmethod
    def _encode(cls, value):
        if isinstance(value, FiniteFieldArray):
            return value._data
        if _lazyjax.is_jax_array(value) and value.dtype == np.uint32:
            return value
        arr = np.asarray(value, dtype=object)
        conv = np.vectorize(
            lambda v: v.value if isinstance(v, FiniteFieldElement) else v,
            otypes=[object])
        arr = conv(arr) if arr.size else arr
        return cls.ctx.encode_polys(arr)

    def _decode(self):
        return self.ctx.decode_ints(np.asarray(self._data))

    def _binop(self, other, opname, reflected=False):
        o = self._coerce(other)
        if o is NotImplemented:
            return NotImplemented
        a, b = (o, self) if reflected else (self, o)
        ad, bd = _pair_broadcast(a._data, b._data)
        out = getattr(self.ctx, opname)(ad, bd)
        return type(self).from_data(out)

    def __neg__(self):
        return type(self).from_data(self.ctx.neg(self._data))

    def __pos__(self):
        return self

    def __pow__(self, e):
        if not isinstance(e, int):
            return NotImplemented
        return type(self).from_data(self.ctx.pow_const(e)(self._data))

    def __eq__(self, other):
        o = self._coerce(other)
        if o is NotImplemented:
            return NotImplemented
        xp = _xp(self._data, o._data)
        ad = xp.broadcast_to(
            self._data, np.broadcast_shapes(self._data.shape, o._data.shape))
        bd = xp.broadcast_to(o._data, ad.shape)
        return np.asarray(self.ctx.eq(ad, bd))

    def __ne__(self, other):
        r = self.__eq__(other)
        return NotImplemented if r is NotImplemented else ~r

    def __hash__(self):
        raise TypeError('field arrays are unhashable')

    def _value_objs(self):
        # reference extension arrays hold gfpx Polynomial values
        poly = type(self.field.modulus)
        return np.vectorize(lambda v: poly(int(v)), otypes=[object])(
            self._decode()) if self.size else \
            np.empty(self.shape, dtype=object)

    @property
    def value(self):
        return self._value_objs()

    def reciprocal(self):
        return type(self).from_data(self.ctx.inv(self._data))

    def is_sqr(self):
        vals = self._decode()
        f = self.field
        return np.vectorize(lambda v: f._is_sqr(v), otypes=[bool])(vals)

    def sqrt(self, INV=False):
        vals = self._decode()
        f = self.field
        out = np.vectorize(lambda v: f._sqrt(v, INV=INV), otypes=[object])(vals)
        return type(self)(out)

    def __lshift__(self, n):
        if not isinstance(n, int):
            return NotImplemented
        return self * ((1 << n) % self.field.characteristic)

    def __rshift__(self, n):
        if not isinstance(n, int):
            return NotImplemented
        p = self.field.characteristic
        return self * int(gmpy2.invert((1 << n) % p, p))

    @classmethod
    def _coerce(cls, other):
        if isinstance(other, cls):
            return other
        if isinstance(other, cls.field):
            return cls(np.array(other.value, dtype=object))
        if isinstance(other, (int, gfpx.Polynomial)):
            return cls(np.array(type(cls.field.modulus)(other), dtype=object))
        if isinstance(other, (list, tuple, np.ndarray)):
            return cls(other)
        return NotImplemented

    def sum(self, axis=None):
        if axis is None:
            cur = self.flatten()
        else:
            cur = type(self).from_data(
                _xp(self._data).moveaxis(self._data, axis % self.ndim, 0))
        while cur.shape and cur.shape[0] > 1:
            n = cur.shape[0]
            h = n // 2
            head = cur[:h] + cur[h:2 * h]
            if n % 2:
                tail = _unify_host_reps([head._data, cur._data[2 * h:]])
                head = type(self).from_data(
                    _xp(*tail).concatenate(tail, axis=0))
            cur = head
        return cur[0] if cur.shape else cur

    def _matmul(self, other, reflected=False):
        o = self._coerce(other)
        if o is NotImplemented:
            return NotImplemented
        a, b = (o, self) if reflected else (self, o)
        a2 = a.reshape((1,) + a.shape) if a.ndim == 1 else a
        b2 = b.reshape(b.shape + (1,)) if b.ndim == 1 else b
        prod = a2[:, :, None] * b2[None, :, :]
        out = prod.sum(axis=1)
        if a.ndim == 1:
            out = out.reshape(out.shape[1:])
        if b.ndim == 1:
            out = out.reshape(out.shape[:-1])
        return out


# -- dynamic array class factories -------------------------------------------

@functools.cache
def _make_prime_array_class(field_cls):
    p = field_cls.modulus
    if p == 2:
        ctx = binary_field_ctx(2)  # GF(2) == GF(2^1) arithmetically
        cls = type(f'Array{field_cls.__name__}', (BinaryFieldArray,),
                   {'__slots__': ()})
    else:
        ctx = prime_field_ctx(p)
        cls = type(f'Array{field_cls.__name__}', (PrimeFieldArray,),
                   {'__slots__': ()})
    cls.field = field_cls
    cls.ctx = ctx
    return _as_pytree(cls)


@functools.cache
def _make_binary_array_class(field_cls):
    ctx = binary_field_ctx(int(field_cls.modulus))
    cls = type(f'Array{field_cls.__name__}', (BinaryFieldArray,),
               {'__slots__': ()})
    cls.field = field_cls
    cls.ctx = ctx
    return _as_pytree(cls)


@functools.cache
def _make_ext_array_class(field_cls):
    modulus = field_cls.modulus
    ctx = ext_field_ctx(type(modulus).p, tuple(modulus.value))
    cls = type(f'Array{field_cls.__name__}', (ExtensionFieldArray,),
               {'__slots__': ()})
    cls.field = field_cls
    cls.ctx = ctx
    return _as_pytree(cls)


def arrayGF(field, modulus=None):
    """Array class attached to a field (reference finfields.py:46)."""
    return field.array


def _ff_block(arrays):
    """np.block over nested lists of field arrays/elements (reference
    finfields.py:837-862)."""
    def extract_type(s):
        if isinstance(s, list):
            for a in s:
                if (cls := extract_type(a)) is not None:
                    return cls
            return None
        if isinstance(s, (FiniteFieldArray, FiniteFieldElement)):
            return type(s)
        return None

    cls = extract_type(arrays)
    if issubclass(cls, FiniteFieldElement):
        cls = cls.array

    def peel(s):
        if isinstance(s, list):
            return [peel(a) for a in s]
        if isinstance(s, (cls, cls.field)):
            return s.value
        return s

    return cls(np.block(peel(arrays)))


# numpy __array_function__ dispatch for plain field arrays (reference
# registers via @_implements, finfields.py:686-692)
_FF_ARRAY_FUNCTIONS = {
    np.block: _ff_block,
    np.linalg.solve: FiniteFieldArray.gauss_solve,
    np.linalg.inv: FiniteFieldArray.gauss_inv,
    np.linalg.det: FiniteFieldArray.gauss_det,
    np.linalg.matrix_power: FiniteFieldArray.matrix_pow,
    np.diag: FiniteFieldArray.diag,
    np.diagonal: lambda a, *args, **kw: a.diagonal(*args, **kw),
    np.trace: lambda a, *args, **kw: a.trace(*args, **kw),
    np.take: lambda a, indices, **kw: a.take(indices, **kw),
    np.repeat: lambda a, repeats, **kw: a.repeat(repeats, **kw),
    np.nonzero: lambda a: a.nonzero(),
    np.prod: lambda a, **kw: a.prod(**kw),
    np.sum: lambda a, **kw: a.sum(**kw),
    np.transpose: lambda a, *args, **kw: a.transpose(*args, **kw),
    np.reshape: lambda a, shape, **kw: a.reshape(shape, **kw),
    np.ravel: lambda a, **kw: a.ravel(),
    np.array_equal: lambda a, b, **kw: bool(
        isinstance(b, FiniteFieldArray) and a.shape == b.shape and
        bool(np.all(a == b))) if isinstance(a, FiniteFieldArray) else bool(
        np.asarray(a).shape == b.shape and bool(np.all(b == np.asarray(a)))),
}
