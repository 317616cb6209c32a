"""Finite groups for threshold cryptography.

Capability parity target: /root/reference/mpyc/fingroups.py (1,986 LoC).
Six group families, same public surface:

  * symmetric groups of any degree          (SymmetricGroup)
  * quadratic residues modulo a safe prime  (QuadraticResidues)
  * Schnorr groups                          (SchnorrGroup)
  * elliptic curves: Edwards (affine/projective/extended), Weierstrass
    (affine/projective/jacobian); Ed25519, Ed448, secp256k1, BN256,
    BN256_twist                             (EllipticCurve)
  * hyperelliptic curves: Cantor arithmetic for any genus plus
    Costello--Lauter extended coordinates for genus 2 ('kummer1271',
    DGS random curves)                      (HyperellipticCurve)
  * class groups of imaginary quadratic fields with NUCOMP/NUDUPL
                                            (ClassGroup)

Operator conventions match the reference (fingroups.py:44-113): @ for the
group operation, ~ for inversion, ^ for repeated application, with
additive (+, -, n*a) and multiplicative (*, 1/a, a**n) aliases.

Group elements here are *host-side scalars*: they appear in protocol
configuration (generators, curve constants) and in public post-processing
(opened signatures, decoded ballots).  The secure counterparts in
mpyc_tpu.secgroups re-express the oblivious-capable formulas (Edwards,
Weierstrass projective, Costello--Lauter) over device share arrays, where
the same straight-line sequences become batched field kernels.

Dynamic group types are registered in module globals under their unique
names so instances pickle across party processes (the reference relies on
the same trick, fingroups.py:260, :411, :540).
"""

import math
import random
import functools

from mpyc_tpu.gmpy import (
    powmod, gcdext, is_prime, next_prime, prev_prime, legendre, isqrt, iroot)
from mpyc_tpu.gfpx import GFpX, Polynomial
from mpyc_tpu.finfields import GF, find_prime_root


def _abstract_law(cls, *args):
    raise NotImplementedError


class FiniteGroupElement:
    """Abstract base class for finite group elements.

    Subclasses provide classmethods operation/inversion/equality (and may
    override operation2/repeat); the base class maps Python operators onto
    them following the reference conventions (fingroups.py:44-205).
    """

    __slots__ = ('value',)

    order = None
    is_additive = False
    is_multiplicative = False
    identity = None
    is_abelian = None
    is_cyclic = None
    generator = None

    def _trait(self, name):
        if not getattr(type(self), name):
            kind = name.split('_', 1)[1]
            raise TypeError(f'group not {kind}')

    def __matmul__(self, other):
        if other is self:
            return type(self).operation2(self)
        if not isinstance(other, type(self)):
            return NotImplemented
        return type(self).operation(self, other)

    def __invert__(self):
        return type(self).inversion(self)

    def __xor__(self, n):
        if not isinstance(n, int):
            return NotImplemented
        return type(self).repeat(self, n)

    # -- additive aliases --------------------------------------------------

    def __add__(self, other):
        self._trait('is_additive')
        return self.__matmul__(other)

    def __neg__(self):
        self._trait('is_additive')
        return self.__invert__()

    def __sub__(self, other):
        self._trait('is_additive')
        return self.__matmul__(~other)

    # -- multiplicative aliases -------------------------------------------

    def __mul__(self, other):
        if type(self).is_additive:
            return NotImplemented
        self._trait('is_multiplicative')
        return self.__matmul__(other)

    def __rmul__(self, other):
        if type(self).is_additive:
            return self.__xor__(other)
        self._trait('is_multiplicative')
        if type(self).is_abelian:
            return self.__matmul__(other)
        return type(self)(other).__matmul__(self)

    def __truediv__(self, other):
        self._trait('is_multiplicative')
        return self.__matmul__(~other)

    def __rtruediv__(self, other):
        self._trait('is_multiplicative')
        if other != 1:
            raise TypeError('only 1/. supported')
        return self.__invert__()

    def __pow__(self, n):
        self._trait('is_multiplicative')
        return self.__xor__(n)

    # -- equality / hashing ------------------------------------------------

    def __eq__(self, other):
        if not isinstance(other, type(self)):
            return NotImplemented
        return type(self).equality(self, other)

    def __hash__(self):
        return hash((type(self).__name__, self.value))

    def __repr__(self):
        return repr(self.value)

    # -- abstract group law ------------------------------------------------

    # the group law proper: subclasses fill in these three classmethods
    # (operation2 optionally, when doubling has a cheaper formula)

    operation = classmethod(_abstract_law)
    inversion = classmethod(_abstract_law)
    equality = classmethod(_abstract_law)

    @classmethod
    def operation2(cls, a, /):
        """Return a @ a (override when doubling is cheaper)."""
        return cls.operation(a, a)

    def inverse(self):
        """Inverse of self (convenience method)."""
        return type(self).inversion(self)

    @staticmethod
    def repeat(a, n):
        """Return the n-th @-power of a, any integer n (binary ladder)."""
        cls = type(a)
        if n == 0:
            return cls.identity
        if n < 0:
            a, n = cls.inversion(a), -n
        acc = a
        for bit in bin(n)[3:]:          # MSB-first, skipping the top bit
            acc = cls.operation2(acc)
            if bit == '1':
                acc = cls.operation(acc, a)
        return acc


def _group_type(name, base, **attrs):
    """Mint a dynamic group type and register it for pickling."""
    cls = type(name, (base,), {'__slots__': ()})
    for k, v in attrs.items():
        setattr(cls, k, v)
    globals()[name] = cls
    return cls


# ===========================================================================
# symmetric groups
# ===========================================================================

class SymmetricGroupElement(FiniteGroupElement):
    """Permutation of {0..n-1} as a length-n tuple (fingroups.py:208-249)."""

    __slots__ = ()

    degree = None

    def __init__(self, value=None, check=True):
        n = self.degree
        if value is None:
            value = tuple(range(n))
        else:
            value = tuple(value)
            if check and sorted(value) != list(range(n)):
                raise ValueError(
                    f'valid length-{n} permutation required')
        self.value = value

    @classmethod
    def operation(cls, p, q, /):
        """Composition: first apply p, then q."""
        return cls(tuple(map(q.value.__getitem__, p.value)), check=False)

    @classmethod
    def inversion(cls, p, /):
        pairs = sorted(zip(p.value, range(len(p.value))))
        return cls(tuple(i for _, i in pairs), check=False)

    @classmethod
    def equality(cls, p, q, /):
        return p.value == q.value


@functools.cache
def SymmetricGroup(n):
    """Create type for the symmetric group of degree n, n>=0."""
    Sym = _group_type(f'Sym({n})', SymmetricGroupElement,
                      degree=n,
                      order=math.factorial(n),
                      is_abelian=n <= 2,
                      is_cyclic=n <= 2)
    Sym.identity = Sym()
    return Sym


# ===========================================================================
# quadratic residues modulo a safe prime
# ===========================================================================

# Safe primes for the standard IKE bit lengths: the RFC 2409 (768/1024) and
# RFC 3526 (1536..8192) MODP group moduli p = 2^l - 2^(l-64) - 1 + 2^64 *
# (floor(2^(l-130) pi) + k).  Embedded as public constants instead of
# recomputing pi at runtime (reference derivation: fingroups.py:334-372).
_IKE_SAFE_PRIME_HEX = {
    768:
        'FFFFFFFFFFFFFFFFC90FDAA22168C234C4C6628B80DC1CD129024E088A67CC74020BBEA6'
        '3B139B22514A08798E3404DDEF9519B3CD3A431B302B0A6DF25F14374FE1356D6D51C245'
        'E485B576625E7EC6F44C42E9A63A3620FFFFFFFFFFFFFFFF',
    1024:
        'FFFFFFFFFFFFFFFFC90FDAA22168C234C4C6628B80DC1CD129024E088A67CC74020BBEA6'
        '3B139B22514A08798E3404DDEF9519B3CD3A431B302B0A6DF25F14374FE1356D6D51C245'
        'E485B576625E7EC6F44C42E9A637ED6B0BFF5CB6F406B7EDEE386BFB5A899FA5AE9F2411'
        '7C4B1FE649286651ECE65381FFFFFFFFFFFFFFFF',
    1536:
        'FFFFFFFFFFFFFFFFC90FDAA22168C234C4C6628B80DC1CD129024E088A67CC74020BBEA6'
        '3B139B22514A08798E3404DDEF9519B3CD3A431B302B0A6DF25F14374FE1356D6D51C245'
        'E485B576625E7EC6F44C42E9A637ED6B0BFF5CB6F406B7EDEE386BFB5A899FA5AE9F2411'
        '7C4B1FE649286651ECE45B3DC2007CB8A163BF0598DA48361C55D39A69163FA8FD24CF5F'
        '83655D23DCA3AD961C62F356208552BB9ED529077096966D670C354E4ABC9804F1746C08'
        'CA237327FFFFFFFFFFFFFFFF',
    2048:
        'FFFFFFFFFFFFFFFFC90FDAA22168C234C4C6628B80DC1CD129024E088A67CC74020BBEA6'
        '3B139B22514A08798E3404DDEF9519B3CD3A431B302B0A6DF25F14374FE1356D6D51C245'
        'E485B576625E7EC6F44C42E9A637ED6B0BFF5CB6F406B7EDEE386BFB5A899FA5AE9F2411'
        '7C4B1FE649286651ECE45B3DC2007CB8A163BF0598DA48361C55D39A69163FA8FD24CF5F'
        '83655D23DCA3AD961C62F356208552BB9ED529077096966D670C354E4ABC9804F1746C08'
        'CA18217C32905E462E36CE3BE39E772C180E86039B2783A2EC07A28FB5C55DF06F4C52C9'
        'DE2BCBF6955817183995497CEA956AE515D2261898FA051015728E5A8AACAA68FFFFFFFF'
        'FFFFFFFF',
    3072:
        'FFFFFFFFFFFFFFFFC90FDAA22168C234C4C6628B80DC1CD129024E088A67CC74020BBEA6'
        '3B139B22514A08798E3404DDEF9519B3CD3A431B302B0A6DF25F14374FE1356D6D51C245'
        'E485B576625E7EC6F44C42E9A637ED6B0BFF5CB6F406B7EDEE386BFB5A899FA5AE9F2411'
        '7C4B1FE649286651ECE45B3DC2007CB8A163BF0598DA48361C55D39A69163FA8FD24CF5F'
        '83655D23DCA3AD961C62F356208552BB9ED529077096966D670C354E4ABC9804F1746C08'
        'CA18217C32905E462E36CE3BE39E772C180E86039B2783A2EC07A28FB5C55DF06F4C52C9'
        'DE2BCBF6955817183995497CEA956AE515D2261898FA051015728E5A8AAAC42DAD33170D'
        '04507A33A85521ABDF1CBA64ECFB850458DBEF0A8AEA71575D060C7DB3970F85A6E1E4C7'
        'ABF5AE8CDB0933D71E8C94E04A25619DCEE3D2261AD2EE6BF12FFA06D98A0864D8760273'
        '3EC86A64521F2B18177B200CBBE117577A615D6C770988C0BAD946E208E24FA074E5AB31'
        '43DB5BFCE0FD108E4B82D120A93AD2CAFFFFFFFFFFFFFFFF',
    4096:
        'FFFFFFFFFFFFFFFFC90FDAA22168C234C4C6628B80DC1CD129024E088A67CC74020BBEA6'
        '3B139B22514A08798E3404DDEF9519B3CD3A431B302B0A6DF25F14374FE1356D6D51C245'
        'E485B576625E7EC6F44C42E9A637ED6B0BFF5CB6F406B7EDEE386BFB5A899FA5AE9F2411'
        '7C4B1FE649286651ECE45B3DC2007CB8A163BF0598DA48361C55D39A69163FA8FD24CF5F'
        '83655D23DCA3AD961C62F356208552BB9ED529077096966D670C354E4ABC9804F1746C08'
        'CA18217C32905E462E36CE3BE39E772C180E86039B2783A2EC07A28FB5C55DF06F4C52C9'
        'DE2BCBF6955817183995497CEA956AE515D2261898FA051015728E5A8AAAC42DAD33170D'
        '04507A33A85521ABDF1CBA64ECFB850458DBEF0A8AEA71575D060C7DB3970F85A6E1E4C7'
        'ABF5AE8CDB0933D71E8C94E04A25619DCEE3D2261AD2EE6BF12FFA06D98A0864D8760273'
        '3EC86A64521F2B18177B200CBBE117577A615D6C770988C0BAD946E208E24FA074E5AB31'
        '43DB5BFCE0FD108E4B82D120A92108011A723C12A787E6D788719A10BDBA5B2699C32718'
        '6AF4E23C1A946834B6150BDA2583E9CA2AD44CE8DBBBC2DB04DE8EF92E8EFC141FBECAA6'
        '287C59474E6BC05D99B2964FA090C3A2233BA186515BE7ED1F612970CEE2D7AFB81BDD76'
        '2170481CD0069127D5B05AA993B4EA988D8FDDC186FFB7DC90A6C08F4DF435C934063199'
        'FFFFFFFFFFFFFFFF',
    6144:
        'FFFFFFFFFFFFFFFFC90FDAA22168C234C4C6628B80DC1CD129024E088A67CC74020BBEA6'
        '3B139B22514A08798E3404DDEF9519B3CD3A431B302B0A6DF25F14374FE1356D6D51C245'
        'E485B576625E7EC6F44C42E9A637ED6B0BFF5CB6F406B7EDEE386BFB5A899FA5AE9F2411'
        '7C4B1FE649286651ECE45B3DC2007CB8A163BF0598DA48361C55D39A69163FA8FD24CF5F'
        '83655D23DCA3AD961C62F356208552BB9ED529077096966D670C354E4ABC9804F1746C08'
        'CA18217C32905E462E36CE3BE39E772C180E86039B2783A2EC07A28FB5C55DF06F4C52C9'
        'DE2BCBF6955817183995497CEA956AE515D2261898FA051015728E5A8AAAC42DAD33170D'
        '04507A33A85521ABDF1CBA64ECFB850458DBEF0A8AEA71575D060C7DB3970F85A6E1E4C7'
        'ABF5AE8CDB0933D71E8C94E04A25619DCEE3D2261AD2EE6BF12FFA06D98A0864D8760273'
        '3EC86A64521F2B18177B200CBBE117577A615D6C770988C0BAD946E208E24FA074E5AB31'
        '43DB5BFCE0FD108E4B82D120A92108011A723C12A787E6D788719A10BDBA5B2699C32718'
        '6AF4E23C1A946834B6150BDA2583E9CA2AD44CE8DBBBC2DB04DE8EF92E8EFC141FBECAA6'
        '287C59474E6BC05D99B2964FA090C3A2233BA186515BE7ED1F612970CEE2D7AFB81BDD76'
        '2170481CD0069127D5B05AA993B4EA988D8FDDC186FFB7DC90A6C08F4DF435C934028492'
        '36C3FAB4D27C7026C1D4DCB2602646DEC9751E763DBA37BDF8FF9406AD9E530EE5DB382F'
        '413001AEB06A53ED9027D831179727B0865A8918DA3EDBEBCF9B14ED44CE6CBACED4BB1B'
        'DB7F1447E6CC254B332051512BD7AF426FB8F401378CD2BF5983CA01C64B92ECF032EA15'
        'D1721D03F482D7CE6E74FEF6D55E702F46980C82B5A84031900B1C9E59E7C97FBEC7E8F3'
        '23A97A7E36CC88BE0F1D45B7FF585AC54BD407B22B4154AACC8F6D7EBF48E1D814CC5ED2'
        '0F8037E0A79715EEF29BE32806A1D58BB7C5DA76F550AA3D8A1FBFF0EB19CCB1A313D55C'
        'DA56C9EC2EF29632387FE8D76E3C0468043E8F663F4860EE12BF2D5B0B7474D6E694F91E'
        '6DCC4024FFFFFFFFFFFFFFFF',
    8192:
        'FFFFFFFFFFFFFFFFC90FDAA22168C234C4C6628B80DC1CD129024E088A67CC74020BBEA6'
        '3B139B22514A08798E3404DDEF9519B3CD3A431B302B0A6DF25F14374FE1356D6D51C245'
        'E485B576625E7EC6F44C42E9A637ED6B0BFF5CB6F406B7EDEE386BFB5A899FA5AE9F2411'
        '7C4B1FE649286651ECE45B3DC2007CB8A163BF0598DA48361C55D39A69163FA8FD24CF5F'
        '83655D23DCA3AD961C62F356208552BB9ED529077096966D670C354E4ABC9804F1746C08'
        'CA18217C32905E462E36CE3BE39E772C180E86039B2783A2EC07A28FB5C55DF06F4C52C9'
        'DE2BCBF6955817183995497CEA956AE515D2261898FA051015728E5A8AAAC42DAD33170D'
        '04507A33A85521ABDF1CBA64ECFB850458DBEF0A8AEA71575D060C7DB3970F85A6E1E4C7'
        'ABF5AE8CDB0933D71E8C94E04A25619DCEE3D2261AD2EE6BF12FFA06D98A0864D8760273'
        '3EC86A64521F2B18177B200CBBE117577A615D6C770988C0BAD946E208E24FA074E5AB31'
        '43DB5BFCE0FD108E4B82D120A92108011A723C12A787E6D788719A10BDBA5B2699C32718'
        '6AF4E23C1A946834B6150BDA2583E9CA2AD44CE8DBBBC2DB04DE8EF92E8EFC141FBECAA6'
        '287C59474E6BC05D99B2964FA090C3A2233BA186515BE7ED1F612970CEE2D7AFB81BDD76'
        '2170481CD0069127D5B05AA993B4EA988D8FDDC186FFB7DC90A6C08F4DF435C934028492'
        '36C3FAB4D27C7026C1D4DCB2602646DEC9751E763DBA37BDF8FF9406AD9E530EE5DB382F'
        '413001AEB06A53ED9027D831179727B0865A8918DA3EDBEBCF9B14ED44CE6CBACED4BB1B'
        'DB7F1447E6CC254B332051512BD7AF426FB8F401378CD2BF5983CA01C64B92ECF032EA15'
        'D1721D03F482D7CE6E74FEF6D55E702F46980C82B5A84031900B1C9E59E7C97FBEC7E8F3'
        '23A97A7E36CC88BE0F1D45B7FF585AC54BD407B22B4154AACC8F6D7EBF48E1D814CC5ED2'
        '0F8037E0A79715EEF29BE32806A1D58BB7C5DA76F550AA3D8A1FBFF0EB19CCB1A313D55C'
        'DA56C9EC2EF29632387FE8D76E3C0468043E8F663F4860EE12BF2D5B0B7474D6E694F91E'
        '6DBE115974A3926F12FEE5E438777CB6A932DF8CD8BEC4D073B931BA3BC832B68D9DD300'
        '741FA7BF8AFC47ED2576F6936BA424663AAB639C5AE4F5683423B4742BF1C978238F16CB'
        'E39D652DE3FDB8BEFC848AD922222E04A4037C0713EB57A81A23F0C73473FC646CEA306B'
        '4BCBC8862F8385DDFA9D4B7FA2C087E879683303ED5BDD3A062B3CF5B3A278A66D2A13F8'
        '3F44F82DDF310EE074AB6A364597E899A0255DC164F31CC50846851DF9AB48195DED7EA1'
        'B1D510BD7EE74D73FAF36BC31ECFA268359046F4EB879F924009438B481C6CD7889A002E'
        'D5EE382BC9190DA6FC026E479558E4475677E9AA9E3050E2765694DFC81F56E880B96E71'
        '60C980DD98EDD3DFFFFFFFFFFFFFFFFF',
}


def _find_safe_prime(l):
    """Safe (Blum) prime p of bit length l: (p-1)/2 also prime (l>2).

    For the standard IKE lengths the published RFC 2409/3526 moduli are
    returned; otherwise the largest Sophie Germain prime below 2^(l-1)
    is searched downward (reference: fingroups.py:334-372).
    """
    if l in _IKE_SAFE_PRIME_HEX:
        return int(_IKE_SAFE_PRIME_HEX[l], 16)

    if l == 2:
        return 3

    q = prev_prime(1 << l-1)
    while not is_prime(2*q + 1):
        q = prev_prime(q)
    return int(2*q + 1)


class _FieldUnitGroupElement(FiniteGroupElement):
    """Shared base for groups living inside GF(p)* (QR, Schnorr)."""

    __slots__ = ()

    is_multiplicative = True
    is_abelian = True
    is_cyclic = True
    field = None

    @classmethod
    def _to_field(cls, value):
        if isinstance(value, cls.field):
            return value
        if isinstance(value, int):
            return cls.field(value)
        raise TypeError('int or prime field element required')

    @classmethod
    def operation(cls, a, b, /):
        return cls(a.value * b.value, check=False)

    @classmethod
    def inversion(cls, a, /):
        return cls(1 / a.value, check=False)

    @classmethod
    def equality(cls, a, b, /):
        return a.value == b.value

    @classmethod
    def repeat(cls, a, n):
        return cls(a.value ** n, check=False)

    def __int__(self):
        return int(self.value)


class QuadraticResidue(_FieldUnitGroupElement):
    """Quadratic residue mod an odd prime, held as a GF(p)* element."""

    __slots__ = ()

    gap = None

    def __init__(self, value=1, check=True):
        if check:
            value = self._to_field(value)
            if value == 0 or not value.is_sqr():
                raise ValueError('quadratic residue required')
        self.value = value

    @classmethod
    def encode(cls, m):
        """Encode message m as a residue, with a residue Z blinding the slot."""
        gap = cls.gap
        p = cls.field.modulus
        for i in range(1, gap):
            if legendre(i, p) == 1:
                a = m * gap + i
                if legendre(a, p) == 1:
                    return cls(cls.field(a), check=False), cls(cls.field(i), check=False)

        raise ValueError('message encoding failed, try larger gap')

    @classmethod
    def decode(cls, M, Z):
        """Decode message from encoded pair (M, Z)."""
        return int((M.value - Z.value) / cls.gap)


def QuadraticResidues(p=None, l=None):
    """Create type for the group of quadratic residues modulo odd prime p.

    Given only a bit length l>2, a safe prime p is selected so the group
    order (p-1)/2 is prime as well.
    """
    if p is None:
        p = _find_safe_prime(l) if l is not None else 3
    if p % 2 == 0:
        raise ValueError('odd prime modulus required')

    return _QuadraticResidues(p)


@functools.cache
def _QuadraticResidues(p):
    # for a safe prime p, the least residue generates the whole group
    g = next(i for i in range(2, p) if legendre(i, p) == 1)
    QR = _group_type(f'QR{p.bit_length()}({p})', QuadraticResidue,
                     field=GF(p),
                     gap=128,
                     order=p >> 1)
    QR.identity = QR()
    QR.generator = QR(g)
    return QR


# ===========================================================================
# Schnorr groups
# ===========================================================================

class SchnorrGroupElement(_FieldUnitGroupElement):
    """Element of the order-q subgroup of GF(p)*, q prime."""

    __slots__ = ()

    def __init__(self, value=1, check=True):
        if check:
            value = self._to_field(value)
            if value ** self.order != 1:
                raise ValueError('subgroup elt required')
        self.value = value

    @classmethod
    def encode(cls, m):
        """Encode message m as g^m (discrete-log encoding)."""
        g = cls.generator
        return cls(g.value ** m, check=False), g

    @classmethod
    def decode(cls, M, Z):
        """Decode m from M=g^m by bounded discrete-log search."""
        walk = cls.identity
        for m in range(1024):
            if walk == M:
                return m
            walk = cls.operation(cls.generator, walk)
        return 1023


# (subgroup bits, field bits) pairings per NIST-style strength levels
_SCHNORR_N_L = ((160, 1024), (192, 1536), (224, 2048), (256, 3072), (384, 7680))


def SchnorrGroup(p=None, q=None, g=None, l=None, n=None):
    """Create type for a Schnorr group of odd prime order q.

    Without q, the largest n-bit prime is used; without p, the least prime
    p = 2wq+1 of roughly l bits is found (reference: fingroups.py:475-525).
    """
    if p is None:
        if q is None:
            if n is None:
                if l is None:
                    l = 2048
                n = next((n_ for n_, l_ in _SCHNORR_N_L if l_ >= l), 512)
            q = prev_prime(1 << n)
        else:
            if n is None:
                n = q.bit_length()
            assert q % 2 and is_prime(q)
        if l is None:
            l = next((l_ for n_, l_ in _SCHNORR_N_L if n_ >= n), 15360)

        w = (1 << l-2) // q + 1  # so p = 2wq+1 exceeds 2^(l-1)
        p = 2*w*q + 1
        while not is_prime(p):
            p += 2*q
    else:
        assert q is not None
        assert (p - 1) % q == 0
        assert q % 2 and is_prime(q)
        assert is_prime(p)
        if l is None:
            l = p.bit_length()
        if n is None:
            n = q.bit_length()
    assert l == p.bit_length()
    assert n == q.bit_length()

    p, q = int(p), int(q)
    if g is None:
        # project successive small bases into the order-q subgroup until a
        # nontrivial element (hence a generator, q prime) appears
        cofactor = (p - 1) // q
        for base in range(2, p):
            g = int(powmod(base, cofactor, p))
            if g != 1:
                break
    return _SchnorrGroup(p, q, g)


@functools.cache
def _SchnorrGroup(p, q, g):
    field = GF(p)
    SG = _group_type(f'SG{p.bit_length()}:{q.bit_length()}({p}:{q})',
                     SchnorrGroupElement,
                     field=field,
                     order=q)
    SG.identity = SG()
    SG.generator = SG(g)
    return SG


# ===========================================================================
# elliptic curves
# ===========================================================================

class EllipticCurvePoint(FiniteGroupElement):
    """Common base class for elliptic curve points (coordinate tuples)."""

    __slots__ = ()

    is_additive = True
    is_multiplicative = False
    is_abelian = True
    oblivious = None  # True iff the formulas are exception-free (MPC-safe)
    field = None
    _identity = None
    gap = None

    def __getitem__(self, key):
        return self.value[key]

    # coordinate accessors (x, y, z name positions 0..2)
    x = property(lambda self: self.value[0])
    y = property(lambda self: self.value[1])
    z = property(lambda self: self.value[2])

    @classmethod
    def ysquared(cls, x):
        """Value of y^2 as a function of x for affine points (x, y)."""
        raise NotImplementedError

    def normalize(self):
        """Convert to the unique affine representative."""
        raise NotImplementedError

    @classmethod
    def _lift_x(cls, x):
        """Curve point with the given x-coordinate, or None."""
        y2 = cls.ysquared(x)
        if legendre(int(y2), cls.field.modulus) != 1:
            return None
        return cls((x, y2.sqrt()), check=False)

    @classmethod
    def encode(cls, m):
        """Encode message m in the x-coordinate of a curve point.

        Slot i below gap is scanned until both the blinding point (x=i)
        and the message point (x = m*gap + i) lift to the curve.
        """
        field = cls.field
        for i in range(cls.gap):
            Z = cls._lift_x(field(i))
            if Z is not None:
                M = cls._lift_x(field(m * cls.gap + i))
                if M is not None:
                    return M, Z
        raise ValueError('message encoding failed, try larger gap')

    @classmethod
    def decode(cls, M, Z):
        """Decode message from encoded pair (M, Z)."""
        return int((M.normalize()[0] - Z.normalize()[0]) / cls.gap)

    @classmethod
    def equality(cls, pt1, pt2, /):
        raise NotImplementedError

    @classmethod
    def _proj_eq(cls, pt1, pt2):
        """Cross-ratio equality of projective (x : y : z) representatives."""
        x1, y1, z1 = pt1[0], pt1[1], pt1[2]
        x2, y2, z2 = pt2[0], pt2[1], pt2[2]
        return x1 * z2 == x2 * z1 and y1 * z2 == y2 * z1


def _coerce_point(cls, value, target_len):
    """Normalize constructor input: map ints to field elts, extend affine.

    Values that are neither ints nor field elements (e.g. secret-shared
    numbers from mpyc_tpu.secgroups, which run these same curve formulas
    obliviously) pass through untouched.
    """
    field = cls.field
    value = [field(c) if isinstance(c, (int, str, list, tuple)) else c
             for c in value]
    if 2 == len(value) < target_len:
        value.append(field(1))                    # z = 1
        if len(value) < target_len:
            value.append(value[0] * value[1])     # t = x * y
    return value


class EdwardsCurvePoint(EllipticCurvePoint):
    """Common base for (twisted) Edwards curves a*x^2 + y^2 = 1 + d*x^2*y^2."""

    __slots__ = ()

    a = None
    d = None

    @classmethod
    def ysquared(cls, x):
        x2 = x**2
        return (1 - cls.a * x2) / (1 - cls.d * x2)

    def __init__(self, value=None, check=True):
        field = self.field
        if value is None:
            value = [field(c) for c in self._identity]
        else:
            value = _coerce_point(type(self), value, len(self._identity))
        if check:
            self._validate(value)
        self.value = tuple(value)

    @classmethod
    def _validate(cls, value):
        scale = value[2] if len(value) > 2 else cls.field(1)
        ax, ay = value[0] / scale, value[1] / scale
        if len(value) > 3 and value[3] / scale != ax * ay:
            raise ValueError('incorrect extended coordinate')
        if ay ** 2 != cls.ysquared(ax):
            raise ValueError('point not on curve')


class EdwardsAffine(EdwardsCurvePoint):
    """Edwards curve with affine coordinates (x, y)."""

    __slots__ = ()

    _identity = 0, 1
    oblivious = True

    @classmethod
    def inversion(cls, pt, /):
        return cls((-pt[0], pt[1]), check=False)

    @classmethod
    def operation(cls, pt1, pt2, /):
        # unified mmadd formulas (z1 = z2 = 1), exception-free:
        # hyperelliptic.org/EFD/g1p/data/edwards/projective/addition/mmadd-2007-bl
        x1, y1 = pt1
        x2, y2 = pt2
        xx = x1 * x2
        yy = y1 * y2
        dxy = cls.d * xx * yy
        cross = (x1 + y1) * (x2 + y2) - xx - yy
        scale = 1 / (1 - dxy ** 2)
        return cls(((1 - dxy) * cross * scale,
                    (1 + dxy) * (yy - cls.a * xx) * scale), check=False)

    def normalize(self):
        return self

    @classmethod
    def equality(cls, pt1, pt2, /):
        return pt1.value == pt2.value


class EdwardsProjective(EdwardsCurvePoint):
    """Edwards curve with homogeneous projective coordinates (x : y : z)."""

    __slots__ = ()

    _identity = 0, 1, 1
    oblivious = True

    @classmethod
    def inversion(cls, pt, /):
        return cls((-pt[0], pt[1], pt[2]), check=False)

    @classmethod
    def operation(cls, pt1, pt2, /):
        # unified add-2008-bbjlp formulas, exception-free:
        # hyperelliptic.org/EFD/g1p/data/twisted/projective/addition/add-2008-bbjlp
        x1, y1, z1 = pt1
        x2, y2, z2 = pt2
        zz = z1 * z2
        zz2 = zz ** 2
        xx = x1 * x2
        yy = y1 * y2
        dxy = zz2 - cls.d * xx * yy
        dxy2 = zz2 + cls.d * xx * yy
        cross = (x1 + y1) * (x2 + y2) - xx - yy
        return cls((zz * dxy * cross,
                    zz * dxy2 * (yy - cls.a * xx),
                    dxy * dxy2), check=False)

    def normalize(self):
        cls = type(self)
        x, y, z = self
        w = 1 / z
        return cls((x * w, y * w, cls.field(1)), check=False)

    equality = classmethod(
        lambda cls, pt1, pt2, /: cls._proj_eq(pt1, pt2))


class EdwardsExtended(EdwardsCurvePoint):
    """Twisted (a=-1) Edwards curve with extended coordinates (x:y:z:t)."""

    __slots__ = ()

    _identity = 0, 1, 1, 0
    oblivious = True

    @classmethod
    def inversion(cls, pt, /):
        return cls((-pt[0], pt[1], pt[2], -pt[3]), check=False)

    @classmethod
    def operation(cls, pt1, pt2, /):
        # Hisil-Wong-Carter-Dawson unified addition (eprint 2008/522, §4.2)
        x1, y1, z1, t1 = pt1
        x2, y2, z2, t2 = pt2
        lo = (y1 - x1) * (y2 - x2)
        hi = (y1 + x1) * (y2 + x2)
        tt = 2 * cls.d * t1 * t2
        zz = 2 * z1 * z2
        fx, gz, hz, ky = hi - lo, zz - tt, zz + tt, hi + lo
        return cls((fx * gz, hz * ky, gz * hz, fx * ky), check=False)

    @classmethod
    def operation2(cls, pt, /):
        x, y, z, t = pt
        lo, hi = (y - x) ** 2, (y + x) ** 2
        tt, zz = 2 * cls.d * t ** 2, 2 * z ** 2
        fx, gz, hz, ky = hi - lo, zz - tt, zz + tt, hi + lo
        return cls((fx * gz, hz * ky, gz * hz, fx * ky), check=False)

    def normalize(self):
        cls = type(self)
        x, y, z, _ = self
        w = 1 / z
        x, y = x * w, y * w
        return cls((x, y, cls.field(1), x * y), check=False)

    equality = classmethod(
        lambda cls, pt1, pt2, /: cls._proj_eq(pt1, pt2))


class WeierstrassCurvePoint(EllipticCurvePoint):
    """Common base for short Weierstrass curves y^2 = x^3 + a*x + b."""

    __slots__ = ()

    a = None
    b = None

    @classmethod
    def ysquared(cls, x):
        return x**3 + cls.a * x + cls.b

    def __init__(self, value=None, check=True):
        if value is None or len(value) == 0:
            value = [self.field(c) for c in self._identity]
        else:
            value = _coerce_point(type(self), value, len(self._identity))
            if check:
                self._validate(value)
        self.value = tuple(value)

    @classmethod
    def _validate(cls, value):
        if len(value) > 2:
            z = value[2]
            if z == 0:
                return                     # point at infinity
            dx, dy = (2, 3) if issubclass(cls, WeierstrassJacobian) \
                else (1, 1)
            ax, ay = value[0] / z ** dx, value[1] / z ** dy
        else:
            ax, ay = value[0], value[1]
        if ay ** 2 != cls.ysquared(ax):
            raise ValueError('point not on curve')


class WeierstrassAffine(WeierstrassCurvePoint):
    """Short Weierstrass curve with affine coordinates; identity = ()."""

    __slots__ = ()

    _identity = ()
    oblivious = False  # case distinctions on identity/doubling

    def _is_identity(self):
        return not self.value

    @classmethod
    def inversion(cls, pt, /):
        if pt._is_identity():
            return pt
        return cls((pt[0], -pt[1]), check=False)

    @classmethod
    def operation(cls, pt1, pt2, /):
        if pt1._is_identity():
            return pt2
        if pt2._is_identity():
            return pt1
        if pt1 == pt2:
            return cls.operation2(pt1)
        x1, y1 = pt1
        x2, y2 = pt2
        if x1 == x2:
            return cls.identity            # opposite points
        slope = (y1 - y2) / (x1 - x2)
        x3 = slope ** 2 - x1 - x2
        return cls((x3, slope * (x1 - x3) - y1), check=False)

    @classmethod
    def operation2(cls, pt, /):
        if pt._is_identity() or pt[1] == 0:
            return cls.identity
        x, y = pt
        slope = (3 * x ** 2 + cls.a) / (2 * y)
        x2 = slope ** 2 - 2 * x
        return cls((x2, slope * (x - x2) - y), check=False)

    def normalize(self):
        return self

    @classmethod
    def equality(cls, pt1, pt2, /):
        return pt1.value == pt2.value


class WeierstrassProjective(WeierstrassCurvePoint):
    """Short Weierstrass curve (a=0) with projective coordinates."""

    __slots__ = ()

    _identity = 0, 1, 0
    oblivious = True

    @classmethod
    def inversion(cls, pt, /):
        return cls((pt[0], -pt[1], pt[2]), check=False)

    @classmethod
    def operation(cls, pt1, pt2, /):
        # complete formulas for a=0: Renes-Costello-Batina
        # (eprint 2015/1060, Algorithm 7)
        assert cls.a == 0
        x1, y1, z1 = pt1
        x2, y2, z2 = pt2
        b3 = 3*cls.b
        m0, m1, m2 = x1 * x2, y1 * y2, z1 * z2
        s0 = (x1 + y1) * (x2 + y2) - m0 - m1
        s1 = (y1 + z1) * (y2 + z2) - m1 - m2
        y3 = b3 * ((x1 + z1) * (x2 + z2) - m0 - m2)
        m0 *= 3
        m2 *= b3
        z3 = m1 + m2
        m1 -= m2
        x3 = s0 * m1 - s1 * y3
        y3 = m0 * y3 + m1 * z3
        z3 = s1 * z3 + m0 * s0
        return cls((x3, y3, z3), check=False)

    @classmethod
    def operation2(cls, pt, /):
        # Renes-Costello-Batina doubling (eprint 2015/1060, Algorithm 9)
        x, y, z = pt
        t = y**2
        w = 8*t
        u = 3*cls.b * z**2
        x2 = u * w
        y2 = t + u
        w *= y * z
        t -= 3*u
        y2 = t * y2 + x2
        x2 = 2*t * x * y
        return cls((x2, y2, w), check=False)

    def normalize(self):
        cls = type(self)
        x, y, z = self
        if z == 0:
            return cls.identity

        w = 1 / z
        return cls((x * w, y * w, cls.field(1)), check=False)

    @classmethod
    def equality(cls, pt1, pt2, /):
        if pt1[2] == 0 == pt2[2]:
            return True
        return cls._proj_eq(pt1, pt2)


class WeierstrassJacobian(WeierstrassCurvePoint):
    """Short Weierstrass curve with Jacobian coordinates (x/z^2, y/z^3)."""

    __slots__ = ()

    _identity = 0, 1, 0
    oblivious = False  # add/double case distinction

    @classmethod
    def inversion(cls, pt, /):
        return cls((pt[0], -pt[1], pt[2]), check=False)

    @classmethod
    def operation(cls, pt1, pt2, /):
        # add-2007-bl: hyperelliptic.org/EFD/g1p/data/shortw/jacobian-0/addition
        if pt1[2] == 0:
            return pt2

        if pt2[2] == 0:
            return pt1

        x1, y1, z1 = pt1
        x2, y2, z2 = pt2
        zsq1, zsq2 = z1 ** 2, z2 ** 2
        ax1, ax2 = x1 * zsq2, x2 * zsq1
        ay1, ay2 = y1 * z2 * zsq2, y2 * z1 * zsq1
        dx = ax2 - ax1
        dy = 2 * (ay2 - ay1)
        if dx == 0 == dy:
            return cls.operation2(pt1)
        dx4 = (2 * dx) ** 2
        cube = dx * dx4
        mix = ax1 * dx4
        x3 = dy ** 2 - cube - 2 * mix
        return cls((x3,
                    dy * (mix - x3) - 2 * ay1 * cube,
                    ((z1 + z2) ** 2 - zsq1 - zsq2) * dx), check=False)

    @classmethod
    def operation2(cls, pt, /):
        # dbl-2009-l: hyperelliptic.org/EFD/g1p/data/shortw/jacobian-0/doubling
        x1, y1, z1 = pt
        xsq = x1 ** 2
        ysq = y1 ** 2
        y4 = ysq ** 2
        mix = 2 * ((x1 + ysq) ** 2 - xsq - y4)
        slope = 3 * xsq
        x2 = slope ** 2 - 2 * mix
        return cls((x2, slope * (mix - x2) - 8 * y4, 2 * y1 * z1),
                   check=False)

    def normalize(self):
        cls = type(self)
        x, y, z = self
        if z == 0:
            return cls.identity

        w = 1 / z
        w2 = w**2
        return cls((x * w2, y * w * w2, cls.field(1)), check=False)

    @classmethod
    def equality(cls, pt1, pt2, /):
        if pt1[2] == 0 == pt2[2]:
            return True
        x1, y1, z1 = pt1
        x2, y2, z2 = pt2
        zsq1, zsq2 = z1 ** 2, z2 ** 2
        return x1 * zsq2 == x2 * zsq1 and \
            y1 * z2 * zsq2 == y2 * z1 * zsq1


_EDWARDS_BASES = {'affine': EdwardsAffine, 'projective': EdwardsProjective,
                  'extended': EdwardsExtended}
_WEIERSTRASS_BASES = {'affine': WeierstrassAffine, 'projective': WeierstrassProjective,
                      'jacobian': WeierstrassJacobian}


def EllipticCurve(curvename='Ed25519', coordinates=None):
    """Create elliptic curve type for one of the built-in curves.

    Curves: 'Ed25519', 'Ed448' (Edwards; affine/projective/extended
    coordinates), 'secp256k1', 'BN256', 'BN256_twist' (Weierstrass;
    affine/projective/jacobian coordinates).  Default 'affine'.
    """
    if coordinates is None:
        coordinates = 'affine'
    return _EllipticCurve(curvename, coordinates)


@functools.cache
def _EllipticCurve(curvename, coordinates):
    if curvename in ('Ed25519', 'Ed448'):
        base = _EDWARDS_BASES.get(coordinates)
        if base is None:
            raise ValueError('invalid coordinates')

        if curvename == 'Ed25519':
            gf = GF(2**255 - 19)
            a, d = gf(-1), gf(-121665) / gf(121666)
            y = gf(4) / gf(5)
            x = ((1 - y**2) / (a - d * y**2)).sqrt()
            if x.value % 2 != 0:
                x = -x  # canonical generator has even x
            order = 2**252 + 27742317777372353535851937790883648493
        else:
            p = 2**448 - 2**224 - 1
            gf = GF(p)
            a, d = gf(1), gf(-39081)
            y = gf(19)
            x = ((1 - y**2) / (a - d * y**2)).sqrt()
            if 2*x.value >= p:
                x = -x  # principal square root
            order = 2**446 - int('8335dc163bb124b65129c96fde933d8d723a70aa'
                                 'dc873d6d54a7bb0d', 16)
        EC = _group_type(f'E({gf.__name__}){curvename}{coordinates}', base,
                         field=gf, a=a, d=d, order=order)
        base_pt = (x, y)
    elif curvename in ('BN256', 'BN256_twist'):
        base = _WEIERSTRASS_BASES.get(coordinates)
        if base is None:
            raise ValueError('invalid coordinates')

        u = 1868033**3
        p = 36*u**4 + 36*u**3 + 24*u**2 + 6*u + 1  # Barreto-Naehrig, p%4 == 3
        if curvename == 'BN256':
            gf = GF(p)
            a, b = gf(0), gf(3)
            base_pt = (gf(1), gf(-2))
        else:
            gf = GF(GFpX(p)('x^2+1'))  # GF(p^2) with i^2 = -1
            a = gf('0')
            b = gf('3') / gf('x+3')  # b / xi, the sextic twist constant
            base_pt = (
                gf([64746500191241794695844075326670126197795977525365406531717464316923369116492,
                    21167961636542580255011770066570541300993051739349375019639421053990175267184]),
                gf([17778617556404439934652658462602675281523610326338642107814333856843981424549,
                    20666913350058776956210519119118544732556678129809273996262322366050359951122]))
        EC = _group_type(f'E({gf.__name__}){curvename}{coordinates}', base,
                         field=gf, a=a, b=b, order=p - 6*u**2)
    elif curvename == 'secp256k1':
        base = _WEIERSTRASS_BASES.get(coordinates)
        if base is None:
            raise ValueError('invalid coordinates')

        p = 2**256 - 2**32 - 977
        gf = GF(p)
        EC = _group_type(f'E({gf.__name__}){curvename}{coordinates}', base,
                         field=gf, a=gf(0), b=gf(7),
                         order=int('FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6'
                                   'AF48A03BBFD25E8CD0364141', 16))
        base_pt = (
            gf(int('79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798', 16)),
            gf(int('483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8', 16)))
    else:
        raise ValueError('curve not supported')

    assert is_prime(EC.order)
    EC.curvename = curvename
    EC.field.is_signed = False
    EC.is_cyclic = True
    EC.gap = 256
    EC.identity = EC(check=False)
    EC.generator = EC(base_pt, check=False)
    return EC


# ===========================================================================
# hyperelliptic curves (Jacobians, Mumford representation)
# ===========================================================================

class HyperellipticCurveDivisor(FiniteGroupElement):
    """Reduced divisor (u, v) on the Jacobian of y^2 = f(x), via Cantor's
    composition/reduction algorithm (Cantor 1987), any genus."""

    __slots__ = ()

    is_additive = True
    is_multiplicative = False
    is_abelian = True
    is_cyclic = True
    genus = None
    field = None
    _identity = 1, 0
    gap = None
    f = None

    def __init__(self, value=None, check=True):
        poly = type(self.f)
        if value is None:
            u, v = map(poly, self._identity)
        else:
            u, v = value
            if not isinstance(u, poly):
                u = poly(u)
            if not isinstance(v, poly):
                v = poly(v)
        if check and (self.f - v**2) % u:
            raise ValueError('value not in Jacobian')

        self.value = (u, v)

    def __getitem__(self, key):
        return self.value[key]

    # Mumford pair accessors
    u = property(lambda self: self.value[0])
    v = property(lambda self: self.value[1])

    @classmethod
    def ysquared(cls, x):
        return cls.field(cls.f(x.value))

    @classmethod
    def _lift_slot(cls, x):
        """Degree-1 divisor with u = X + x, or None if f(-x) is no QR."""
        y2 = cls.ysquared(-x)
        if legendre(int(y2), cls.field.modulus) != 1:
            return None
        return cls(([x.value, 1], [y2.sqrt().value]), check=False)

    @classmethod
    def encode(cls, m):
        """Encode m in a degree-1 divisor: u = X + m', v = y, y^2 = f(-m')."""
        field = cls.field
        for i in range(cls.gap):
            Z = cls._lift_slot(field(i))
            if Z is not None:
                M = cls._lift_slot(field(m * cls.gap + i))
                if M is not None:
                    return M, Z
        raise ValueError('message encoding failed, try larger gap')

    @classmethod
    def decode(cls, M, Z):
        """Decode message from encoded pair (M, Z)."""
        return (M.u[0] - Z.u[0]) // cls.gap

    @classmethod
    def class_number(cls):
        """Order of the Jacobian by enumerating reduced Mumford pairs.

        Counts all (u, v) with u monic, deg u <= genus, deg v < deg u,
        and u | f - v^2.  Only feasible for tiny p and genus <= 3.
        """
        poly = type(cls.f)
        p = poly.p
        f = cls.f
        h = 1  # the identity (1, 0)
        for d in range(1, cls.genus + 1):
            # all monic u of degree d, all v of degree < d
            for ucode in range(p**d):
                u = poly(_digits(ucode, p, d) + [1], check=False)
                for vcode in range(p**d):
                    v = poly(_digits(vcode, p, d), check=False)
                    if not (f - v**2) % u:
                        h += 1
        return h

    @staticmethod
    def _reduce(f, genus, u, v):
        """Cantor reduction: shrink deg u to <= genus; return monic u."""
        while u.degree() > genus:
            u = (f - v**2) // u
            v = (-v) % u
        return u.monic(), v

    @staticmethod
    def _compose(f, genus, D1, D2):
        """Cantor composition (C3a) followed by reduction."""
        poly = type(f)
        u1, v1 = D1
        u2, v2 = D2
        d, _, e2 = poly.gcdext(u1, u2)
        if d == 1:
            u = u1 * u2
            v = (v2 + e2 * u2 * (v1 - v2)) % u
        else:
            d, c, e3 = poly.gcdext(d, v1 + v2)
            e2 *= c
            u = u1 * u2 // d**2
            v = (v2 + (e2 * u2 * (v1 - v2) + e3 * (f - v2**2)) // d) % u
        return HyperellipticCurveDivisor._reduce(f, genus, u, v)

    @staticmethod
    def _compose2(f, genus, D):
        """Cantor doubling (C5a) followed by reduction."""
        poly = type(f)
        u, v = D
        d, _, e3 = poly.gcdext(u, 2*v)
        if d == 1:
            u = u**2
            v = (v + e3 * (f - v**2)) % u
        else:
            u = (u // d)**2
            v = (v + e3 * ((f - v**2) // d)) % u
        return HyperellipticCurveDivisor._reduce(f, genus, u, v)

    @classmethod
    def operation(cls, D1, D2, /):
        return cls(cls._compose(cls.f, cls.genus, D1, D2), check=False)

    @classmethod
    def operation2(cls, D, /):
        return cls(cls._compose2(cls.f, cls.genus, D), check=False)

    @classmethod
    def inversion(cls, D, /):
        return cls((D.u, -D.v), check=False)  # deg v < deg u, so (-v) % u == -v

    @classmethod
    def equality(cls, D1, D2, /):
        return D1.value == D2.value


def _digits(n, base, width):
    """Little-endian base-`base` digits of n, padded to `width`."""
    ds = []
    for _ in range(width):
        n, r = divmod(n, base)
        ds.append(r)
    return ds


class HCDivisorCL(HyperellipticCurveDivisor):
    """Genus-2 divisors in Costello--Lauter extended coordinates.

    Weight-2 divisors (u, v) with u = x^2 + u1*x + u0 of full degree are
    stored as 6-tuples (u1, u0, v1, v0, u1^2, u1*u0) of field elements;
    the identity is the all-zero tuple.  Generic additions/doublings run
    the straight-line formulas from Costello & Lauter, "Group Law
    Computations on Jacobians of Hyperelliptic Curves" (Table 1); the
    rare non-generic cases fall back to Cantor.  The straight-line path
    is what mpyc_tpu.secgroups executes obliviously on shares.
    """

    __slots__ = ()

    genus = 2
    _identity = (0,) * 6

    def __init__(self, value=None, check=True):
        field = self.field
        if value is None:
            value = [field(c) for c in self._identity]
        else:
            value = [c if isinstance(c, field) else field(c) for c in value]
            if len(value) == 4:
                u1, u0, v1, v0 = value
                value = [u1, u0, v1, v0, u1**2, u1 * u0]
        if check:
            if value[0]**2 != value[4] or value[0] * value[1] != value[5]:
                raise ValueError('incorrect extended coordinates')

            poly = type(self.f)
            u = poly([value[1].value, value[0].value, 1])
            v = poly([value[3].value, value[2].value])
            if (self.f - v**2) % u:
                raise ValueError('value not in Jacobian')

        self.value = tuple(value)

    @property
    def u(self):
        poly = type(self.f)
        if all(c == 0 for c in self.value):
            return poly(1)

        return poly([self.value[1].value, self.value[0].value, 1])

    @property
    def v(self):
        poly = type(self.f)
        if all(c == 0 for c in self.value):
            return poly(0)

        return poly([self.value[3].value, self.value[2].value])

    def __repr__(self):
        return str((self.u, self.v))

    @classmethod
    def encode(cls, m):
        """Encode m in the double point divisor u = (x + m')^2, v = y."""
        field = cls.field
        gap = cls.gap
        p = field.modulus
        for i in range(gap):
            x0 = field(i)
            y2_0 = cls.ysquared(-x0)
            if legendre(int(y2_0), p) == 1:
                xm = field(m * gap + i)
                y2_m = cls.ysquared(-xm)
                if legendre(int(y2_m), p) == 1:
                    M = cls((2*xm, xm**2, field(0), y2_m.sqrt()), check=False)
                    Z = cls((2*x0, x0**2, field(0), y2_0.sqrt()), check=False)
                    return M, Z

        raise ValueError('message encoding failed, try larger gap')

    @classmethod
    def decode(cls, M, Z):
        return (M.u[1] - Z.u[1]) // (2*cls.gap)

    @classmethod
    def operation(cls, D1, D2, /):
        if all(c == 0 for c in D1.value):
            return D2

        if all(c == 0 for c in D2.value):
            return D1

        try:
            uv = cls._cl_add(tuple(D1.value), tuple(D2.value))
        except ZeroDivisionError:
            uv = cls._cantor_fallback(cls._compose, (D1, D2))
        return cls(uv, check=False)

    @classmethod
    def operation2(cls, D, /):
        if all(c == 0 for c in D.value):
            return D

        F = cls.field
        try:
            uv = cls._cl_dbl(tuple(D.value), F(cls.f[2]), F(cls.f[3]))
        except ZeroDivisionError:
            uv = cls._cantor_fallback(cls._compose2, (D,))
        return cls(uv, check=False)

    @classmethod
    def _cl_add(cls, c1, c2):
        """Generic-case CL addition on raw 6-tuples (works verbatim on
        secret-shared coordinates — used by mpyc_tpu.secgroups)."""
        a1, a0, b1, b0, a1a1, a1a0 = c1
        e1, e0, d1, d0, e1e1, e1e0 = c2
        # matrix entries M_i and rhs z_i (CL Table 1, ADD)
        m1 = a0 - e0
        m2 = e1e0 - a1a0
        m3 = a1 - e1
        m4 = e1e1 - a1a1 + m1
        z1 = d0 - b0
        z2 = d1 - b1
        return cls._cl_tail(m1, m2, m3, m4, z1, z2,
                            a1, a0, b1, b0, a1a1, a1a0, a1 + e1, d1, e1e1)

    @classmethod
    def _cl_dbl(cls, c, f2, f3):
        """Generic-case CL doubling on a raw 6-tuple (f4 = 0 assumed)."""
        a1, a0, b1, b0, a1a1, a1a0 = c
        b1b1 = b1**2
        cross = (a1 + b1)**2 - a1a1 - b1b1  # 2*a1*b1
        m1 = 2*b0 + cross
        m2 = -2*b1 * (a0 + 2*a1a1)
        m3 = 2*b1
        m4 = 2*(b0 - cross)
        z1 = f2 + 2*a1a0 + 2*a1a1 * a1 - b1b1
        z2 = f3 - 2*a0 + 3*a1a1
        return cls._cl_tail(m1, m2, m3, m4, z1, z2,
                            a1, a0, b1, b0, a1a1, a1a0, 2*a1, b1, a1a1)

    @classmethod
    def inversion(cls, D, /):
        if all(c == 0 for c in D.value):
            return D

        a1, a0, b1, b0, a1a1, a1a0 = D
        return cls((a1, a0, -b1, -b0, a1a1, a1a0), check=False)

    @classmethod
    def _cl_tail(cls, m1, m2, m3, m4, z1, z2, u1, u0, v1, v0, u1s, u1u0,
                 su1, w1, u1ds):
        """Shared tail of CL addition/doubling: solve the 2x2 system via the
        four products, compose, and reduce.  One inversion, straight-line."""
        t1 = (m2 - z1) * (m4 + z2)
        t2 = (m2 + z1) * (m4 - z2)
        t3 = (m1 + z1) * (m3 - z2)
        t4 = (m1 - z1) * (m3 + z2)
        l2 = t2 - t1
        l3 = t4 - t3
        d = t1 + t2 - t3 - t4 + 2*(m1 - m2) * (m3 + m4)
        A = 1/(d * l3)
        B = d * A
        C = d * B
        D = l2 * B
        E = l3**2 * A
        Cs = C**2
        r1 = 2*D - Cs - su1
        r0 = D**2 + C * (v1 + w1) - ((r1 - Cs) * su1 + u1s + u1ds)/2
        rr1 = r1**2
        rr0 = r1 * r0
        s1 = D * (u1 - r1) + rr1 - r0 - u1s + u0
        s0 = D * (u0 - r0) + rr0 - u1u0
        s1 = -(E * s1 + v1)
        s0 = -(E * s0 + v0)
        return r1, r0, s1, s0, rr1, rr0

    @classmethod
    def _cantor_fallback(cls, compose, divisors):
        """Run Cantor on the polynomial form; re-extend the result."""
        poly = type(cls.f)
        args = []
        for D in divisors:
            a1, a0, b1, b0 = (c.value for c in D.value[:4])
            args.append((poly([a0, a1, 1]), poly([b0, b1])))
        u, v = compose(cls.f, cls.genus, *args) if len(args) == 2 else \
            compose(cls.f, cls.genus, args[0])
        if (u, v) == (1, 0):
            return (0,) * 6

        F = cls.field
        return F(u[1]), F(u[0]), F(v[1]), F(v[0])


def HyperellipticCurve(curvename=None, coordinates=None, p=None, l=None, genus=None):
    """Create type for a hyperelliptic curve Jacobian.

    curvename='kummer1271': the Gaudry-Schost genus-2 curve over
    GF(2^127-1) with Costello--Lauter 'extended' coordinates.

    curvename='DGS' (default): a random curve of the given genus (default
    3) over GF(p) (or an l-bit Blum prime), generated with the method of
    Dobson-Galbraith-Smith (eprint 2020/196, Algorithm 4), deterministic
    randomness seeded with p so all parties derive the same curve.
    """
    curvename = curvename or 'DGS'
    if curvename == 'kummer1271':
        p, genus, coordinates = 2 ** 127 - 1, 2, 'extended'
    elif curvename == 'DGS':
        genus = 3 if genus is None else genus
        p = find_prime_root(l)[0] if p is None else p
    else:
        raise ValueError('curve not supported')
    return _HyperellipticCurve(p, genus, curvename,
                               coordinates or 'affine')


# Gaudry & Schost genus-2 curve over GF(2^127-1): y^2 = f(x), f with five
# linear factors; the cyclic subgroup <(u, v)> has prime order n with
# Jacobian order 16n.
_KUMMER1271_F = [81689052950067229064357938692912969725,
                 9855732443590990513334918966847277222,
                 154735094972565041023366918099598639851,
                 76637216448498510246042731975843417626,
                 64408548613810695909971240431892164827,
                 1]
_KUMMER1271_N = 1809251394333065553571917326471206521441306174399683558571672623546356726339
_KUMMER1271_U = ('x^2+53887750494529953094583234541973147544x+'
                 '152781149156717595995762065350002864540')
_KUMMER1271_V = ('117497929065723271999297121045670554255x+'
                 '93722789515836547535106638431311448542')


@functools.cache
def _HyperellipticCurve(p, genus, curvename, coordinates):
    gf = GF(p)
    poly = GFpX(p)
    if curvename == 'DGS':
        rnd = random.Random(p)  # deterministic: every party derives the same curve
        u = poly([rnd.randrange(p) for _ in range(genus)] + [1])
        v = poly([rnd.randrange(p) for _ in range(genus)])
        while True:
            w = poly([rnd.randrange(p) for _ in range(genus + 1)] + [1])
            f = v**2 + u * w  # monic, degree 2*genus + 1, and u | f - v^2
            if poly.gcd(f, f.deriv()) == 1 and poly.is_irreducible(f):
                break
        n = None
    else:  # 'kummer1271'
        f = poly(_KUMMER1271_F)
        n = _KUMMER1271_N
        u = poly(_KUMMER1271_U)
        v = poly(_KUMMER1271_V)

    if genus == 2 and coordinates == 'extended':
        base = HCDivisorCL
        # shift x -> x - f4/5 to zero the x^4 coefficient (CL assumes f4=0)
        t = gf(f[4]) / 5
        f = _poly_shift(poly, gf, f, t)
        u1 = gf(u[1]) - 2*t
        u0 = gf(u[0]) - gf(u[1])*t + t**2
        v1 = gf(v[1])
        v0 = gf(v[0]) - v1*t
        base_pt = (u1, u0, v1, v0, u1**2, u1 * u0)
    else:
        base = HyperellipticCurveDivisor
        base_pt = (u, v)

    HC = _group_type(f'HC({gf.__name__}){curvename}', base,
                     field=gf, genus=genus, curvename=curvename, f=f, gap=256)
    HC.field.is_signed = False
    HC.identity = HC(check=False)
    HC.generator = HC(base_pt, check=False)
    if n is None and genus * p.bit_length() <= 3:
        n = HC.class_number()
    HC.order = n
    assert HC.order is None or HC.generator^HC.order == HC.identity
    return HC


def _poly_shift(poly, gf, f, t):
    """Return f(x - t) as a polynomial (Horner over shifted variable)."""
    xt = poly([(-t).value, 1])  # x - t
    g = poly(0)
    for c in reversed(list(f)):
        g = g * xt + c
    return g


# ===========================================================================
# class groups of imaginary quadratic fields
# ===========================================================================

class ClassGroupForm(FiniteGroupElement):
    """Reduced primitive positive definite form (a, b, c), D = b^2-4ac < 0.

    Composition via NUCOMP and squaring via NUDUPL (Cohen, "A Course in
    Computational Algebraic Number Theory", Algorithms 5.4.8/5.4.9), with
    partial Euclidean reduction to keep intermediate operands half-size.
    """

    __slots__ = ()

    is_multiplicative = True
    is_abelian = True
    discriminant = None
    bit_length = None
    gap = None
    order = None

    def __init__(self, value=None, check=True):
        if value is None:
            k = self.discriminant % 2
            value = (1, k, (k**2 - self.discriminant) // 4)  # principal form
            check = False
        elif isinstance(value, list):
            value = tuple(value)
        if len(value) == 2:
            a, b = value
            value = (a, b, (b**2 - self.discriminant) // (4*a))
            check = True
        if check:
            a, b, c = value
            if a <= 0:
                raise ValueError('positive definite form required')
            if b * b - 4 * a * c != self.discriminant:
                raise ValueError('wrong discriminant')
            value = ClassGroupForm._reduce(value)
        self.value = value

    def __getitem__(self, key):
        return self.value[key]

    @staticmethod
    def _reduce(form):
        """Normalize then reduce (Cohen, Algorithm 5.4.2)."""
        a, b, c = form
        r = (a - b) // (2*a)
        b, c = b + 2*r*a, a*r**2 + b*r + c
        while not (-a < b <= a <= c and (a != c or b >= 0)):
            s = (c + b) // (2*c)
            a, b, c = c, -b + 2*s*c, c*s**2 - b*s + a
        return a, b, c

    @classmethod
    def _partial_euclid(cls, d, v3):
        """Partial extended Euclid until |v3| <= (-D/4)^(1/4)."""
        L = iroot(-cls.discriminant // 4, 4)[0]
        v2, v = 1, 0
        z = 0
        while abs(v3) > L:
            d, (q, v3) = v3, divmod(d, v3)
            v, v2 = v2, v - q * v2
            z += 1
        if z % 2:
            v2, v3 = -v2, -v3
        return d, v, v2, v3, z

    @classmethod
    def operation(cls, f1, f2, /):
        """NUCOMP composition of forms f1 and f2 (Cohen 5.4.9)."""
        if f1[0] < f2[0]:
            f1, f2 = f2, f1
        a1, b1, c1 = f1.value if hasattr(f1, 'value') else f1
        a2, b2, c2 = f2.value if hasattr(f2, 'value') else f2
        s = (b1 + b2) >> 1
        n = b2 - s

        g, u, v = gcdext(a2, a1)            # u*a2 + v*a1 = g
        if g == 1 or s % g == 0:
            h = int(g)
            mu = -u * n
            if g != 1:
                a1, a2, s = a1 // g, a2 // g, s // g
        else:
            h, u1, _ = gcdext(s, g)
            if h > 1:
                a1, a2, s, g = a1 // h, a2 // h, s // h, g // h
            crt = (-u1 * (u * (c1 % g) + v * (c2 % g))) % g
            mu = -u * (n // g) + crt * (a1 // g)
        mu %= a1
        if 2 * mu > a1:
            mu -= a1

        d, v, v2, v3, z = cls._partial_euclid(a1, mu)
        if z == 0:
            t1 = a2 * v3
            q = (t1 + n) // d
            w = (v3 * s + c2) // d
            a3 = d * a2
            b3 = 2 * t1 + b2
            c3 = v3 * q + w * h
        else:
            k = (a2 * d + n * v) // a1
            t1 = k * v3
            t2 = t1 + n
            q = t2 // d
            r = (s * d + c2 * v) // a1
            t3 = r * v2
            t4 = t3 - s
            w = t4 // v
            a3 = d * k + h * r * v
            b3 = t1 + t2 + h * (t3 + t4)
            c3 = v3 * q + h * w * v2
        return cls(cls._reduce((int(a3), int(b3), int(c3))), check=False)

    @classmethod
    def operation2(cls, f, /):
        """NUDUPL squaring of form f (Cohen 5.4.8)."""
        a, b, c = f
        h, u, _ = gcdext(b, a)
        assert h == 1  # -discriminant is prime
        mu = (-c * u) % a
        if 2 * mu > a:
            mu -= a

        d, v, v2, v3, z = cls._partial_euclid(a, mu)
        if z == 0:
            w = (b * v3 + c) // d
            a2 = d ** 2
            b2 = b + 2 * d * v3
            c2 = v3 ** 2 + w * h
        else:
            r = (c * v + b * d) // a
            t = r * v2
            w = (t - b) // v
            a2 = d ** 2 + h * r * v
            b2 = h * (t + v * w) + 2 * d * v3
            c2 = v3 ** 2 + h * w * v2
        return cls(cls._reduce((int(a2), int(b2), int(c2))), check=False)

    @classmethod
    def inversion(cls, f, /):
        return cls(cls._reduce((f[0], -f[1], f[2])), check=False)

    @classmethod
    def equality(cls, f1, f2, /):
        return f1.value == f2.value

    @classmethod
    def _form_with_a(cls, a):
        """Reduced-domain form with leading coefficient a, or None."""
        D = cls.discriminant
        b = int(powmod(D, (a + 1) // 4, a))
        if (b * b - D) % a:
            return None
        if D % 2 != b % 2:
            b = a - b
        return cls((a, b, (b * b - D) // (4 * a)), check=False)

    @classmethod
    def encode(cls, m):
        """Encode message m in the leading coefficient of a reduced form."""
        gap = cls.gap
        assert gap % 4 == 0
        assert (m + 1) * gap <= isqrt(-cls.discriminant) / 2  # stays reduced
        for i in range(3, gap, 4):
            Z = cls._form_with_a(i)
            if Z is not None:
                M = cls._form_with_a(m * gap + i)
                if M is not None:
                    return M, Z
        raise ValueError('message encoding failed, try larger gap')

    @classmethod
    def decode(cls, M, Z):
        return (M[0] - Z[0]) // cls.gap


def _class_number(D):
    """Class number h(D) for fundamental discriminant D < 0 by direct count
    of reduced forms (Cohen, Algorithm 5.3.5): for each odd b, count the
    divisors a of (b^2-D)/4 with b <= a <= c (ambiguous forms once)."""
    count = 1
    for b in range(1, 1 + isqrt(-D // 3), 2):
        ac = (b * b - D) >> 2
        for a in range(max(b, 2), isqrt(ac) + 1):
            if ac % a == 0:
                count += 1 if a == b or a * a == ac else 2
    return count


def _calculate_gap(l):
    """Fixed point of gap = round(3.5 * l * ln(gap)), rounded down mod 4."""
    gap = l
    while gap != (gap := round(3.5 * l * math.log(gap))):
        pass
    return gap - gap % 4


def ClassGroup(Delta=None, l=None):
    """Create type for the class group of discriminant Delta < 0.

    Delta must satisfy Delta = 1 (mod 4) with -Delta prime (hence Delta is
    fundamental).  Given only a bit length l, the least such Delta with
    Delta = 1 (mod 8) is selected (or -3, -11 for tiny l).
    """
    if l is not None:
        if Delta is None:
            p = next_prime(1 << l-1)
            while p != 3 and p != 11 and p % 8 != 7:
                p = next_prime(p)
            Delta = int(-p)
    elif Delta is None:
        Delta = -3
    if Delta % 4 != 1:
        raise ValueError('discriminant required to be 1 modulo 4, preferably 1 modulo 8')

    if Delta >= 0 or not is_prime(-Delta):
        raise ValueError('negative prime discriminant required')

    return _ClassGroup(Delta)


@functools.cache
def _ClassGroup(Delta):
    l = Delta.bit_length()
    Cl = _group_type(f'Cl{l}({Delta})', ClassGroupForm,
                     discriminant=Delta,
                     bit_length=l,
                     gap=_calculate_gap(l),
                     order=_class_number(Delta) if l <= 24 else None)
    Cl.identity = Cl()
    if Delta % 8 == 1:
        # Chia VDF competition generator; order around sqrt(-Delta/4)
        g = Cl((2, 1, (1 - Delta) // 8))
    else:
        g = Cl.identity
    Cl.generator = g
    Cl.is_cyclic = True
    return Cl
