"""Tests for secure polynomials (reference surface: mpyc/secpols.py)."""

import random

import pytest

from mpyc_tpu.runtime import mpc
from mpyc_tpu.secpols import secpoly
from mpyc_tpu.gfpx import GFpX

P = 101
poly = GFpX(P)


@pytest.fixture(scope='module', autouse=True)
def _mpc():
    mpc.run(mpc.start())
    yield
    mpc.run(mpc.shutdown())


def out(x):
    return mpc.run(mpc.output(x))


def test_ring_ops():
    a, b = poly('3x^3+2x+1'), poly('x+5')
    sa, sb = secpoly(a), secpoly(b)
    assert out(sa + sb) == a + b
    assert out(sa - sb) == a - b
    assert out(sa * sb) == a * b
    assert out(-sa) == -a
    assert out(sa << 2) == a << 2
    assert out(sa >> 1) == a >> 1
    assert out(sa.truncate(2)) == poly('2x+1')


def test_degree_monic_reverse():
    a = poly('3x^3+2x+1')
    sa = secpoly(a)
    assert int(out(sa.degree())) == 3
    assert int(out(secpoly(poly(0)).degree())) == P - 1  # -1 mod p
    assert out(sa.monic()) == a.monic()
    assert out(sa.reverse()) == a.reverse()
    assert out(secpoly(poly(0)).monic()) == poly(0)


def test_divmod():
    rnd = random.Random(5)
    for _ in range(3):
        a = poly([rnd.randrange(P) for _ in range(4)] + [rnd.randrange(1, P)])
        b = poly([rnd.randrange(P) for _ in range(2)] + [rnd.randrange(1, P)])
        q, r = divmod(secpoly(a), secpoly(b))
        qq, rr = divmod(a, b)
        assert out(q) == qq and out(r) == rr
        assert out(secpoly(a) % secpoly(b)) == a % b
        assert out(secpoly(a) // secpoly(b)) == qq


def test_gcd_gcdext_invert():
    f1, f2 = poly('x^2+3x+2'), poly('x^2+4x+3')
    assert out(secpoly.gcd(secpoly(f1), secpoly(f2))) == poly('x+1')
    g, u, v = secpoly.gcdext(secpoly(f1), secpoly(f2))
    g_, u_, v_ = out(g), out(u), out(v)
    assert g_ == poly('x+1') and u_ * f1 + v_ * f2 == g_
    mod = poly('x^2+1')
    iv = out(secpoly.invert(secpoly(poly('x+3')), secpoly(mod)))
    assert (iv * poly('x+3')) % mod == poly(1)


def test_powmod_eval_cmp():
    mod = poly('x^2+1')
    pw = out(secpoly.powmod(secpoly(poly('x+1')), 5, secpoly(mod)))
    assert pw == pow(poly('x+1'), 5, mod)
    a = secpoly(poly('3x^3+2x+1'))
    assert out(a(2)) == poly('3x^3+2x+1')(2)
    assert int(out(a == secpoly(poly('3x^3+2x+1')))) == 1
    assert int(out(a == secpoly(poly('x+5')))) == 0
    assert int(out(secpoly(poly('x')) < secpoly(poly('x^2')))) == 1
    assert int(out(secpoly(poly('x^2')) <= secpoly(poly('x^2')))) == 1


def test_is_irreducible():
    for f in (poly('x^2+1'), poly('x^2+3'), poly('x^2+3x+2'), poly('x+1')):
        assert int(out(secpoly.is_irreducible(secpoly(f)))) == \
            int(poly.is_irreducible(f)), f


def test_io():
    a = poly('7x^2+5')
    x = mpc.input(secpoly(a), senders=0)
    assert out(x) == a
