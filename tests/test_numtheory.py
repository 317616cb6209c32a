"""Tests for secure integer number theory: find/cs_f, gcd family,
divsteps inverse, divmod, bit length (reference: runtime.py:1883-2022,
secgroups.py:692-760)."""

import math

import pytest

from mpyc_tpu.runtime import mpc


@pytest.fixture(scope='module', autouse=True)
def _mpc():
    mpc.run(mpc.start())
    yield
    mpc.run(mpc.shutdown())


secint = mpc.SecInt(16)


def run(x):
    return mpc.run(mpc.output(x))


def test_find_cs_f():
    x = [secint(0), secint(0), secint(1), secint(0), secint(1)]
    assert run(mpc.find(x, 1)) == 2
    assert run(mpc.find(x, 1, cs_f=lambda b, i: (b+1) << i)) == 4
    nf, pair = mpc.find(x, 1, e=None, cs_f=lambda b, i: (i+b, (b+1) << i))
    assert run(nf) == 0
    assert run(list(pair)) == [2, 4]
    assert run(mpc.find([secint(0)]*3, 1)) == 3
    assert run(mpc.find([secint(0)]*3, 1, e='len(x)-1')) == 2
    assert run(mpc.find([secint(7), secint(5)], secint(5), bits=False)) == 1
    assert run(mpc.find(x, 1, f=lambda i: i*10)) == 20


def test_gcd_lcm():
    for a, b in ((12, 8), (40, 120), (7, 1), (0, 16), (21, 35)):
        assert run(mpc.gcd(secint(a), secint(b), l=8)) == math.gcd(a, b)
    for a, b in ((12, 8), (6, 10), (7, 3)):
        assert run(mpc.lcm(secint(a), secint(b), l=8)) == math.lcm(a, b)


def test_gcdext():
    for a, b in ((24, 60), (17, 5), (12, 9)):
        g, s, t = run(list(mpc.gcdext(secint(a), secint(b), l=8)))
        assert g == math.gcd(a, b)
        assert s*a + t*b == g


def test_inverse():
    for a, b in ((3, 7), (10, 17), (5, 12), (1, 1)):
        u = run(mpc.inverse(secint(a), secint(b), l=8))
        assert (u * a) % b == 1 % b


def test_divmod():
    for a, b in ((123, 11), (-123, 11), (5, 7), (0, 3)):
        q, r = run(list(mpc._divmod(secint(a), secint(b))))
        assert q * b + r == a and 0 <= r < b


def test_bit_length():
    for a in (0, 1, 2, 5, 255, 256):
        k, k2 = run(list(mpc._bit_length(secint(a))))
        assert k == a.bit_length() and k2 == 2**a.bit_length()
