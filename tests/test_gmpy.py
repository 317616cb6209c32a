"""Tests for host-side number theory helpers (reference: mpyc/gmpy.py surface)."""
import pytest

from mpyc_tpu import gmpy


def test_is_prime():
    assert [n for n in range(50) if gmpy.is_prime(n)] == \
        [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47]
    assert gmpy.is_prime(2**61 - 1)
    assert not gmpy.is_prime(2**67 - 1)  # 193707721 * 761838257287
    assert gmpy.is_prime(2**255 - 19)
    assert not gmpy.is_prime(3215031751)  # strong pseudoprime to bases 2,3,5,7


def test_next_prev_prime():
    assert gmpy.next_prime(0) == 2
    assert gmpy.next_prime(2) == 3
    assert gmpy.next_prime(10**9) == 1000000007
    assert gmpy.prev_prime(3) == 2
    assert gmpy.prev_prime(10**9) == 999999937
    with pytest.raises(ValueError):
        gmpy.prev_prime(2)


def test_powmod_invert():
    p = 2**61 - 1
    assert gmpy.powmod(3, p - 1, p) == 1
    assert gmpy.invert(12345, p) == pow(12345, -1, p)
    with pytest.raises(ZeroDivisionError):
        gmpy.invert(0, p)
    with pytest.raises(ZeroDivisionError):
        gmpy.invert(6, 9)


def test_symbols():
    p = 1000003
    for a in (1, 2, 3, 5, 999999, 123456):
        ls = gmpy.legendre(a, p)
        assert ls == (1 if pow(a, (p - 1) // 2, p) == 1 else -1)
    assert gmpy.jacobi(1001, 9907) == -1  # known value
    assert gmpy.kronecker(3, 8) == -1
    assert gmpy.kronecker(2, 4) == 0


def test_iroot_isqrt():
    assert gmpy.isqrt(17**2) == 17
    assert gmpy.iroot(27, 3) == (3, True)
    assert gmpy.iroot(28, 3) == (3, False)
    assert gmpy.iroot(2**90, 5) == (2**18, True)
    assert gmpy.is_square(144) and not gmpy.is_square(145)


def test_gcdext():
    g, s, t = gmpy.gcdext(240, 46)
    assert g == 2 and 240 * s + 46 * t == 2
    g, s, t = gmpy.gcdext(17, 0)
    assert g == 17 and s == 1


def test_factor_prime_power():
    assert gmpy.factor_prime_power(2**8) == (2, 8)
    assert gmpy.factor_prime_power(3**5) == (3, 5)
    assert gmpy.factor_prime_power(101) == (101, 1)
    assert gmpy.factor_prime_power(7**3) == (7, 3)
    with pytest.raises(ValueError):
        gmpy.factor_prime_power(12)
    with pytest.raises(ValueError):
        gmpy.factor_prime_power(1)


def test_ratrec():
    # reconstruct 22/7 mod a prime
    p = 2**61 - 1
    x = 22 * pow(7, -1, p) % p
    assert gmpy.ratrec(x, p) == (22, 7)
    n, d = gmpy.ratrec((3 * pow(4, -1, p)) % p, p)
    assert (n, d) == (3, 4)
    with pytest.raises(ValueError):
        gmpy.ratrec(2, 5, N=3, D=3)  # 2*N*D >= y
