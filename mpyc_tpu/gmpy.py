"""Host-side number theory helpers (pure Python, no GMP dependency).

Parity target: the helper surface of the reference's bignum layer
(/root/reference/mpyc/gmpy.py): is_prime, next_prime, prev_prime, powmod,
invert, legendre, jacobi, kronecker, iroot, isqrt, factor_prime_power,
ratrec, plus batched powmod helpers.

These functions run at *configuration time* only (prime generation, field
setup, Lagrange coefficients); all hot-path arithmetic lives in the jitted
limb kernels (mpyc_tpu/ops/limb.py), so pure Python is the right tool here —
Python 3.11+ has fast bigint pow/invert built in.
"""

from math import isqrt, gcd  # noqa: F401  (re-exported)
import random


def version():
    """Identify this pure-Python layer (reference gmpy.py:114-116)."""
    return 'mpyc_tpu host number theory (pure Python)'


def mpz(x):
    """Python int(x), standing in for gmpy2's mpz (reference gmpy.py:118)."""
    return int(x)

_SMALL_PRIMES = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53,
                 59, 61, 67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113]

# Deterministic Miller-Rabin bases for n < 3.317e24
_MR_BASES = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37]
_MR_LIMIT = 3317044064679887385961981

_rng = random.Random(0xF1E1D)


def powmod(x, y, m):
    """x**y mod m (y may be negative if x invertible mod m)."""
    return pow(x, y, m)


def powmod_base_list(base_list, exp, m):
    """[b**exp mod m for b in base_list]."""
    return [pow(b, exp, m) for b in base_list]


def powmod_exp_list(base, exp_list, m):
    """[base**e mod m for e in exp_list]."""
    return [pow(base, e, m) for e in exp_list]


def invert(x, m):
    """Multiplicative inverse of x modulo m; raises ZeroDivisionError if none."""
    try:
        return pow(x, -1, m)
    except ValueError:
        raise ZeroDivisionError('invert() no inverse exists') from None


def _miller_rabin(n, a):
    d = n - 1
    r = (d & -d).bit_length() - 1
    d >>= r
    x = pow(a, d, n)
    if x == 1 or x == n - 1:
        return True
    for _ in range(r - 1):
        x = x * x % n
        if x == n - 1:
            return True
    return False


def is_prime(n, _extra_rounds=16):
    """Primality test: deterministic MR below 3.3e24, MR+strong rounds above."""
    n = int(n)
    if n < 2:
        return False
    for p in _SMALL_PRIMES:
        if n % p == 0:
            return n == p
    if n < _MR_LIMIT:
        bases = _MR_BASES
    else:
        bases = _MR_BASES + [_rng.randrange(2, n - 1) for _ in range(_extra_rounds)]
    return all(_miller_rabin(n, a) for a in bases if a % n != 0)


def next_prime(n):
    """Smallest prime > n."""
    n = int(n) + 1
    if n <= 2:
        return 2
    n |= 1
    while not is_prime(n):
        n += 2
    return n


def prev_prime(n):
    """Largest prime < n."""
    n = int(n) - 1
    if n < 2:
        raise ValueError('no prime below 2')
    if n == 2:
        return 2
    if n % 2 == 0:
        n -= 1
    while not is_prime(n):
        n -= 2
    return n


def jacobi(x, n):
    """Jacobi symbol (x/n) for odd n > 0."""
    if n <= 0 or n % 2 == 0:
        raise ValueError('n must be odd and positive')
    x %= n
    result = 1
    while x:
        while x % 2 == 0:
            x //= 2
            if n % 8 in (3, 5):
                result = -result
        x, n = n, x
        if x % 4 == 3 and n % 4 == 3:
            result = -result
        x %= n
    return result if n == 1 else 0


def legendre(x, p):
    """Legendre symbol (x/p) for odd prime p."""
    return jacobi(x, p)


def kronecker(x, n):
    """Kronecker symbol (x/n), extending Jacobi to all integers n."""
    if n == 0:
        return 1 if x in (1, -1) else 0
    result = 1
    if n < 0:
        n = -n
        if x < 0:
            result = -result
    # factor out powers of two from n
    t = 0
    while n % 2 == 0:
        n //= 2
        t += 1
    if t:
        if x % 2 == 0:
            return 0
        if t % 2 and x % 8 in (3, 5):
            result = -result
    return result * jacobi(x, n) if n > 1 else result


def iroot(x, n):
    """Integer n-th root of x: (root, exact?)."""
    if x < 0:
        raise ValueError('x must be >= 0')
    if x == 0:
        return 0, True
    if n == 1:
        return x, True
    if n == 2:
        r = isqrt(x)
        return r, r * r == x
    # Newton on integers
    r = 1 << -(-x.bit_length() // n)
    while True:
        t = ((n - 1) * r + x // r ** (n - 1)) // n
        if t >= r:
            break
        r = t
    return r, r ** n == x


def factor_prime_power(x):
    """Return (p, d) with x == p**d for prime p, else raise ValueError."""
    if x <= 1:
        raise ValueError('number not a prime power')
    for d in range(x.bit_length(), 0, -1):
        r, exact = iroot(x, d)
        if exact and is_prime(r):
            return int(r), d
    raise ValueError('number not a prime power')


def is_square(x):
    """Test whether x is a perfect square."""
    if x < 0:
        return False
    r = isqrt(x)
    return r * r == x


def gcdext(a, b):
    """Extended gcd: (g, s, t) with g == gcd(a, b) == a*s + b*t.

    Cofactors are normalized to GMP's documented contract (mpz_gcdext,
    mirrored by the reference's tests/test_gmpy.py:32-44): g >= 0;
    s == 0 if |a| == |b|, s == sign(a) if b == 0 or |b| == 2g, else
    |s| < |b|/(2g); t symmetric with a and b swapped.
    """
    a0, b0 = a, b
    s0, s1 = 1, 0
    while b:
        q, r = divmod(a, b)
        a, b = b, r
        s0, s1 = s1, s0 - q * s1
    if a < 0:
        a, s0 = -a, -s0
    g = a
    if g == 0:
        return 0, 0, 0
    # normalize s into GMP's minimal range, then derive t exactly
    bg = abs(b0) // g
    if abs(a0) == abs(b0):
        s = 0
    elif b0 == 0 or bg == 2:
        s = (a0 > 0) - (a0 < 0)
    else:
        s = s0 % bg
        if 2 * s > bg:
            s -= bg
    t = (g - a0 * s) // b0 if b0 else 0
    return g, s, t


def ratrec(x, y, N=None, D=None):
    """Rational reconstruction (n, d) of x modulo y (Wang's algorithm).

    n/d == x (mod y) with -N <= n <= N and 0 < d <= D, requires 2*N*D < y.
    Defaults pick N, D around sqrt(y/2).
    """
    if N is None:
        if D is None:
            D = max(1, isqrt((y - 1) // 2))
        N = (y - 1) // (2 * D)
    elif D is None:
        D = (y - 1) // (2 * N) if N else 1
    if N < 0 or D <= 0 or 2 * N * D >= y:
        raise ValueError('rational reconstruction not supported')

    n0, n = x, y
    d0, d = 1, 0
    while n > N:
        n0, (q, n) = n, divmod(n0, n)
        d0, d = d, d0 - q * d
    if d < 0:
        n, d = -n, -d
    if d <= D and gcd(n, d) == 1:
        return n, d

    raise ValueError('rational reconstruction not possible')
