"""Tests for finite fields: scalar elements (host) and arrays (device).

Mirrors the coverage of the reference's tests/test_finfields.py with
self-contained vectors.
"""
import operator
import random

import numpy as np
import pytest

from mpyc_tpu import finfields, gfpx

RNG = random.Random(0xF1E1D5)


def test_find_prime_root():
    assert finfields.find_prime_root(2) == (3, 2, 2)
    assert finfields.find_prime_root(2, blum=False) == (2, 1, 1)
    p, n, w = finfields.find_prime_root(8)
    assert p % 4 == 3 and p.bit_length() == 8 and w == 1 and n == 1
    p, n, w = finfields.find_prime_root(8, n=2)
    assert p % 4 == 3 and w == p - 1 and n == 2
    p, n, w = finfields.find_prime_root(32, n=5)
    assert p % 4 == 3 and n == 5 and pow(w, n, p) == 1 and w != 1
    # the default SecInt64-ish field: prime just below 2^64 with p%4==3
    p, _, _ = finfields.find_prime_root(64)
    assert p.bit_length() == 64 and p % 4 == 3


def test_scalar_prime_field():
    F = finfields.GF(19)
    a, b = F(7), F(15)
    assert int(a + b) == 3
    assert int(a * b) == (7 * 15) % 19 - 19  # 10 -> signed repr -9
    assert (a * b).unsigned_() == 10
    assert int(F(1) / F(2)) == int(F(10))  # 2*10=20=1
    assert int(a ** 18) == 1
    assert int(a ** 0) == 1
    assert (a >> 1) << 1 == a
    assert F(9).sqrt() ** 2 == F(9)
    assert F(4).is_sqr() and F(0).is_sqr()
    nonsq = [x for x in range(1, 19) if not F(x).is_sqr()]
    assert len(nonsq) == 9
    assert F(5) == 5 and F(5) == 24
    assert bool(F(1)) and not bool(F(0))
    with pytest.raises(TypeError):
        F(1.5)


def test_scalar_sqrt_1mod4():
    F = finfields.GF(13)  # 13 % 4 == 1 -> Cipolla path
    for x in range(13):
        if F(x).is_sqr():
            r = F(x).sqrt()
            assert r * r == F(x), x
    with pytest.raises(ZeroDivisionError):
        F(0).sqrt(INV=True)


def test_prime_array_vs_python():
    for p in (19, (1 << 64) - 59, 2**89 - 1):
        if p % 4 == 1:
            continue
        F = finfields.GF((p, 2, p - 1)) if p != 19 else finfields.GF(19)
        xs = [RNG.randrange(p) for _ in range(33)]
        ys = [RNG.randrange(1, p) for _ in range(33)]
        A, B = F.array(xs), F.array(ys)
        assert A.shape == (33,)
        for opname, pyop in (('__add__', lambda x, y: x + y),
                             ('__sub__', lambda x, y: x - y),
                             ('__mul__', lambda x, y: x * y)):
            got = getattr(A, opname)(B).value
            assert all(int(g) == pyop(x, y) % p
                       for g, x, y in zip(got, xs, ys)), (p, opname)
        got = (A / B).value
        assert all(int(g) == x * pow(y, -1, p) % p for g, x, y in zip(got, xs, ys))
        got = (A ** 7).value
        assert all(int(g) == pow(x, 7, p) for g, x in zip(got, xs))
        got = (-A).value
        assert all(int(g) == -x % p for g, x in zip(got, xs))
        got = (A >> 3).value
        assert all(int(g) == x * pow(8, -1, p) % p for g, x in zip(got, xs))
        assert ((A * B / B) == A).all()
        # mixed scalar/int operands
        assert all(int(g) == (x * 5) % p for g, x in zip((A * 5).value, xs))
        assert all(int(g) == (5 - x) % p for g, x in zip((5 - A).value, xs))


def test_prime_array_shapes():
    F = finfields.GF(19)
    A = F.array(np.arange(12, dtype=object).reshape(3, 4))
    assert A.shape == (3, 4) and A.ndim == 2 and A.size == 12
    assert A.T.shape == (4, 3)
    assert A.reshape(4, 3).shape == (4, 3)
    assert A.flatten().shape == (12,)
    assert A[1].shape == (4,)
    assert int(A[2, 3]) % 19 == 11
    A[0] = F.array([18, 18, 18, 18])
    assert all(int(v) == 18 for v in A[0].value)
    s = A.sum()
    assert int(s) % 19 == (sum(range(12)) - 6 + 4 * 18) % 19


def test_prime_array_matmul():
    p = (1 << 64) - 59
    F = finfields.GF((p, 2, p - 1))
    M = [[RNG.randrange(p) for _ in range(3)] for _ in range(2)]
    N = [[RNG.randrange(p) for _ in range(4)] for _ in range(3)]
    got = (F.array(M) @ F.array(N)).value
    for i in range(2):
        for j in range(4):
            expect = sum(M[i][k] * N[k][j] for k in range(3)) % p
            assert int(got[i, j]) == expect
    # large-K scan path
    K = 40
    u = [RNG.randrange(p) for _ in range(K)]
    v = [RNG.randrange(p) for _ in range(K)]
    got = (F.array([u]) @ F.array([[x] for x in v])).value
    assert int(got[0, 0]) == sum(x * y for x, y in zip(u, v)) % p


def test_binary_field_aes():
    P2 = gfpx.GFpX(2)
    F = finfields.GF(P2('x^8+x^4+x^3+x+1'))
    assert F.order == 256 and F.characteristic == 2 and F.ext_deg == 8
    # FIPS-197 example: {57} x {83} = {c1}
    assert int(F(0x57) * F(0x83)) == 0xC1
    A = F.array(list(range(256)))
    prod = (A * F.array([0x57] * 256)).value
    mod = P2('x^8+x^4+x^3+x+1')
    for i in (0, 1, 2, 0x83, 255):
        assert int(prod[i]) == int(P2(i) * P2(0x57) % mod)
    inv = A.reciprocal().value
    assert int(inv[0]) == 0
    for i in (1, 5, 255):
        assert int(P2(i) * P2(int(inv[i])) % mod) == 1
    # sqrt: char 2, everything is a square
    sq = A.sqrt()
    assert ((sq * sq) == A).all()
    assert A.is_sqr().all()


def test_gf2_prime_field():
    F = finfields.GF(2)
    u = F.array([0, 1, 1, 0])
    v = F.array([1, 1, 0, 0])
    assert list((u + v).value) == [1, 0, 1, 0]
    assert list((u * v).value) == [0, 1, 0, 0]
    assert list((u - v).value) == [1, 0, 1, 0]
    assert int(u.sum()) == 0
    m = (F.array([[1, 1], [0, 1]]) @ F.array([[1], [1]])).value
    assert int(m[0, 0]) == 0 and int(m[1, 0]) == 1


def test_extension_field_gf27():
    P3 = gfpx.GFpX(3)
    mod = P3.next_irreducible(3 ** 3)
    F = finfields.GF(mod)
    assert F.order == 27
    xs = [RNG.randrange(27) for _ in range(20)]
    ys = [RNG.randrange(1, 27) for _ in range(20)]
    A, B = F.array(xs), F.array(ys)
    got_mul = (A * B).value
    got_div = (A / B).value
    for i in range(20):
        a, b = P3(xs[i]), P3(ys[i])
        assert int(got_mul[i]) == int(a * b % mod)
        binv = P3.invert(b, mod)
        assert int(got_div[i]) == int(a * binv % mod)
    # scalar
    assert int((F(13) * F(22)).value) == int(P3(13) * P3(22) % mod)
    # sqrt round-trip over all elements
    for x in range(27):
        if F(x).is_sqr():
            r = F(x).sqrt()
            assert r * r == F(x), x


def test_wire_bytes_roundtrip():
    p = (1 << 64) - 59
    F = finfields.GF((p, 2, p - 1))
    xs = [RNG.randrange(p) for _ in range(10)]
    data = F.to_bytes(xs)
    assert len(data) == 10 * F.byte_length
    assert F.from_bytes(data) == xs


def test_pytree_jit():
    import jax
    F = finfields.GF(19)
    A = F.array([1, 2, 3])
    B = F.array([4, 5, 6])

    @jax.jit
    def f(a, b):
        return a * b + a

    out = f(A, B)
    assert [int(v) for v in out.value] == [(x * y + x) % 19
                                           for x, y in zip([1, 2, 3], [4, 5, 6])]


def test_array_views_and_reductions():
    """Views/reductions parity (reference finfields.py:980-1375)."""
    p = 97
    F = finfields.GF(p)
    x = np.arange(1, 17, dtype=object).reshape(4, 4)
    a = F.array(x)
    assert [int(v) for v in a.diagonal().value] == [1, 6, 11, 16]
    assert int(a.trace()) % p == (1 + 6 + 11 + 16) % p
    assert [int(v) for v in a.take([0, 2], axis=1).value[0]] == [1, 3]
    assert a.compress([True, False, True], axis=0).shape == (2, 4)
    assert a.repeat(2, axis=0).shape == (8, 4)
    assert a.ravel().shape == (16,)
    nz = F.array(np.array([0, 5, 0, 7], dtype=object)).nonzero()
    assert list(nz[0]) == [1, 3]
    pr = a.prod(axis=0)
    assert int(pr.value[0]) == (1 * 5 * 9 * 13) % p
    assert int(a[:1, :3].prod()) % p == 6
    assert [int(v) for v in finfields.FiniteFieldArray.diag(a, 1).value] == \
        [2, 7, 12]
    v = F.array(np.array([3, 4], dtype=object))
    m = finfields.FiniteFieldArray.diag(v)
    assert [[int(u) for u in row] for row in m.value] == [[3, 0], [0, 4]]
    flat = list(a[0].flat)
    assert all(isinstance(e, F) for e in flat)
    assert [int(e.value) for e in flat] == [1, 2, 3, 4]


def test_array_gauss_linalg():
    """np.linalg protocol on plain field arrays (reference
    finfields.py:874-978)."""
    p = 97
    F = finfields.GF(p)
    rng = np.random.default_rng(3)  # NB: seed 5 gives det == 0 mod 97
    A = F.array(rng.integers(1, p, (4, 4)).astype(object))
    B = F.array(rng.integers(0, p, (4, 2)).astype(object))
    singular = F.array(np.random.default_rng(5)
                       .integers(1, p, (4, 4)).astype(object))
    assert int(np.linalg.det(singular).value) == 0
    with pytest.raises(ZeroDivisionError):
        np.linalg.inv(singular)
    X = np.linalg.solve(A, B)
    assert ((A @ X) == B).all()
    I = np.linalg.inv(A)
    eye = np.asarray((A @ I).value)
    assert [[int(v) for v in row] for row in eye] == \
        [[int(i == j) for j in range(4)] for i in range(4)]
    d = np.linalg.det(A)
    # determinant consistency: det(A) * det(inv(A)) == 1
    di = np.linalg.det(I)
    assert int((d * di).value) == 1
    P2 = np.linalg.matrix_power(A, 2)
    assert ((A @ A) == P2).all()
    Pm1 = np.linalg.matrix_power(A, -1)
    assert (Pm1 == I).all()
    assert finfields.arrayGF(F) is F.array


def test_array_intarray_signed():
    F = finfields.GF(11)
    F.is_signed = True
    try:
        a = F.array(np.array([1, 10, 6], dtype=object))
        vals = F.array.intarray(a)
        assert list(vals) == [1, -1, -5]
    finally:
        F.is_signed = False


def test_ext_array_matmul_sum():
    F = finfields.GF(gfpx.GFpX(3)('x^3+2x+1'))
    b = F.array(np.array([[2, 5], [8, 4]], dtype=object))
    ib = np.linalg.inv(b)
    prod = np.asarray((b @ ib).value).reshape(-1)
    assert [int(v) for v in prod] == [1, 0, 0, 1]
    s = b.sum(axis=1)
    assert int(np.asarray(s.value).reshape(-1)[0]) == int((F(2) + F(5)).value)


def test_array_pickle_roundtrip():
    # transfer() wires field arrays as pickles (reference runtime.py:478-485)
    import pickle
    F = finfields.GF(97)
    A = F.array(np.array([1, 95, 3], dtype=object))
    B = pickle.loads(pickle.dumps(A))
    assert [int(v) for v in B.value] == [1, 95, 3]
    X = finfields.GF(gfpx.GFpX(2)('x^8+x^4+x^3+x+1'))
    C = pickle.loads(pickle.dumps(X.array(np.array([5, 6], dtype=object))))
    assert [int(v) for v in C.value] == [5, 6]
    E = finfields.GF(gfpx.GFpX(3)('x^2+1'))
    D = pickle.loads(pickle.dumps(E.array(np.array([4, 7], dtype=object))))
    assert [int(v) for v in D.value] == [4, 7]


def test_array_signed_unsigned():
    F = finfields.GF(97)
    A = F.array(np.array([1, 95, 3], dtype=object))
    assert list(A.signed_()) == [1, -2, 3]
    assert list(A.unsigned_()) == [1, 95, 3]


def test_tonelli_shanks_sqrt_p1mod4():
    # device/host twin constant-iteration Tonelli-Shanks (p % 4 == 1),
    # including a large-s prime (Goldilocks, s = 32)
    rng = np.random.default_rng(5)
    for p in [13, 17, 101, 2**64 - 2**32 + 1]:
        F = finfields.GF(p)
        n = 200
        vals = rng.integers(1, min(p, 1 << 62), n).astype(object) % p
        sq = F.array(vals) ** 2
        r = sq.sqrt()
        assert ((r * r)._decode() == sq._decode()).all()
        ri = sq.sqrt(INV=True)
        assert ((ri * ri * sq)._decode() == np.ones(n, dtype=object)).all()
        z = F.array(np.zeros(3, dtype=object))
        assert (z.sqrt()._decode() == 0).all()
        import pytest as _pytest
        with _pytest.raises(ZeroDivisionError):
            z.sqrt(INV=True)
        # host fast path (tiny batch) and device path agree on root choice
        small = F.array(vals[:4] * vals[:4] % p)   # n=4 -> host kernel
        assert (small.sqrt()._decode() == r._decode()[:4]).all()
