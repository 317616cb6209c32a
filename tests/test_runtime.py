"""Runtime op tests: m=1 loopback and m=3 co-located simulator.

Tier-2 of the reference's test strategy (tests/test_runtime.py there runs
the real runtime with m=1); the simulator tier additionally exercises real
threshold t=1 protocol math (resharing, PRSS, masked opens) in-process.
"""
import numpy as np
import pytest

import mpyc_tpu.sectypes as sectypes
import mpyc_tpu.asyncoro as asyncoro
from mpyc_tpu.runtime import Runtime, Party, _Options


def _make_runtime(m, sim):
    opts = _Options()
    if sim and m > 1:
        from mpyc_tpu.parallel.simulator import SimRuntime
        rt = SimRuntime(m, opts)
    else:
        rt = Runtime(0, [Party(0)], opts)
    return rt


@pytest.fixture(params=['m1', 'sim3'])
def mpc(request):
    old = sectypes.runtime
    rt = _make_runtime(1 if request.param == 'm1' else 3,
                       sim=request.param == 'sim3')
    rt._wire_modules()
    rt.start()
    yield rt
    rt.shutdown()
    if old is not None:
        old._wire_modules()


def test_secint_arithmetic(mpc):
    secint = mpc.SecInt(32)
    a = mpc.input(secint(7))[0]
    b = mpc.input(secint(-3))[0]
    assert mpc.run(mpc.output(a + b)) == 4
    assert mpc.run(mpc.output(a - b)) == 10
    assert mpc.run(mpc.output(a * b)) == -21
    assert mpc.run(mpc.output(-a)) == -7
    assert mpc.run(mpc.output(a * 5)) == 35
    assert mpc.run(mpc.output(5 + a)) == 12
    assert mpc.run(mpc.output(a ** 3)) == 343
    assert mpc.run(mpc.output(a ** 0)) == 1
    assert mpc.run(mpc.output(a << 2)) == 28
    assert mpc.run(mpc.output(mpc.sum([a, b, a]))) == 11
    assert mpc.run(mpc.output(mpc.in_prod([a, b], [a, b]))) == 58
    assert mpc.run(mpc.output(mpc.prod([a, b, b]))) == 63


def test_secint_arrays(mpc):
    secint = mpc.SecInt(32)
    A = mpc.input(secint.array(np.array([[1, 2], [3, 4]], dtype=object)))[0]
    B = mpc.input(secint.array(np.array([[5, 6], [7, 8]], dtype=object)))[0]
    assert (mpc.run(mpc.output(A + B)) == np.array([[6, 8], [10, 12]])).all()
    assert (mpc.run(mpc.output(A * B)) == np.array([[5, 12], [21, 32]])).all()
    assert (mpc.run(mpc.output(A @ B)) ==
            np.array([[19, 22], [43, 50]])).all()
    assert (mpc.run(mpc.output(A.T)) == np.array([[1, 3], [2, 4]])).all()
    assert (mpc.run(mpc.output(A.reshape(4))) == np.array([1, 2, 3, 4])).all()
    assert mpc.run(mpc.output(A.sum())) == 10
    assert (mpc.run(mpc.output(A.sum(axis=0))) == np.array([4, 6])).all()
    assert (mpc.run(mpc.output(A * 3)) == np.array([[3, 6], [9, 12]])).all()
    # fromlist / tolist round trip
    xs = [mpc.input(secint(i))[0] for i in (5, 6, 7)]
    arr = mpc.np_fromlist(xs)
    assert (mpc.run(mpc.output(arr)) == np.array([5, 6, 7])).all()
    back = mpc.np_tolist(arr)
    assert [mpc.run(mpc.output(x)) for x in back] == [5, 6, 7]


def test_random_bits(mpc):
    secint = mpc.SecInt(32)
    bits = mpc.run(mpc.output(mpc.np_random_bits(secint, 24)))
    assert all(int(v) in (0, 1) for v in bits)
    lst = mpc.random_bits(secint, 5)
    vals = [mpc.run(mpc.output(b)) for b in lst]
    assert all(v in (0, 1) for v in vals)


def test_secfxp(mpc):
    secfxp = mpc.SecFxp(32)
    x = mpc.input(secfxp(2.5))[0]
    y = mpc.input(secfxp(1.25))[0]
    assert mpc.run(mpc.output(x + y)) == 3.75
    assert mpc.run(mpc.output(x * y)) == 3.125  # y has few frac bits: exact
    assert mpc.run(mpc.output(x * 3)) == 7.5
    assert mpc.run(mpc.output(x - y)) == 1.25
    # probabilistic trunc: within 2^-f of true value
    u = mpc.input(secfxp(2.7))[0]
    v = mpc.input(secfxp(1.3))[0]
    got = mpc.run(mpc.output(u * v))
    assert abs(got - 2.7 * 1.3) < 2 ** -10


def test_trunc_and_shift(mpc):
    secint = mpc.SecInt(32)
    z = mpc.input(secint(1000))[0]
    got = mpc.run(mpc.output(z >> 3))
    assert got in (125, 126)  # probabilistic rounding
    assert mpc.run(mpc.output(z << 1)) == 2000


def test_is_zero_public(mpc):
    secint = mpc.SecInt(32)
    a = mpc.input(secint(7))[0]
    assert mpc.is_zero_public(a - a)
    assert not mpc.is_zero_public(a)
    assert mpc.eq_public(a, a)


def test_if_else_swap(mpc):
    secint = mpc.SecInt(32)
    one = mpc.input(secint(1))[0]
    zero = mpc.input(secint(0))[0]
    x = mpc.input(secint(11))[0]
    y = mpc.input(secint(22))[0]
    assert mpc.run(mpc.output(mpc.if_else(one, x, y))) == 11
    assert mpc.run(mpc.output(mpc.if_else(zero, x, y))) == 22
    u, v = mpc.if_swap(one, x, y)
    assert mpc.run(mpc.output(u)) == 22 and mpc.run(mpc.output(v)) == 11
    u, v = mpc.if_swap(zero, x, y)
    assert mpc.run(mpc.output(u)) == 11 and mpc.run(mpc.output(v)) == 22


def test_reciprocal(mpc):
    secint = mpc.SecInt(32)
    a = mpc.input(secint(7))[0]
    r = mpc.reciprocal(a)
    assert mpc.run(mpc.output(r * a)) == 1


def test_input_multiple_senders(mpc):
    secint = mpc.SecInt(32)
    xs = mpc.input(secint(5 if mpc.pid == 0 else 5))
    m = len(mpc.parties)
    assert len(xs) == m
    total = mpc.run(mpc.output(mpc.sum(xs)))
    assert total == 5 * m


def test_convert(mpc):
    # field conversion on both planes (reference runtime.py:691-787);
    # simulator twin uses party-stacked PRSS masks with one shared uci
    secint = mpc.SecInt(32)
    secint16 = mpc.SecInt(16)
    secfxp = mpc.SecFxp(32)
    x = mpc.input(secint(-42))[0]
    y = mpc.convert(x, secfxp)
    assert float(mpc.run(mpc.output(y))) == -42.0
    assert int(mpc.run(mpc.output(mpc.convert(y, secint)))) == -42
    assert int(mpc.run(mpc.output(mpc.convert(x, secint16)))) == -42
    secfld = mpc.SecFld(257)
    u = mpc.input(secfld(200))[0]
    assert int(mpc.run(mpc.output(mpc.convert(u, secint)))) == 200


def test_convert_arrays(mpc):
    # secure-ARRAY conversion (np_convert is a TODO in the reference,
    # runtime.py:4428 — here one mask/open round serves the whole batch)
    secint = mpc.SecInt(32)
    secfxp = mpc.SecFxp(32)
    a = np.array([[1, -2], [300, -4000]], dtype=object)
    A = mpc.input(secint.array(a))[0]
    F = mpc.convert(A, secfxp)
    assert isinstance(F, mpc.SecureFixedPointArray)
    assert (np.asarray(mpc.run(mpc.output(F))) == a.astype(float)).all()
    G = mpc.convert(F, secint)
    assert (np.asarray(mpc.run(mpc.output(G))) == a).all()
    X = mpc.input(secfxp.array(np.array([1.5, -2.25])))[0]
    Y = mpc.convert(X, mpc.SecFxp(16))
    assert (np.asarray(mpc.run(mpc.output(Y))) == [1.5, -2.25]).all()
    # list of arrays: one batch, shapes preserved
    Z1, Z2 = mpc.convert([A, mpc.input(secint.array(a[0]))[0]], secfxp)
    assert Z1.shape == (2, 2) and Z2.shape == (2,)
    assert (np.asarray(mpc.run(mpc.output(Z2))) == [1.0, -2.0]).all()
    # finite-field-SOURCE arrays (closed gap: one batched [GMS10] public-
    # modulus reduction serves the whole batch; scalar parity at
    # reference runtime.py:758-787)
    secfld = mpc.SecFld(257)
    fvals = np.array([[0, 1], [100, 256]], dtype=object)
    U = mpc.input(secfld.array(fvals))[0]
    V = mpc.convert(U, secint)
    assert isinstance(V, mpc.SecureIntegerArray)
    assert (np.asarray(mpc.run(mpc.output(V))) == fvals).all()
    # ff scalar through the same batched path
    u = mpc.input(secfld(123))[0]
    assert int(mpc.run(mpc.output(mpc.convert(u, secint)))) == 123


def test_transfer(mpc):
    m = len(mpc.parties)
    objs = mpc.transfer({'pid': mpc.pid, 'v': [1, 2]})
    assert len(objs) == m
    assert all(o['v'] == [1, 2] for o in objs)
    one = mpc.transfer('hello', senders=0)
    assert one == 'hello'


def test_np_matmul_broadcast(mpc):
    # public (k,k) @ secure batched (..., k, 1): party axis must broadcast
    # as leading batch dim (regression: np_aes S-box affine layer on --sim)
    secfld = mpc.SecFld(2**8)
    A = secfld.field.array(np.eye(3, dtype=int).astype(object))
    b = mpc.input(secfld.array(np.arange(12, dtype=object).reshape(4, 3)))[0]
    c = A @ b[..., np.newaxis]
    out = mpc.run(mpc.output(c))
    assert np.asarray(out).reshape(4, 3).tolist() == \
        np.arange(12).reshape(4, 3).tolist()
    # secure vector @ secure matrix (logical 1-D promotion)
    secint = mpc.SecInt(32)
    v = mpc.input(secint.array(np.array([1, 2], dtype=object)))[0]
    M = mpc.input(secint.array(np.array([[3, 4], [5, 6]],
                                        dtype=object)))[0]
    r = mpc.run(mpc.output(v @ M))
    assert [int(t) for t in np.asarray(r).reshape(-1)] == [13, 16]
    r = mpc.run(mpc.output(M @ v))
    assert [int(t) for t in np.asarray(r).reshape(-1)] == [11, 17]
    s = mpc.run(mpc.output(v @ v))
    assert int(s) == 5


def test_gauss_scalar_pivot(mpc):
    secint = mpc.SecInt(32)
    A = [[mpc.input(secint(v))[0] for v in row]
         for row in ((2, 1), (4, 3))]
    d = mpc.input(secint(3))[0]
    b = [mpc.input(secint(v))[0] for v in (1, 2)]
    c = [mpc.input(secint(v))[0] for v in (5, 6)]
    out = mpc.gauss(A, d, b, c)
    exp = [[2 * 3 - 1 * 5, 1 * 3 - 1 * 6], [4 * 3 - 2 * 5, 3 * 3 - 2 * 6]]
    got = [[int(mpc.run(mpc.output(v))) for v in row] for row in out]
    assert got == exp


def test_np_pow_secret_exponent(mpc):
    secint = mpc.SecInt(32)
    b = mpc.input(secint.array(np.array([0, 1, 5], dtype=object)))[0]
    r = mpc.run(mpc.output(mpc.np_pow(2, b)))
    assert [int(v) for v in np.asarray(r).reshape(-1)] == [1, 2, 32]


def test_np_unit_vector_planes(mpc):
    # regression: the masked rotation offset must sum over the logical
    # axis only (the party axis broke fxp unit vectors on --sim)
    secfxp = mpc.SecFxp(24, 12)
    secint = mpc.SecInt(32)
    for val in range(5):
        u = mpc.run(mpc.output(mpc.np_unit_vector(secfxp(val), 5)))
        got = [float(v) for v in np.asarray(u).reshape(-1)]
        assert got == [float(i == val) for i in range(5)], (val, got)
    u = mpc.run(mpc.output(mpc.np_unit_vector(secint(3), 4)))
    assert [int(v) for v in np.asarray(u).reshape(-1)] == [0, 0, 0, 1]
