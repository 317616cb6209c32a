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
    sectypes.runtime = rt
    asyncoro.runtime = rt
    rt.start()
    yield rt
    rt.shutdown()
    sectypes.runtime = old


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
