"""Tests for vectorized linear algebra ops: np_outer, np_vander, np_det,
np_convolve, np_unit_vector, np_cumsum (reference: runtime.py:2481-2635,
3952-3982, 4947-5029)."""

import numpy as np
import pytest

from mpyc_tpu.runtime import mpc


@pytest.fixture(scope='module', autouse=True)
def _mpc():
    mpc.run(mpc.start())
    yield
    mpc.run(mpc.shutdown())


secint = mpc.SecInt(32)


def out(x):
    return mpc.run(mpc.output(x))


def arr(vals):
    return mpc.np_fromlist([secint(v) for v in vals])


def test_np_outer():
    o = out(mpc.np_outer(arr([2, 3]), arr([5, 7, 11])))
    assert (np.array(o) == np.outer([2, 3], [5, 7, 11])).all()


def test_np_vander():
    x = arr([2, 3, 5])
    for N, inc in ((3, True), (3, False), (4, True), (1, False), (None, False)):
        v = out(mpc.np_vander(x, N=N, increasing=inc))
        ref = np.vander([2, 3, 5], N=N, increasing=inc)
        assert (np.array(v) == ref).all(), (N, inc)


def test_np_convolve():
    c = out(mpc.np_convolve(arr([1, 2, 3]), arr([4, 5])))
    assert list(np.array(c)) == list(np.convolve([1, 2, 3], [4, 5]))


def test_np_det():
    M = [[2, 1, 3], [0, 4, 1], [5, 2, 2]]
    A = arr([v for row in M for v in row]).reshape(3, 3)
    assert out(mpc.np_det(A)) == round(np.linalg.det(np.array(M)))


def test_np_unit_vector():
    for val in (0, 2, 4):
        u = out(mpc.np_unit_vector(secint(val), 5))
        assert list(np.array(u)) == [int(i == val) for i in range(5)]


def test_np_cumsum():
    c = out(mpc.np_cumsum(arr([1, 2, 3, 4])))
    assert list(np.array(c)) == [1, 3, 6, 10]


def test_np_pow_public_base_secret_exponent():
    # reference runtime.py:1331-1424: a^b with public int base and
    # secret nonnegative integral exponent (masked-open protocol)
    b = secint.array(np.array([0, 1, 5, 13], dtype=object))
    assert [int(v) for v in out(mpc.np_pow(2, b))] == [1, 2, 32, 8192]
    assert [int(v) for v in out(mpc.np_pow(3, b))] == [1, 3, 243, 1594323]
    secfxp = mpc.SecFxp(32)
    bf = secfxp.array(np.array([0, 1, 5, 10], dtype=object))
    assert [float(v) for v in out(mpc.np_pow(2, bf))] == \
        [1.0, 2.0, 32.0, 1024.0]


def test_np_pow_float_exponent():
    secfxp = mpc.SecFxp(32)
    a = secfxp.array(np.array([4.0, 9.0], dtype=object))
    r = [float(v) for v in out(mpc.np_pow(a, 0.5))]
    assert all(abs(v - e) < 0.1 for v, e in zip(r, [2.0, 3.0]))
    r = [float(v) for v in out(mpc.np_pow(a, 2.0))]  # integral float -> int
    assert r == [16.0, 81.0]


def test_np_pow_public_int_exponent():
    b = secint.array(np.array([0, 1, 5, 13], dtype=object))
    assert [int(v) for v in out(mpc.np_pow(b, 2))] == [0, 1, 25, 169]
    assert [int(v) for v in out(mpc.np_pow(b, 3))] == [0, 1, 125, 2197]
