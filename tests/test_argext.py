"""Tests for np_argmin/np_argmax shape semantics (reference
runtime.py:3695-3951), multi-component comparison keys (SecureFraction
pattern from np_lpsolver), np_unit_vector over fixed-point operands
(reference runtime.py:5002-5029), reshape(order='F'), and np_where with
public branches."""

import numpy as np
import pytest

from mpyc_tpu.runtime import mpc


@pytest.fixture(scope='module', autouse=True)
def _mpc():
    mpc.run(mpc.start())
    yield
    mpc.run(mpc.shutdown())


secint = mpc.SecInt(32)
secfxp = mpc.SecFxp(32)


def out(x):
    return np.asarray(mpc.run(mpc.output(x)))


A = np.array([[5, 1, 4, 1], [2, 7, 2, 0], [3, 3, 9, 8]], dtype=object)


def sec(a):
    return secint.array(np.array(a, dtype=object))


@pytest.mark.parametrize('axis', [None, 0, 1])
@pytest.mark.parametrize('keepdims', [False, True])
def test_np_argmin_numbers(axis, keepdims):
    got = out(mpc.np_argmin(sec(A), axis=axis, keepdims=keepdims))
    ref = np.argmin(A.astype(int), axis=axis, keepdims=keepdims)
    assert got.shape == np.shape(ref) and (got == ref).all(), (axis, keepdims)


@pytest.mark.parametrize('axis', [None, 0, 1])
@pytest.mark.parametrize('keepdims', [False, True])
def test_np_argmax_numbers(axis, keepdims):
    got = out(mpc.np_argmax(sec(A), axis=axis, keepdims=keepdims))
    ref = np.argmax(A.astype(int), axis=axis, keepdims=keepdims)
    assert got.shape == np.shape(ref) and (got == ref).all(), (axis, keepdims)


def test_np_argmin_first_occurrence():
    got = int(out(mpc.np_argmin(sec([3, 1, 1, 5, 1]))))
    assert got == 1
    got = int(out(mpc.np_argmax(sec([3, 5, 1, 5, 5]))))
    assert got == 1


def test_argmin_method_unit_vector_and_value():
    u, m = sec(A)[0].argmin()  # defaults arg_unary=True, arg_only=False
    assert out(u).tolist() == [0, 1, 0, 0]
    assert int(out(m)) == 1
    u, m = sec(A).argmin(axis=0)
    assert out(u).tolist() == np.eye(3, dtype=int)[
        np.argmin(A.astype(int), axis=0)].T.tolist()
    assert out(m).reshape(-1).tolist() == [2, 1, 2, 0]


class Frac2:
    size = 2

    def __init__(self, a):
        self.a = a

    def __lt__(self, other):
        return self.a[..., 0] * other.a[..., 1] < \
            self.a[..., 1] * other.a[..., 0]


def test_argmin_fraction_key():
    # fractions 2/3, 5/1, 4/2, 3/1, 1/5, 2/4 -> min 1/5 at index 4
    pairs = [[2, 3], [5, 1], [4, 2], [3, 1], [1, 5], [2, 4]]
    u, v = sec(pairs).argmin(key=Frac2)
    assert out(u).tolist() == [0, 0, 0, 0, 1, 0]
    assert out(v).tolist() == [1, 5]
    k = mpc.np_argmax(sec(pairs), key=Frac2)
    assert int(out(k)) == 1  # max 5/1


def test_argmin_fraction_key_ties_first():
    pairs = [[4, 2], [1, 1], [2, 2], [3, 3]]  # 2, 1, 1, 1 -> index 1
    u, v = sec(pairs).argmin(key=Frac2)
    assert out(u).tolist() == [0, 1, 0, 0]


@pytest.mark.parametrize('stype', [secint, secfxp])
def test_np_unit_vector(stype):
    for v in [0, 1, 4, 7]:
        u = out(mpc.np_unit_vector(stype(v if stype is secint
                                          else float(v)), 8))
        assert u.tolist() == np.eye(8)[v].tolist(), (stype, v)


def test_np_unit_vector_nonintegral_flag():
    a = secfxp.array(np.array([3.0]), integral=False)[0]
    u = out(mpc.np_unit_vector(a, 6))
    assert u.tolist() == np.eye(6)[3].tolist()


def test_reshape_order_f():
    a = sec(A)
    got = out(a.reshape(12, order='F'))
    assert got.tolist() == A.astype(int).reshape(12, order='F').tolist()
    got = out(mpc.np_reshape(a, (4, 3), order='F'))
    assert got.tolist() == A.astype(int).reshape(4, 3, order='F').tolist()


def test_np_where_public_branches():
    c = sec([1, 5, 3]) > 2
    got = out(np.where(c, 10, -1))
    assert got.tolist() == [-1, 10, 10]
    got = out(np.where(c, np.array([1, 2, 3]), np.array([4, 5, 6])))
    assert got.tolist() == [4, 2, 3]


def test_field_array_check_false_setitem():
    Zp = secint.field
    w = Zp.array(np.empty(5), check=False)
    for i in range(5):
        w[i] = i * i + 1
    assert [int(v) for v in w] == [1, 2, 5, 10, 17]
