"""numpy-API parity ops (reference runtime.py:988-1294, 2637-3345):
elementwise aliases, shape manipulation, splits, diagonals, block."""
import numpy as np
import pytest

import mpyc_tpu.sectypes as sectypes
import mpyc_tpu.asyncoro as asyncoro
from mpyc_tpu.runtime import Runtime, Party, _Options


@pytest.fixture(params=['m1', 'sim3'])
def mpc(request):
    old = sectypes.runtime
    if request.param == 'sim3':
        from mpyc_tpu.parallel.simulator import SimRuntime
        rt = SimRuntime(3, _Options())
    else:
        rt = Runtime(0, [Party(0)], _Options())
    sectypes.runtime = rt
    asyncoro.runtime = rt
    rt.start()
    yield rt
    rt.shutdown()
    sectypes.runtime = old


def _arr(mpc, secint, a):
    return mpc.input(secint.array(np.array(a, dtype=object)))[0]


def test_elementwise_aliases(mpc):
    secint = mpc.SecInt(32)
    a = _arr(mpc, secint, [[1, -2], [3, 4]])
    b = _arr(mpc, secint, [[5, 6], [7, -8]])
    assert (mpc.run(mpc.output(mpc.np_add(a, b))) ==
            [[6, 4], [10, -4]]).all()
    assert (mpc.run(mpc.output(mpc.np_subtract(a, b))) ==
            [[-4, -8], [-4, 12]]).all()
    assert (mpc.run(mpc.output(mpc.np_multiply(a, b))) ==
            [[5, -12], [21, -32]]).all()
    assert (mpc.run(mpc.output(mpc.np_pow(a, 3))) ==
            [[1, -8], [27, 64]]).all()
    assert (mpc.run(mpc.output(mpc.np_left_shift(a, 2))) ==
            [[4, -8], [12, 16]]).all()
    assert (mpc.run(mpc.output(mpc.np_left_shift(a, [[1, 2], [0, 3]]))) ==
            [[2, -8], [3, 32]]).all()


def test_minimum_maximum_any(mpc):
    secint = mpc.SecInt(16)
    a = _arr(mpc, secint, [3, -5, 7])
    b = _arr(mpc, secint, [2, 0, 9])
    assert (mpc.run(mpc.output(mpc.np_minimum(a, b))) == [2, -5, 7]).all()
    assert (mpc.run(mpc.output(mpc.np_maximum(a, b))) == [3, 0, 9]).all()
    bits = _arr(mpc, secint, [0, 0, 1])
    assert mpc.run(mpc.output(mpc.np_any(bits))) == 1
    assert mpc.run(mpc.output(mpc.np_any(_arr(mpc, secint, [0, 0, 0])))) == 0


def test_divide_reciprocal(mpc):
    secfxp = mpc.SecFxp(32, 16)
    a = _arr(mpc, secfxp, [1.0, 2.0, 4.0])
    b = _arr(mpc, secfxp, [2.0, 4.0, 2.0])
    out = mpc.run(mpc.output(mpc.np_divide(a, b)))
    assert np.allclose(out, [0.5, 0.5, 2.0], atol=2 ** -10)


def test_add_bits(mpc):
    secint = mpc.SecInt(16)
    x, y = 13, 7
    xa = _arr(mpc, secint, [(x >> j) & 1 for j in range(6)])
    ya = _arr(mpc, secint, [(y >> j) & 1 for j in range(6)])
    s = mpc.run(mpc.output(mpc.np_add_bits(xa, ya)))
    got = sum(int(v) << j for j, v in enumerate(np.asarray(s).reshape(-1)))
    assert got == (x + y) % 64


def test_add_bits_scalar_list(mpc):
    secint = mpc.SecInt(16)
    x, y = 45, 19
    xs = [secint((x >> j) & 1) for j in range(7)]
    ys = [secint((y >> j) & 1) for j in range(7)]
    bits = mpc.add_bits(xs, ys)
    got = sum(int(mpc.run(mpc.output(b))) << j for j, b in enumerate(bits))
    assert got == (x + y) % 128


def test_lshift(mpc):
    secint = mpc.SecInt(32)
    a = mpc.input(secint(5))[0]
    assert mpc.run(mpc.output(mpc.lshift(a, 3))) == 40
    secfxp = mpc.SecFxp(32, 16)
    b = mpc.input(secfxp(1.5))[0]
    assert mpc.run(mpc.output(mpc.lshift(b, 2))) == 6.0


def test_peek(mpc, caplog):
    import logging as _logging
    secint = mpc.SecInt(32)
    a = mpc.input(secint(42))[0]
    with caplog.at_level(_logging.INFO):
        mpc.peek(a, label='answer')
    assert any('42' in r.message and 'answer' in r.message
               for r in caplog.records)


def test_shape_manipulation(mpc):
    secint = mpc.SecInt(32)
    a = _arr(mpc, secint, [[1, 2, 3], [4, 5, 6]])
    assert mpc.np_expand_dims(a, 0).shape == (1, 2, 3)
    assert mpc.np_expand_dims(a, -1).shape == (2, 3, 1)
    assert mpc.np_squeeze(mpc.np_expand_dims(a, 1)).shape == (2, 3)
    v = _arr(mpc, secint, [1, 2])
    w = _arr(mpc, secint, [3, 4])
    assert (mpc.run(mpc.output(mpc.np_append(a, v))) ==
            [1, 2, 3, 4, 5, 6, 1, 2]).all()
    assert (mpc.run(mpc.output(mpc.np_hstack((v, w)))) == [1, 2, 3, 4]).all()
    assert (mpc.run(mpc.output(mpc.np_vstack((v, w)))) ==
            [[1, 2], [3, 4]]).all()
    assert mpc.np_dstack((a, a)).shape == (2, 3, 2)
    assert (mpc.run(mpc.output(mpc.np_column_stack((v, w)))) ==
            [[1, 3], [2, 4]]).all()


def test_split(mpc):
    secint = mpc.SecInt(32)
    a = _arr(mpc, secint, list(range(12)))
    parts = mpc.np_split(a, 3)
    assert len(parts) == 3
    assert (mpc.run(mpc.output(parts[1])) == [4, 5, 6, 7]).all()
    m = mpc.np_reshape(a, (3, 4))
    vs = mpc.np_vsplit(m, 3)
    assert (mpc.run(mpc.output(vs[2])) == [[8, 9, 10, 11]]).all()
    hs = mpc.np_hsplit(m, 2)
    assert (mpc.run(mpc.output(hs[0])) == [[0, 1], [4, 5], [8, 9]]).all()
    with pytest.raises(ValueError):
        mpc.np_split(a, 5)


def test_diag_trace(mpc):
    secint = mpc.SecInt(32)
    x = np.arange(9).reshape(3, 3)
    a = _arr(mpc, secint, x)
    assert (mpc.run(mpc.output(mpc.np_diagonal(a))) == np.diagonal(x)).all()
    assert (mpc.run(mpc.output(mpc.np_diag(a, 1))) == np.diag(x, 1)).all()
    assert (mpc.run(mpc.output(mpc.np_diag(a, -1))) == np.diag(x, -1)).all()
    assert mpc.run(mpc.output(mpc.np_trace(a))) == np.trace(x)
    v = _arr(mpc, secint, [1, 2, 3])
    assert (mpc.run(mpc.output(mpc.np_diagflat(v))) == np.diagflat([1, 2, 3])).all()
    assert (mpc.run(mpc.output(mpc.np_diag(v, 1))) ==
            np.diag([1, 2, 3], 1)).all()


def test_flips_rot90(mpc):
    secint = mpc.SecInt(32)
    x = np.arange(6).reshape(2, 3)
    a = _arr(mpc, secint, x)
    assert (mpc.run(mpc.output(mpc.np_fliplr(a))) == np.fliplr(x)).all()
    assert (mpc.run(mpc.output(mpc.np_flipud(a))) == np.flipud(x)).all()
    for k in range(4):
        assert (mpc.run(mpc.output(mpc.np_rot90(a, k))) ==
                np.rot90(x, k)).all(), k


def test_block(mpc):
    secint = mpc.SecInt(32)
    c = _arr(mpc, secint, [[1, 2], [3, 4]])
    out = mpc.run(mpc.output(mpc.np_block([[c, c], [c, c]])))
    ref = np.block([[np.arange(1, 5).reshape(2, 2)] * 2] * 2)
    assert (out == ref).all()
    v = _arr(mpc, secint, [1, 2])
    out = mpc.run(mpc.output(mpc.np_block([v, v])))
    assert (out == [1, 2, 1, 2]).all()


def test_cumulative_sum_alias(mpc):
    secint = mpc.SecInt(32)
    a = _arr(mpc, secint, [1, 2, 3, 4])
    assert (mpc.run(mpc.output(mpc.np_cumulative_sum(a))) ==
            [1, 3, 6, 10]).all()


def test_numpy_protocol(mpc):
    """np.<fn> on secure operands dispatches into the runtime
    (reference sectypes.py:21-92)."""
    secint = mpc.SecInt(32)
    a = _arr(mpc, secint, np.arange(6).reshape(2, 3))
    c = _arr(mpc, secint, [[1, 2], [3, 4]])
    assert mpc.run(mpc.output(np.less(secint(9), 10))) == 1
    assert mpc.run(mpc.output(np.add(secint(9), np.int32(4)))) == 13
    assert mpc.run(mpc.output(np.subtract(10, secint(4)))) == 6
    assert mpc.run(mpc.output(np.sum(a))) == 15
    assert (mpc.run(mpc.output(np.block([[c, c], [c, c]]))) ==
            np.block([[np.arange(1, 5).reshape(2, 2)] * 2] * 2)).all()
    assert mpc.run(mpc.output(np.negative(secint(5)))) == -5
    assert (mpc.run(mpc.output(np.matmul(c, c))) == [[7, 10], [15, 22]]).all()
    assert (mpc.run(mpc.output(np.diag(c))) == [1, 4]).all()
    out = np.vstack((np.array([9, 9], dtype=object), mpc.np_getitem(c, 0)))
    assert (mpc.run(mpc.output(out)) == [[9, 9], [1, 2]]).all()
