"""Comparison / bit-decomposition layer tests (m=1 and sim m=3).

Mirrors reference coverage of sgn/lt/eq/is_zero/to_bits/from_bits/lsb/mod
(tests/test_runtime.py there, comparison sections).
"""
import numpy as np
import pytest

import mpyc_tpu.sectypes as sectypes
import mpyc_tpu.asyncoro as asyncoro
from mpyc_tpu.runtime import Runtime, Party, _Options


@pytest.fixture(params=['m1', 'sim3'])
def mpc(request):
    old = sectypes.runtime
    opts = _Options()
    if request.param == 'sim3':
        from mpyc_tpu.parallel.simulator import SimRuntime
        rt = SimRuntime(3, opts)
    else:
        rt = Runtime(0, [Party(0)], opts)
    sectypes.runtime = rt
    asyncoro.runtime = rt
    rt.start()
    yield rt
    rt.shutdown()
    sectypes.runtime = old


def test_sgn_lt_eq(mpc):
    secint = mpc.SecInt(16)
    vals = [7, -3, 0]
    xs = {v: mpc.input(secint(v))[0] for v in vals}
    for v in vals:
        assert mpc.run(mpc.output(mpc.sgn(xs[v]))) == (v > 0) - (v < 0)
    assert mpc.run(mpc.output(xs[7] < xs[-3])) == 0
    assert mpc.run(mpc.output(xs[-3] < xs[7])) == 1
    assert mpc.run(mpc.output(xs[7] == xs[7])) == 1
    assert mpc.run(mpc.output(xs[7] != xs[-3])) == 1
    assert mpc.run(mpc.output(abs(xs[-3]))) == 3


def test_array_comparisons(mpc):
    secint = mpc.SecInt(16)
    a_vals = [3, -5, 0, 12, 100, -100]
    b_vals = [4, -5, 1, -2, 100, 100]
    A = mpc.input(secint.array(np.array(a_vals, dtype=object)))[0]
    B = mpc.input(secint.array(np.array(b_vals, dtype=object)))[0]
    lt = mpc.run(mpc.output(A < B))
    eq = mpc.run(mpc.output(A == B))
    for i, (x, y) in enumerate(zip(a_vals, b_vals)):
        assert int(lt[i]) == int(x < y), i
        assert int(eq[i]) == int(x == y), i
    ab = mpc.run(mpc.output(abs(A)))
    assert [int(v) for v in ab] == [abs(v) for v in a_vals]
    sg = mpc.run(mpc.output(mpc.np_sgn(A)))
    assert [int(v) for v in sg] == [(v > 0) - (v < 0) for v in a_vals]


def test_bits_roundtrip(mpc):
    secint = mpc.SecInt(16)
    vals = [3, 0, 255, -5, 1000]
    A = mpc.input(secint.array(np.array(vals, dtype=object)))[0]
    bits = mpc.np_to_bits(A)
    assert bits.shape == (5, 16)
    back = mpc.run(mpc.output(mpc.np_from_bits(bits)))
    for v, g in zip(vals, back):
        # from_bits is unsigned (reference runtime.py:4458 TODO: no sign bit)
        assert int(g) == v % (1 << 16), (v, g)
    # scalar path
    a = mpc.input(secint(13))[0]
    xbits = mpc.to_bits(a)
    assert [mpc.run(mpc.output(x)) for x in xbits[:5]] == [1, 0, 1, 1, 0]
    assert mpc.run(mpc.output(mpc.from_bits(xbits))) == 13


def test_lsb(mpc):
    secint = mpc.SecInt(16)
    vals = [2, 7, 0, -3, -4]
    A = mpc.input(secint.array(np.array(vals, dtype=object)))[0]
    got = mpc.run(mpc.output(mpc.np_lsb(A)))
    assert [int(v) for v in got] == [v & 1 for v in vals]


def test_mod_divmod(mpc):
    secint = mpc.SecInt(16)
    for x in (7, -100):
        a = mpc.input(secint(x))[0]
        for b in (2, 3):
            assert mpc.run(mpc.output(a % b)) == x % b, (x, b)
            assert mpc.run(mpc.output(a // b)) == x // b, (x, b)


def test_all_any_prod(mpc):
    secint = mpc.SecInt(16)
    ones = [mpc.input(secint(1))[0] for _ in range(5)]
    mixed = [mpc.input(secint(v))[0] for v in (1, 0, 1)]
    assert mpc.run(mpc.output(mpc.all(ones))) == 1
    assert mpc.run(mpc.output(mpc.all(mixed))) == 0
    assert mpc.run(mpc.output(mpc.any(mixed))) == 1
    assert mpc.run(mpc.output(mpc.any([mpc.input(secint(0))[0]]))) == 0
    arr = mpc.input(secint.array(np.array([2, 3, 4], dtype=object)))[0]
    assert mpc.run(mpc.output(mpc.np_prod(arr))) == 24


def test_is_zero_variants(mpc):
    # large bit length triggers the probabilistic NO07 path
    secint = mpc.SecInt(96)
    a = mpc.input(secint(0))[0]
    b = mpc.input(secint(12345))[0]
    assert mpc.run(mpc.output(mpc.is_zero(a))) == 1
    assert mpc.run(mpc.output(mpc.is_zero(b))) == 0


def test_fxp_comparisons(mpc):
    secfxp = mpc.SecFxp(24)
    x = mpc.input(secfxp(2.5))[0]
    y = mpc.input(secfxp(-1.25))[0]
    assert mpc.run(mpc.output(x > y)) == 1
    assert mpc.run(mpc.output(x < y)) == 0
    assert mpc.run(mpc.output(x == x)) == 1
    assert mpc.run(mpc.output(abs(y))) == 1.25
