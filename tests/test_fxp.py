"""Fixed-point layer tests: normalization, reciprocal, division."""
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


def test_reciprocal_scalar(mpc):
    secfxp = mpc.SecFxp(32)
    for val in (2.0, 0.25, -1.5):
        x = mpc.input(secfxp(val))[0]
        r = mpc.run(mpc.output(mpc._rec(x)))
        assert abs(r - 1 / val) < 2 ** -12, (val, r)
        assert not isinstance(r, np.ndarray)


def test_division(mpc):
    secfxp = mpc.SecFxp(32)
    a = mpc.input(secfxp(7.5))[0]
    b = mpc.input(secfxp(2.5))[0]
    q = mpc.run(mpc.output(a / b))
    assert abs(q - 3.0) < 2 ** -10
    q2 = mpc.run(mpc.output(3 / b))
    assert abs(q2 - 1.2) < 2 ** -10
    q3 = mpc.run(mpc.output(a / 2))  # public divisor
    assert q3 == 3.75


def test_division_array(mpc):
    secfxp = mpc.SecFxp(32)
    vals = [2.0, 4.0, -0.5, 10.0]
    A = mpc.input(secfxp.array(np.array(vals, dtype=object)))[0]
    r = mpc.run(mpc.output(mpc._rec(A)))
    for v, g in zip(vals, r):
        assert abs(g - 1 / v) < 2 ** -10, (v, g)


def test_fxp_mixed_arith(mpc):
    secfxp = mpc.SecFxp(32)
    x = mpc.input(secfxp(1.5))[0]
    y = mpc.input(secfxp(-2.25))[0]
    assert mpc.run(mpc.output(x * y)) == -3.375
    assert mpc.run(mpc.output(x + 0.5)) == 2.0
    assert mpc.run(mpc.output(x * 4)) == 6.0
    got = mpc.run(mpc.output((x * y) * x))
    assert abs(got - (-3.375 * 1.5)) < 2 ** -12


def test_divmod_exact(mpc):
    """a divmod b must be exact for fxp (field-inverse quotient) and int."""
    secfxp = mpc.SecFxp(32)
    for v, b in ((5.0, 2), (1.0, 2), (7.0, 3), (-3.0, 2), (5.5, 2),
                 (7.25, 3), (-3.5, 2)):
        q, r = divmod(secfxp(v), b)
        qv = mpc.run(mpc.output(q))
        rv = mpc.run(mpc.output(r))
        eq, er = divmod(v, b)
        assert (float(qv), float(rv)) == (eq, er), (v, b, qv, rv)
    secint = mpc.SecInt(32)
    for v, b in ((5, 2), (4, 2), (7, 3), (-3, 2)):
        q, r = divmod(secint(v), b)
        qv = int(mpc.run(mpc.output(q)))
        rv = int(mpc.run(mpc.output(r)))
        assert (qv, rv) == divmod(v, b), (v, b, qv, rv)
