"""Tests for fixed-point transcendental functions (m=1)."""
import math

import pytest

import mpyc_tpu.sectypes as sectypes
import mpyc_tpu.asyncoro as asyncoro
from mpyc_tpu.runtime import Runtime, Party, _Options


@pytest.fixture(scope='module')
def mpc():
    old = sectypes.runtime
    rt = Runtime(0, [Party(0)], _Options())
    sectypes.runtime = rt
    asyncoro.runtime = rt
    rt.start()
    yield rt
    rt.shutdown()
    sectypes.runtime = old


def test_log(mpc):
    secfxp = mpc.SecFxp(32)
    for v in (1.0, 2.0, 8.0, 0.3, 5.7):
        x = mpc.input(secfxp(v))[0]
        assert abs(mpc.run(mpc.output(mpc.np_log2(x))) - math.log2(v)) < 1e-3
    x = mpc.input(secfxp(2.0))[0]
    assert abs(mpc.run(mpc.output(mpc.np_log(x))) - math.log(2)) < 1e-3
    assert abs(mpc.run(mpc.output(mpc.np_log10(x))) - math.log10(2)) < 1e-3


def test_exp(mpc):
    secfxp = mpc.SecFxp(32)
    for v in (0.0, 1.0, -1.5, 2.25, -5.0):
        x = mpc.input(secfxp(v))[0]
        assert abs(mpc.run(mpc.output(mpc.np_exp2(x))) - 2 ** v) < 1e-3, v
    x = mpc.input(secfxp(0.5))[0]
    assert abs(mpc.run(mpc.output(mpc.np_exp(x))) - math.exp(0.5)) < 1e-3


def test_sincos(mpc):
    secfxp = mpc.SecFxp(32)
    for v in (0.0, 1.0, -1.2, 2.0, 5.5, -7.25, 12.0):
        x = mpc.input(secfxp(v))[0]
        s, c = mpc.sincos(x)
        assert abs(mpc.run(mpc.output(s)) - math.sin(v)) < 1e-2, v
        assert abs(mpc.run(mpc.output(c)) - math.cos(v)) < 1e-2, v
    x = mpc.input(secfxp(0.8))[0]
    assert abs(mpc.run(mpc.output(mpc.tan(x))) - math.tan(0.8)) < 1e-2


def test_sincos_array(mpc):
    import numpy as np
    secfxp = mpc.SecFxp(32)
    vals = np.array([0.0, 1.0, -2.5, 4.0])
    x = mpc.input(secfxp.array(vals))[0]
    s, c = mpc.sincos(x)
    s_out = np.asarray(mpc.run(mpc.output(s)), dtype=float)
    c_out = np.asarray(mpc.run(mpc.output(c)), dtype=float)
    assert np.allclose(s_out, np.sin(vals), atol=1e-2)
    assert np.allclose(c_out, np.cos(vals), atol=1e-2)
