"""Tests for secure floating-point numbers (m=1)."""
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


def test_secflt_roundtrip_arith(mpc):
    secflt = mpc.SecFlt(32)
    a = mpc.input(secflt(3.5))[0]
    b = mpc.input(secflt(-1.25))[0]
    assert mpc.run(mpc.output(a)) == 3.5
    assert mpc.run(mpc.output(b)) == -1.25
    assert mpc.run(mpc.output(a * b)) == -4.375
    assert mpc.run(mpc.output(a + b)) == 2.25
    assert mpc.run(mpc.output(a - b)) == 4.75
    assert abs(mpc.run(mpc.output(a / b)) - (-2.8)) < 1e-5
    assert mpc.run(mpc.output(abs(b))) == 1.25
    assert mpc.run(mpc.output(-a)) == -3.5


def test_secflt_compare(mpc):
    secflt = mpc.SecFlt(32)
    a = mpc.input(secflt(3.5))[0]
    b = mpc.input(secflt(-1.25))[0]
    assert mpc.run(mpc.output(a < b)) == 0
    assert mpc.run(mpc.output(a > b)) == 1
    assert mpc.run(mpc.output(a >= a)) == 1
    assert mpc.run(mpc.output(a == a)) == 1
    assert mpc.run(mpc.output(a != b)) == 1


def test_secflt_magnitudes(mpc):
    secflt = mpc.SecFlt(32)
    big = mpc.input(secflt(100.0))[0]
    small = mpc.input(secflt(0.03125))[0]
    assert mpc.run(mpc.output(big + small)) == 100.03125
    assert mpc.run(mpc.output(big * small)) == 3.125
    z = mpc.input(secflt(0.0))[0]
    assert mpc.run(mpc.output(z)) == 0.0
    assert mpc.run(mpc.output(big + z)) == 100.0
