"""Tests for mpctools, random, statistics extension modules (m=1)."""
import numpy as np
import pytest

import mpyc_tpu.sectypes as sectypes
import mpyc_tpu.asyncoro as asyncoro
from mpyc_tpu.runtime import Runtime, Party, _Options
from mpyc_tpu import mpctools, statistics as mstats
from mpyc_tpu import random as mrandom


@pytest.fixture(scope='module')
def mpc():
    old = sectypes.runtime
    rt = Runtime(0, [Party(0)], _Options())
    sectypes.runtime = rt
    asyncoro.runtime = rt
    mpctools.runtime = rt
    mrandom.runtime = rt
    mstats.runtime = rt
    rt.start()
    yield rt
    rt.shutdown()
    sectypes.runtime = old


def test_mpctools(mpc):
    secint = mpc.SecInt(16)
    xs = [mpc.input(secint(v))[0] for v in (1, 2, 3, 4, 5)]
    assert mpc.run(mpc.output(mpctools.reduce(mpc.mul, xs))) == 120
    acc = list(mpctools.accumulate(xs, mpc.add))
    assert [mpc.run(mpc.output(v)) for v in acc] == [1, 3, 6, 10, 15]
    acc = list(mpctools.accumulate(xs, mpc.add, method='Brent-Kung'))
    assert [mpc.run(mpc.output(v)) for v in acc] == [1, 3, 6, 10, 15]
    assert mpc.run(mpc.output(mpctools.reduce(mpc.add, [], initial=secint(9)))) == 9
    with pytest.raises(TypeError):
        mpctools.reduce(mpc.add, [])


def test_random(mpc):
    secint = mpc.SecInt(16)
    v = mpc.run(mpc.output(mrandom.getrandbits(secint, 8)))
    assert 0 <= v < 256
    v = mpc.run(mpc.output(mrandom.randrange(secint, 10, 20)))
    assert 10 <= v < 20
    v = mpc.run(mpc.output(mrandom.randint(secint, -3, 3)))
    assert -3 <= v <= 3
    u = mrandom.random_unit_vector(secint, 6)
    vals = [mpc.run(mpc.output(b)) for b in u]
    assert sorted(vals) == [0, 0, 0, 0, 0, 1]
    perm = mrandom.random_permutation(secint, 5)
    assert sorted(mpc.run(mpc.output(v)) for v in perm) == [0, 1, 2, 3, 4]
    der = mrandom.random_derangement(secint, 4)
    got = [mpc.run(mpc.output(v)) for v in der]
    assert sorted(got) == [0, 1, 2, 3] and all(g != i for i, g in enumerate(got))
    samp = mrandom.sample(secint, range(10), 3)
    got = [mpc.run(mpc.output(v)) for v in samp]
    assert len(set(got)) == 3 and all(0 <= g < 10 for g in got)
    secfxp = mpc.SecFxp(32)
    r = mpc.run(mpc.output(mrandom.random(secfxp)))
    assert 0.0 <= r < 1.0
    r = mpc.run(mpc.output(mrandom.uniform(secfxp, 1.0, 2.0)))
    assert 1.0 <= r <= 2.0


def test_statistics_int(mpc):
    secint = mpc.SecInt(16)
    data = [mpc.input(secint(v))[0] for v in (2, 4, 4, 4, 5, 5, 7, 9)]
    assert mpc.run(mpc.output(mstats.mean(data))) == 5
    assert mpc.run(mpc.output(mstats.pstdev(data))) == 2
    assert mpc.run(mpc.output(mstats.median(data))) == 4
    assert mpc.run(mpc.output(mstats.median_low(data))) == 4
    assert mpc.run(mpc.output(mstats.median_high(data))) == 5
    m = mpc.run(mpc.output(mstats.mode(data)))
    assert m == 4


def test_statistics_fxp(mpc):
    secfxp = mpc.SecFxp(32)
    vals = (2, 4, 4, 4, 5, 5, 7, 9)
    data = [mpc.input(secfxp(float(v)))[0] for v in vals]
    import statistics as pystats
    assert abs(mpc.run(mpc.output(mstats.mean(data))) - 5.0) < 2 ** -8
    assert abs(mpc.run(mpc.output(mstats.pstdev(data)))
               - pystats.pstdev(vals)) < 0.01
    xs = [mpc.input(secfxp(float(v)))[0] for v in (1, 2, 3, 4, 5)]
    ys = [mpc.input(secfxp(float(v)))[0] for v in (2, 4, 6, 8, 10)]
    lr = mstats.linear_regression(xs, ys)
    assert abs(mpc.run(mpc.output(lr.slope)) - 2.0) < 0.01
    assert abs(mpc.run(mpc.output(lr.intercept))) < 0.01
    corr = mstats.correlation(xs, ys)
    assert abs(mpc.run(mpc.output(corr)) - 1.0) < 0.01
    cov = mstats.covariance(xs, ys)
    assert abs(mpc.run(mpc.output(cov)) - 5.0) < 0.05
