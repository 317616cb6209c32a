"""Tests for oblivious lists (m=1; reference: tests/test_seclists.py)."""
import pytest

import mpyc_tpu.sectypes as sectypes
import mpyc_tpu.asyncoro as asyncoro
import mpyc_tpu.seclists as seclists_mod
from mpyc_tpu.seclists import seclist
from mpyc_tpu.runtime import Runtime, Party, _Options


@pytest.fixture(scope='module')
def mpc():
    old = sectypes.runtime
    rt = Runtime(0, [Party(0)], _Options())
    sectypes.runtime = rt
    asyncoro.runtime = rt
    seclists_mod.runtime = rt
    rt.start()
    yield rt
    rt.shutdown()
    sectypes.runtime = old


def test_secret_index_read_write(mpc):
    secint = mpc.SecInt(16)
    x = seclist([3, 1, 4, 1, 5, 9], sectype=secint)
    i = mpc.input(secint(2))[0]
    assert mpc.run(mpc.output(x[i])) == 4
    x[i] = secint(7)
    assert [mpc.run(mpc.output(v)) for v in x] == [3, 1, 7, 1, 5, 9]
    # public index still works
    assert mpc.run(mpc.output(x[0])) == 3
    x[0] = 11
    assert mpc.run(mpc.output(x[0])) == 11


def test_insert_delete_pop(mpc):
    secint = mpc.SecInt(16)
    y = seclist([10, 20, 30], sectype=secint)
    y.insert(mpc.input(secint(1))[0], secint(15))
    assert [mpc.run(mpc.output(v)) for v in y] == [10, 15, 20, 30]
    y.delete(mpc.input(secint(2))[0])
    assert [mpc.run(mpc.output(v)) for v in y] == [10, 15, 30]
    p = y.pop(mpc.input(secint(0))[0])
    assert mpc.run(mpc.output(p)) == 10
    assert [mpc.run(mpc.output(v)) for v in y] == [15, 30]
    # edge inserts
    z = seclist([1], sectype=secint)
    z.insert(mpc.input(secint(0))[0], secint(0))
    assert [mpc.run(mpc.output(v)) for v in z] == [0, 1]
    z.insert(mpc.input(secint(2))[0], secint(2))
    assert [mpc.run(mpc.output(v)) for v in z] == [0, 1, 2]


def test_sort_count_index_contains(mpc):
    secint = mpc.SecInt(16)
    x = seclist([3, 1, 4, 1, 5], sectype=secint)
    assert mpc.run(mpc.output(x.count(1))) == 2
    assert mpc.run(mpc.output(x.index(secint(4)))) == 2
    assert mpc.run(mpc.output(x.contains(5))) == 1
    assert mpc.run(mpc.output(x.contains(6))) == 0
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        5 in x
    x.sort()
    assert [mpc.run(mpc.output(v)) for v in x] == [1, 1, 3, 4, 5]


def test_find_remove_copy(mpc):
    secint = mpc.SecInt(16)
    x = seclist([3, 1, 4, 1, 5], sectype=secint)
    assert mpc.run(mpc.output(x.find(4))) == 2
    assert mpc.run(mpc.output(x.find(9))) == -1
    y = x.copy()
    y.remove(secint(1))
    assert [mpc.run(mpc.output(v)) for v in y] == [3, 4, 1, 5]
    assert [mpc.run(mpc.output(v)) for v in x] == [3, 1, 4, 1, 5]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        y.remove(secint(9))


def test_secindex_random(mpc):
    from mpyc_tpu.seclists import secindex
    secint = mpc.SecInt(16)
    ix = secindex.random(secint, 4, offset=1)
    bits = [mpc.run(mpc.output(b)) for b in ix.value]
    assert sum(bits) == 1 and all(b in (0, 1) for b in bits)
    assert ix.offset == 1


def test_lexicographic(mpc):
    secint = mpc.SecInt(16)
    a = seclist([1, 2, 3], sectype=secint)
    b = seclist([1, 2, 4], sectype=secint)
    assert mpc.run(mpc.output(a < b)) == 1
    assert mpc.run(mpc.output(b < a)) == 0
    assert mpc.run(mpc.output(a == seclist([1, 2, 3], sectype=secint))) == 1
    assert mpc.run(mpc.output(a == b)) == 0
