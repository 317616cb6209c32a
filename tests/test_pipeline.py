"""Pipeline (deferred-receive) mode tests: ``with mpc.pipeline():`` issues
sends eagerly and defers receives as LazyShare placeholders (latency-hiding
counterpart of the reference's asyncio dataflow, SURVEY §2.13)."""
import os
import subprocess
import sys

import numpy as np
import pytest

import conftest

from mpyc_tpu import sectypes
from mpyc_tpu.runtime import mpc

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope='module', autouse=True)
def _mpc():
    mpc.run(mpc.start())
    yield
    mpc.run(mpc.shutdown())


secint = mpc.SecInt(32)


def test_pipeline_single_party_noop():
    # m=1 (t=0): _reshare short-circuits, pipeline is transparent
    with mpc.pipeline():
        c = secint(6) * secint(7)
        d = mpc.np_matmul(secint.array(np.array([[1, 2]], dtype=object)),
                          secint.array(np.array([[3], [4]], dtype=object)))
    assert int(mpc.run(mpc.output(c))) == 42
    assert int(mpc.run(mpc.output(d))[0, 0]) == 11


def test_flush_api():
    with mpc.pipeline():
        c = secint(3) * secint(5)
    out = mpc.flush(c)
    assert out is c
    assert int(mpc.run(mpc.output(c))) == 15
    assert mpc.flush() is None


def test_lazyshare_proxy():
    done = []

    def thunk():
        if not done:
            done.append([mpc.SecInt(32).field.array(
                np.array([2, 3], dtype=object))])
        return done[0]

    ls = sectypes.LazyShare(thunk, 0, (2,))
    assert ls.shape == (2,)
    assert not done          # shape access does not force
    s = ls + ls.force() * 0  # arithmetic forces
    assert done
    assert [int(v) for v in s] == [2, 3]


SCRIPT = r"""
import sys
sys.path.insert(0, %r)
import numpy as np
from mpyc_tpu.runtime import mpc

secint = mpc.SecInt(32)
mpc.run(mpc.start())
a = mpc.input(secint(7), senders=0)
b = mpc.input(secint(9), senders=1)
A = mpc.input(secint.array(np.arange(4, dtype=object).reshape(2, 2)),
              senders=2)
with mpc.pipeline():
    # three independent resharing rounds: sends all go out before any
    # receive is forced
    c = a * b
    d = a * a
    E = A @ A
    F = mpc.schur_prod([a, b, c], [b, a, d])
res_c = mpc.run(mpc.output(c))
res_d = mpc.run(mpc.output(d))
res_E = mpc.run(mpc.output(E))
res_F = [mpc.run(mpc.output(v)) for v in F]
assert res_c == 63, res_c
assert res_d == 49, res_d
assert np.asarray(res_E).tolist() == (np.arange(4).reshape(2, 2) @
                                      np.arange(4).reshape(2, 2)).tolist()
assert [int(v) for v in res_F] == [63, 63, 49 * 63], res_F
# nested pipeline + dependent ops inside the context (forces mid-flight)
with mpc.pipeline():
    x = a * b
    with mpc.pipeline():
        y = x * x     # depends on pending x: transparently forced
assert mpc.run(mpc.output(y)) == 63**2
print('PIPELINE-MP-OK', mpc.pid)
"""


@pytest.mark.slow
def test_multiparty_pipeline(tmp_path):
    script = tmp_path / 'mp_pipe.py'
    script.write_text(SCRIPT % REPO)
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    env.pop('XLA_FLAGS', None)
    out = subprocess.run(
        [sys.executable, str(script), '-M3',
         '-B', str(conftest.free_base_port())],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'PIPELINE-MP-OK 0' in out.stdout
