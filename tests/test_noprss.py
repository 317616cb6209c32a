"""No-PRSS mode tests (reference: --no-prss, runtime.py:4036-4055,4142-4158).

All correlated randomness comes from interactive t+1-sender input protocols
instead of PRSS: input-sum randoms, +-1-product random bits, reshare-based
zero-test masking, and same-integer conversion masks.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

import conftest

import mpyc_tpu.sectypes as sectypes
import mpyc_tpu.asyncoro as asyncoro
from mpyc_tpu.runtime import Runtime, Party, _Options

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def mpc():
    old = sectypes.runtime
    rt = Runtime(0, [Party(0)], _Options(no_prss=True))
    sectypes.runtime = rt
    asyncoro.runtime = rt
    rt.start()
    yield rt
    rt.shutdown()
    sectypes.runtime = old


def test_no_prss_keys_empty(mpc):
    assert mpc._prss_keys == {}


def test_randoms_bounded(mpc):
    secint = mpc.SecInt(32)
    xs = mpc._randoms(secint, 8, bound=1 << 16)
    vals = [mpc.run(mpc.output(x, raw=True)) for x in xs]
    assert all(0 <= int(v) < (1 << 16) for v in vals)


def test_random_bits(mpc):
    secint = mpc.SecInt(32)
    bits = mpc.random_bits(secint, 16)
    vals = [mpc.run(mpc.output(b)) for b in bits]
    assert all(v in (0, 1) for v in vals)
    signed = mpc.np_random_bits(secint.field, 16, signed=True)
    p = secint.field.order
    assert all(int(v) in (1, p - 1) for v in signed.value.reshape(-1))


def test_random_bits_char2(mpc):
    secfld = mpc.SecFld(char=2, min_order=256)
    bits = mpc.random_bits(secfld, 8)
    vals = [mpc.run(mpc.output(b)) for b in bits]
    assert all(int(v) in (0, 1) for v in vals)


def test_comparisons(mpc):
    secint = mpc.SecInt(16)
    a, b = secint(5), secint(-9)
    assert mpc.run(mpc.output(a < b)) == 0
    assert mpc.run(mpc.output(a > b)) == 1
    assert mpc.run(mpc.output(a == a)) == 1
    assert mpc.run(mpc.output(mpc.sgn(b))) == -1


def test_is_zero_public(mpc):
    secint = mpc.SecInt(16)
    assert mpc.is_zero_public(secint(0)) is True
    assert mpc.is_zero_public(secint(7)) is False
    secfld = mpc.SecFld(257)
    assert mpc.is_zero_public(secfld(0)) is True
    assert mpc.is_zero_public(secfld(99)) is False


def test_convert(mpc):
    secint = mpc.SecInt(16)
    secfxp = mpc.SecFxp(32, 16)
    secfld = mpc.SecFld(257)
    assert mpc.run(mpc.output(mpc.convert(secint(21), secfxp))) == 21.0
    assert mpc.run(mpc.output(mpc.convert(secfxp(5.0), secint))) == 5
    assert int(mpc.run(mpc.output(mpc.convert(secfld(200), secint)))) == 200
    assert int(mpc.run(mpc.output(mpc.convert(secint(123), secfld)))) == 123


def test_fxp_ops(mpc):
    secfxp = mpc.SecFxp(32, 16)
    x = secfxp(2.5)
    y = secfxp(-0.75)
    assert mpc.run(mpc.output(x * y)) == pytest.approx(-1.875, abs=2 ** -12)
    assert mpc.run(mpc.output(x < y)) == 0


MP_SCRIPT = r"""
import sys
sys.path.insert(0, %r)
from mpyc_tpu.runtime import mpc

secint = mpc.SecInt(16)
secfxp = mpc.SecFxp(32, 16)
mpc.run(mpc.start())
a = mpc.input(secint(3 + mpc.pid), senders=0)
b = mpc.input(secint(-8), senders=1)
assert mpc.run(mpc.output(a * b)) == -24
assert mpc.run(mpc.output(a < b)) == 0
assert mpc.run(mpc.output(mpc.convert(a, secfxp))) == 3.0
bits = mpc.random_bits(secint, 4)
assert all(mpc.run(mpc.output(x)) in (0, 1) for x in bits)
mpc.run(mpc.shutdown())
print('NOPRSS-MP-OK', mpc.pid)
"""


@pytest.mark.slow
def test_multiparty_no_prss(tmp_path):
    script = tmp_path / 'mp_noprss.py'
    script.write_text(MP_SCRIPT % REPO)
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    env.pop('XLA_FLAGS', None)
    out = subprocess.run(
        [sys.executable, str(script), '-M3', '--no-prss', '-B', str(conftest.free_base_port())],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'NOPRSS-MP-OK 0' in out.stdout
