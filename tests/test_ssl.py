"""TLS transport tests (--ssl; reference runtime.py:246-278).

Mutual TLS over the asyncio transport with a generated .config/ cert
layout (CA + per-party leaf certs, SAN party{i}.mpyc-tpu).
"""
import os
import subprocess
import sys

import pytest

import conftest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_generate_certs(tmp_path):
    from mpyc_tpu.utils import certs
    d = certs.generate(3, str(tmp_path / 'cfg'))
    for i in range(3):
        crt, key, ca = certs.cert_paths(i, d)
        assert os.path.exists(crt) and os.path.exists(key)
        assert os.path.exists(ca)
    # leaf verifies against the CA, SAN carries the party name
    crt, _, ca = certs.cert_paths(1, d)
    out = subprocess.run(['openssl', 'verify', '-CAfile', ca, crt],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    out = subprocess.run(['openssl', 'x509', '-in', crt, '-noout', '-text'],
                         capture_output=True, text=True)
    assert 'party1.mpyc-tpu' in out.stdout


SCRIPT = r"""
import sys
sys.path.insert(0, %r)
from mpyc_tpu.runtime import mpc

secint = mpc.SecInt(16)
mpc.run(mpc.start())
a = mpc.input(secint(11), senders=0)
b = mpc.input(secint(31), senders=2)
assert mpc.run(mpc.output(a * b)) == 341
mpc.run(mpc.shutdown())
print('SSL-MP-OK', mpc.pid)
"""


@pytest.mark.slow
def test_multiparty_ssl(tmp_path):
    script = tmp_path / 'mp_ssl.py'
    script.write_text(SCRIPT % REPO)
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    env.pop('XLA_FLAGS', None)
    out = subprocess.run(
        [sys.executable, str(script), '-M3', '--ssl', '-B', str(conftest.free_base_port())],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr[-2000:]
    assert 'SSL-MP-OK 0' in out.stdout
    assert (tmp_path / '.config' / 'mpyc_ca.crt').exists()
