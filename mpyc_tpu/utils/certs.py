"""TLS certificate tooling for the --ssl transport.

The reference expects a ``.config/`` directory with ``party_{i}.crt/.key``
and a common ``mpyc_ca.crt`` (reference runtime.py:246-259). This module
generates an equivalent layout with the system openssl CLI: one EC P-256
CA plus one leaf certificate per party with subject/SAN
``party{i}.mpyc-tpu`` (SAN so OpenSSL's hostname check accepts it without
legacy CN fallback).

CLI:  python -m mpyc_tpu.utils.certs [-m M] [-d DIR]
"""

from __future__ import annotations

import os
import subprocess
import sys

DAYS = 3650


def party_name(pid: int) -> str:
    """The DNS-style peer name checked during the TLS handshake."""
    return f'party{pid}.mpyc-tpu'


def config_dir(path: str | None = None) -> str:
    """Directory holding certs: arg > $MPYC_TPU_CONFIG_DIR > ./.config."""
    return path or os.environ.get('MPYC_TPU_CONFIG_DIR') or '.config'


def cert_paths(pid: int, path: str | None = None):
    d = config_dir(path)
    return (os.path.join(d, f'party_{pid}.crt'),
            os.path.join(d, f'party_{pid}.key'),
            os.path.join(d, 'mpyc_ca.crt'))


def _run(*cmd):
    subprocess.run(cmd, check=True, capture_output=True)


def generate(m: int, path: str | None = None, force: bool = False) -> str:
    """Generate a CA and m party certificates under the config dir."""
    d = config_dir(path)
    os.makedirs(d, exist_ok=True)
    ca_crt = os.path.join(d, 'mpyc_ca.crt')
    ca_key = os.path.join(d, 'mpyc_ca.key')
    if force or not os.path.exists(ca_crt):
        _run('openssl', 'ecparam', '-name', 'prime256v1', '-genkey',
             '-noout', '-out', ca_key)
        _run('openssl', 'req', '-new', '-x509', '-key', ca_key,
             '-subj', '/CN=MPyC-TPU CA', '-days', str(DAYS), '-out', ca_crt)
    for i in range(m):
        crt = os.path.join(d, f'party_{i}.crt')
        key = os.path.join(d, f'party_{i}.key')
        if not force and os.path.exists(crt):
            continue
        csr = os.path.join(d, f'party_{i}.csr')
        name = party_name(i)
        _run('openssl', 'ecparam', '-name', 'prime256v1', '-genkey',
             '-noout', '-out', key)
        _run('openssl', 'req', '-new', '-key', key,
             '-subj', f'/CN={name}',
             '-addext', f'subjectAltName=DNS:{name}', '-out', csr)
        _run('openssl', 'x509', '-req', '-in', csr, '-CA', ca_crt,
             '-CAkey', ca_key, '-CAcreateserial', '-days', str(DAYS),
             '-copy_extensions', 'copy', '-out', crt)
        os.remove(csr)
    return d


def main(argv=None):
    import argparse
    parser = argparse.ArgumentParser(
        description='Generate TLS certs for --ssl runs.')
    parser.add_argument('-m', type=int, default=8,
                        help='number of parties (default 8)')
    parser.add_argument('-d', '--dir', default=None,
                        help='output directory (default ./.config)')
    parser.add_argument('--force', action='store_true',
                        help='regenerate existing certificates')
    args = parser.parse_args(argv)
    d = generate(args.m, args.dir, args.force)
    print(f'wrote CA + {args.m} party certs to {d}/')


if __name__ == '__main__':
    sys.exit(main())
