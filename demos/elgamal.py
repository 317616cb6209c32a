"""Demo: Threshold ElGamal cryptosystem over secure groups.

Counterpart of the reference demos/elgamal.py: the parties jointly
generate an ElGamal key pair (x secret-shared, h = g^x public), run a
boardroom election with additively homomorphic ElGamal votes, and run
encrypt/decrypt cycles with message encoding into group elements.

Five group families are supported:
  -g 1  elliptic curve secp256k1 (projective)       [default]
  -g 2  hyperelliptic curve (kummer1271; or DGS with --no-public-output)
  -g 3  Schnorr group (l=1024)
  -g 4  quadratic residues (l=2048)
  -g 5  class group

Usage: python demos/elgamal.py [-M m] [-g G] [-b B] [-o O] [--no-public-output]
"""
import argparse
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.gmpy import is_prime, isqrt
from mpyc_tpu.runtime import mpc


def keygen(g):
    """Threshold ElGamal key generation."""
    group = type(g)
    secgrp = mpc.SecGrp(group)
    n = group.order
    if n is not None and is_prime(n):
        secnum = mpc.SecFld(n)
    else:
        if hasattr(group, 'discriminant'):
            l = isqrt(-group.discriminant).bit_length()
        else:
            l = group.genus * group.field.modulus.bit_length()
        secnum = mpc.SecInt(l)

    while True:
        x = mpc._random(secnum)
        h = secgrp.repeat_public(g, x)  # g^x
        if h != group.identity:
            return x, h


def encrypt(g, h, M):
    """ElGamal encryption of group element M under public key h."""
    group = type(g)
    n = group.order
    if n is None:
        if hasattr(group, 'discriminant'):
            n = isqrt(-group.discriminant)
        else:
            n = group.field.modulus**group.genus
    u = random.randrange(n)
    return (g^u, (h^u) @ M)


def decrypt(C, x, public_out=True):
    """Threshold ElGamal decryption of ciphertext C = (A, B)."""
    A, B = C
    group = type(A)
    secgrp = mpc.SecGrp(group)
    if public_out:
        A_x = secgrp.repeat_public(A, -x)  # A^-x opened
        assert isinstance(A_x, group)
    else:
        A_x = A^-x
        assert isinstance(A_x, secgrp)
    return A_x @ B


def election(secgrp):
    """Boardroom election between all MPC parties."""
    group = secgrp.group
    g = group.generator
    x, h = keygen(g)

    v = random.randint(0, 1)
    print(f'''My vote: {v} (for {'"yes"' if v else '"no"'})''')
    c = encrypt(g, h, g^v)  # additively homomorphic in the exponent
    c = mpc.transfer(c)

    C = list(c[0])
    for c_i in c[1:]:
        C[0] @= c_i[0]
        C[1] @= c_i[1]

    M = decrypt(C, x, public_out=True)
    T, t = group.identity, 0  # T = g^t
    while T != M:
        T, t = T @ g, t+1
    print(f'Referendum result: {t} "yes" / {len(c) - t} "no"')
    assert (g^t) == M


def crypt_cycle(secgrp, m, public_out=True):
    """Encrypt/decrypt cycle for small message m."""
    group = secgrp.group
    g = group.generator
    x, h = keygen(g)

    if mpc.pid == 0:
        M, Z = group.encode(m)
        C = (encrypt(g, h, M), encrypt(g, h, Z))
    else:
        C = None
    C = mpc.transfer(C, senders=0)

    C_M, C_Z = C
    M = decrypt(C_M, x, public_out=public_out)
    Z = decrypt(C_Z, x, public_out=public_out)
    if public_out:
        return group.decode(M, Z)

    return secgrp.decode(M, Z)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-g', '--group', type=int, metavar='G', default=1,
                        help='1=EC (default), 2=HC, 3=SG, 4=QR, 5=Cl')
    parser.add_argument('-b', '--batch-size', type=int, metavar='B', default=1)
    parser.add_argument('-o', '--offset', type=int, metavar='O', default=0)
    parser.add_argument('--no-public-output', action='store_true',
                        help='secret-shared message upon decryption')
    args, _ = parser.parse_known_args()

    mpc.run(mpc.start())
    if args.group == 1:
        secgrp = mpc.SecEllipticCurve('secp256k1', 'projective')
    elif args.group == 2:
        if args.no_public_output:
            random.seed(a=1234, version=2)
            secgrp = mpc.SecHyperellipticCurve('DGS', l=32)
        else:
            secgrp = mpc.SecHyperellipticCurve('kummer1271')
    elif args.group == 3:
        secgrp = mpc.SecSchnorrGroup(l=1024)
    elif args.group == 4:
        secgrp = mpc.SecQuadraticResidues(l=2048)
    elif args.group == 5:
        if args.no_public_output:
            secgrp = mpc.SecClassGroup(l=32)
        else:
            secgrp = mpc.SecClassGroup(l=1024)
    print(f'Using secure group: {secgrp.__name__}')

    print('Boardroom election')
    print('------------------')
    election(secgrp)
    print()

    print('Encryption/decryption tests')
    print('---------------------------')
    for m in range(args.batch_size):
        m += 1 + args.offset
        print(f'Plaintext sent: {m}')
        p = crypt_cycle(secgrp, m, not args.no_public_output)
        if args.no_public_output:
            p = mpc.run(mpc.output(p))
        p = int(p)
        print(f'Plaintext received: {p}')
        assert m == p, (m, p)
    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
