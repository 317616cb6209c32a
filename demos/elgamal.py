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
import functools
import operator
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.gmpy import is_prime, isqrt
from mpyc_tpu.runtime import mpc


def group_order_bound(group):
    """The group order if known, else a public upper bound on it."""
    if group.order is not None:
        return group.order
    if hasattr(group, 'discriminant'):
        return isqrt(-group.discriminant)
    return group.field.modulus ** group.genus


def exponent_type(group):
    """Secure number type for exponents of the given group."""
    n = group.order
    if n is not None and is_prime(n):
        return mpc.SecFld(n)
    return mpc.SecInt(group_order_bound(group).bit_length())


def keygen(g):
    """Threshold ElGamal key generation: secret x, public h = g^x."""
    group = type(g)
    secgrp = mpc.SecGrp(group)
    secnum = exponent_type(group)
    h = group.identity
    while h == group.identity:
        x = mpc._random(secnum)
        h = secgrp.repeat_public(g, x)
    return x, h


def encrypt(g, h, M):
    """ElGamal encryption of group element M under public key h."""
    u = random.randrange(group_order_bound(type(g)))
    return g^u, (h^u) @ M


def decrypt(C, x, public_out=True):
    """Threshold ElGamal decryption of ciphertext C = (A, B)."""
    A, B = C
    if public_out:
        blind = mpc.SecGrp(type(A)).repeat_public(A, -x)  # A^-x opened
    else:
        blind = A^-x                                      # stays secret
    return blind @ B


def discrete_log_small(g, M):
    """Exhaustive discrete log of M base g (tally readout)."""
    T, t = type(g).identity, 0
    while T != M:
        T, t = T @ g, t + 1
    return t


def election(secgrp):
    """Boardroom election between all MPC parties."""
    group = secgrp.group
    g = group.generator
    x, h = keygen(g)

    vote = random.randint(0, 1)
    print(f'''My vote: {vote} (for {'"yes"' if vote else '"no"'})''')
    ballots = mpc.transfer(encrypt(g, h, g^vote))  # g^v: additive tally

    tally = (functools.reduce(operator.matmul, (b[0] for b in ballots)),
             functools.reduce(operator.matmul, (b[1] for b in ballots)))
    M = decrypt(tally, x, public_out=True)
    yes = discrete_log_small(g, M)
    print(f'Referendum result: {yes} "yes" / {len(ballots) - yes} "no"')
    assert (g^yes) == M


def crypt_cycle(secgrp, m, public_out=True):
    """Encrypt/decrypt cycle for small message m (party 0 encrypts)."""
    group = secgrp.group
    g = group.generator
    x, h = keygen(g)

    pair = None
    if mpc.pid == 0:
        M, Z = group.encode(m)
        pair = (encrypt(g, h, M), encrypt(g, h, Z))
    C_M, C_Z = mpc.transfer(pair, senders=0)

    M = decrypt(C_M, x, public_out=public_out)
    Z = decrypt(C_Z, x, public_out=public_out)
    codec = group if public_out else secgrp
    return codec.decode(M, Z)


def select_group(args):
    small = args.no_public_output
    if args.group == 2 and small:
        random.seed(a=1234, version=2)   # deterministic DGS curve search
    makers = {
        1: lambda: mpc.SecEllipticCurve('secp256k1', 'projective'),
        2: lambda: mpc.SecHyperellipticCurve('DGS', l=32) if small
        else mpc.SecHyperellipticCurve('kummer1271'),
        3: lambda: mpc.SecSchnorrGroup(l=1024),
        4: lambda: mpc.SecQuadraticResidues(l=2048),
        5: lambda: mpc.SecClassGroup(l=32 if small else 1024),
    }
    return makers[args.group]()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-g', '--group', type=int, metavar='G', default=1,
                        help='1=EC (default), 2=HC, 3=SG, 4=QR, 5=Cl')
    parser.add_argument('-b', '--batch-size', type=int, metavar='B',
                        default=1)
    parser.add_argument('-o', '--offset', type=int, metavar='O', default=0)
    parser.add_argument('--no-public-output', action='store_true',
                        help='secret-shared message upon decryption')
    args, _ = parser.parse_known_args()

    mpc.run(mpc.start())
    secgrp = select_group(args)
    print(f'Using secure group: {secgrp.__name__}')

    print('Boardroom election')
    print('------------------')
    election(secgrp)
    print()

    print('Encryption/decryption tests')
    print('---------------------------')
    for i in range(args.batch_size):
        m = 1 + args.offset + i
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
