"""Demo: Threshold DSA / ECDSA / Schnorr signatures over secure groups.

Counterpart of the reference demos/dsa.py: threshold key generation and
signing for (EC)DSA and Schnorr signatures, using only the public-base
secret-exponent protocol repeat_public (the parties compute g^x from
their shares of x without reconstructing x).  Verification runs in the
clear with ordinary group arithmetic.

Usage: python demos/dsa.py [-M m] [-g G]   (1=EC, 2=HC kummer1271, 3=SG)
"""
import argparse
import os
import sys
import time
from hashlib import sha1, sha224, sha256, sha384, sha512

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.gmpy import invert
from mpyc_tpu.fingroups import (SchnorrGroup, EllipticCurve, HyperellipticCurve,
                                EllipticCurvePoint, HyperellipticCurveDivisor)
from mpyc_tpu.runtime import mpc
from elgamal import keygen


def _sha_for(order):
    n_bytes = (order.bit_length() + 7) // 8
    for cap, sha in ((20, sha1), (28, sha224), (32, sha256), (48, sha384)):
        if cap >= n_bytes:
            return sha, n_bytes
    return sha512, n_bytes


class DSA:
    """Threshold (EC)DSA with Schnorr groups or elliptic curves."""

    def __init__(self, group):
        self.group = group

    def keygen(self):
        self.x, self.y = keygen(self.group.generator)

    def sign(self, M):
        g = self.group.generator
        q = self.group.order
        x = self.x
        secgrp = mpc.SecGrp(self.group)
        secfld = mpc.SecFld(q)
        while True:
            k = mpc._random(secfld)
            a = secgrp.repeat_public(g, k)  # a = g^k
            if a == self.group.identity:
                continue
            r = self.to_int(a) % q
            if r == 0:
                continue
            s = (self.H(M) + x * r) / k
            s = int(mpc.run(mpc.output(s)))
            if s != 0:
                break
        return r, s

    def verify(self, M, S):
        g = self.group.generator
        q = self.group.order
        y = self.y
        r, s = S
        if not (0 < r < q and 0 < s < q):
            return False

        w = int(invert(s, q))
        u_1 = self.H(M)*w % q
        u_2 = r*w % q
        return self.to_int((g^u_1) @ (y^u_2)) % q == r

    def H(self, M):
        sha, n_bytes = _sha_for(self.group.order)
        return int.from_bytes(sha(M).digest()[:n_bytes], byteorder='big')

    @staticmethod
    def to_int(a):
        """Map group element a to an integer value."""
        if isinstance(a, EllipticCurvePoint):        # ECDSA
            return int(a.normalize().x)

        if isinstance(a, HyperellipticCurveDivisor):
            return int(a.u[0])

        return int(a)                                # DSA

    @staticmethod
    def to_bytes(a):
        z = DSA.to_int(a)
        n_bytes = (a.field.order.bit_length() + 7) // 8
        return z.to_bytes(length=n_bytes, byteorder='big')


class Schnorr:
    """Threshold Schnorr signatures for groups of prime order."""

    def __init__(self, group):
        self.group = group

    def keygen(self):
        self.x, self.h = keygen(self.group.generator)

    def sign(self, M):
        g = self.group.generator
        x = self.x
        secgrp = mpc.SecGrp(self.group)
        secfld = mpc.SecFld(self.group.order)

        u = mpc._random(secfld)
        a = secgrp.repeat_public(g, u)  # a = g^u
        c = self.H(a, M)
        r = u + c * x
        r = int(mpc.run(mpc.output(r)))
        return c, r

    def verify(self, M, S):
        g = self.group.generator
        h = self.h
        c, r = S
        return c == self.H((g^r) @ (h^-c), M)

    def H(self, a, M):
        sha, n_bytes = _sha_for(self.group.order)
        a = DSA.to_bytes(a)
        return int.from_bytes(sha(a + M).digest()[:n_bytes], byteorder='big')


def test_sig(sig, group, M):
    """Keygen-Sign-Verify cycle for message M."""
    signer = sig(group)
    signer.keygen()
    S = signer.sign(M)
    assert signer.verify(M, S), (sig.__name__, group.__name__)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-g', '--group', type=int, metavar='G', default=1,
                        help='1=EC (default), 2=HC, 3=SG')
    args, _ = parser.parse_known_args()

    if args.group == 1:
        groups = (EllipticCurve('Ed25519'),
                  EllipticCurve('Ed25519', 'projective'),
                  EllipticCurve('Ed25519', 'extended'),
                  EllipticCurve('secp256k1', 'projective'))
    elif args.group == 2:
        groups = (HyperellipticCurve('kummer1271'),)
    else:
        groups = (SchnorrGroup(p=9739, q=541),
                  SchnorrGroup(n=160),
                  SchnorrGroup(l=2048))

    M = b'hello there?!'

    mpc.run(mpc.start())
    print('Sign/verify tests')
    print('-----------------')
    for group in groups:
        print(group.__name__)
        for sig in DSA, Schnorr:
            start = time.process_time()
            test_sig(sig, group, M)
            print(f'{time.process_time() - start} seconds '
                  f'for {sig.__name__} signature')
            mpc.barrier()
    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
