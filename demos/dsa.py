"""Demo: Threshold DSA / ECDSA / Schnorr signatures over secure groups.

Counterpart of the reference demos/dsa.py: threshold key generation and
signing for (EC)DSA and Schnorr signatures. The secret key and each
nonce live only as Shamir shares in the group's scalar field; public
group elements g^k are obtained with the public-base secret-exponent
protocol (secgrp.repeat_public), so no party ever sees a nonce or the
key. Verification is plain group arithmetic on public values.

Signature math (scalar field Z_q, generator g, key x, public y = g^x):
  DSA:     r = int(g^k) mod q,  s = (H(M) + x r) / k        (k fresh)
  Schnorr: c = H(g^u || M),     r = u + c x                 (u fresh)

Usage: python demos/dsa.py [-M m] [-g G]   (1=EC, 2=HC kummer1271, 3=SG)
"""
import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.gmpy import invert
from mpyc_tpu.fingroups import (SchnorrGroup, EllipticCurve,
                                HyperellipticCurve, EllipticCurvePoint,
                                HyperellipticCurveDivisor)
from mpyc_tpu.runtime import mpc
from elgamal import keygen


def group_element_int(a):
    """Canonical integer associated with a public group element."""
    if isinstance(a, EllipticCurvePoint):
        return int(a.normalize().x)           # ECDSA convention
    if isinstance(a, HyperellipticCurveDivisor):
        return int(a.u[0])
    return int(a)                             # Schnorr-group element


class ThresholdSignature:
    """Shared machinery: hashing into Z_q and threshold keygen."""

    def __init__(self, group):
        self.group = group
        self.q = group.order
        width = (self.q.bit_length() + 7) // 8
        algo = next((a for cap, a in ((20, 'sha1'), (28, 'sha224'),
                                      (32, 'sha256'), (48, 'sha384'))
                     if cap >= width), 'sha512')
        self._sha = getattr(hashlib, algo)
        self._width = width

    def digest_int(self, *parts):
        blob = b''.join(parts)
        return int.from_bytes(self._sha(blob).digest()[:self._width], 'big')

    def element_bytes(self, a):
        w = (a.field.order.bit_length() + 7) // 8
        return group_element_int(a).to_bytes(w, 'big')

    def keygen(self):
        self.key_share, self.pubkey = keygen(self.group.generator)

    def fresh_nonce(self):
        """Secret-shared uniform scalar plus its public group power."""
        secgrp = mpc.SecGrp(self.group)
        secfld = mpc.SecFld(self.q)
        k = mpc._random(secfld)
        return k, secgrp.repeat_public(self.group.generator, k)


class DSA(ThresholdSignature):
    """Threshold (EC)DSA."""

    def sign(self, M):
        q = self.q
        while True:
            k, gk = self.fresh_nonce()
            if gk == self.group.identity:
                continue                      # negligible, but exact
            r = group_element_int(gk) % q
            if not r:
                continue
            s_shared = (self.digest_int(M) + self.key_share * r) / k
            s = int(mpc.run(mpc.output(s_shared)))
            if s:
                return r, s

    def verify(self, M, signature):
        r, s = signature
        q = self.q
        if not (0 < r < q and 0 < s < q):
            return False
        s_inv = int(invert(s, q))
        g_part = self.group.generator ^ (self.digest_int(M) * s_inv % q)
        y_part = self.pubkey ^ (r * s_inv % q)
        return group_element_int(g_part @ y_part) % q == r


class Schnorr(ThresholdSignature):
    """Threshold Schnorr signatures for prime-order groups."""

    def sign(self, M):
        u, gu = self.fresh_nonce()
        c = self.digest_int(self.element_bytes(gu), M)
        r = int(mpc.run(mpc.output(u + c * self.key_share)))
        return c, r

    def verify(self, M, signature):
        c, r = signature
        recovered = (self.group.generator ^ r) @ (self.pubkey ^ -c)
        return c == self.digest_int(self.element_bytes(recovered), M)


def group_menu(choice):
    if choice == 1:
        return (EllipticCurve('Ed25519'),
                EllipticCurve('Ed25519', 'projective'),
                EllipticCurve('Ed25519', 'extended'),
                EllipticCurve('secp256k1', 'projective'))
    if choice == 2:
        return (HyperellipticCurve('kummer1271'),)
    return (SchnorrGroup(p=9739, q=541),
            SchnorrGroup(n=160),
            SchnorrGroup(l=2048))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-g', '--group', type=int, metavar='G', default=1,
                        help='1=EC (default), 2=HC, 3=SG')
    args, _ = parser.parse_known_args()
    message = b'hello there?!'

    mpc.run(mpc.start())
    print('Sign/verify tests')
    print('-----------------')
    for group in group_menu(args.group):
        print(group.__name__)
        for scheme_cls in (DSA, Schnorr):
            t0 = time.process_time()
            scheme = scheme_cls(group)
            scheme.keygen()
            sig = scheme.sign(message)
            assert scheme.verify(message, sig), \
                (scheme_cls.__name__, group.__name__)
            print(f'{time.process_time() - t0} seconds '
                  f'for {scheme_cls.__name__} signature')
            mpc.barrier()
    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
