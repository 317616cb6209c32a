"""Demo: SHA3 / SHAKE on secret-shared bits.

Counterpart of the reference demos/sha3.py: the Keccak-f[1600] permutation
evaluated on a secure GF(2) bit state — theta/rho/pi/iota are linear (XOR =
addition, rotations = rolls: local), chi costs one batched secure
multiplication of the whole 1600-bit state per round (24 rounds total).

The sponge operates entirely on secure bits: message, state, and digest all
stay secret-shared; nothing is opened until the caller outputs the digest.
Exports the same functional surface as the reference demo — keccak_f1600,
sponge(r, N, d), keccak(c, N, d), sha3(M, d, c), shake(M, d, c), xprint —
so other demos (np_onewayhashchains) can use SHAKE128 as a one-way function
on secret bit vectors.

Self-checks against hashlib.

Usage: python demos/sha3.py [-M m] [--sim] [-i I] [-n N]
         [--hash | --shake] [-d D] [-c C]
"""

import argparse
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from mpyc_tpu.runtime import mpc

secfld = mpc.SecFld(2)  # secure bits

RC = [0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
      0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
      0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
      0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
      0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
      0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
      0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
      0x8000000000008080, 0x0000000080000001, 0x8000000080008008]

ROT = [[0, 36, 3, 41, 18],
       [1, 44, 10, 45, 2],
       [62, 6, 43, 15, 61],
       [28, 55, 25, 21, 56],
       [27, 20, 39, 8, 14]]


def _keccak_rounds(A):
    """Keccak-f[1600] on secure bit array A of shape (5, 5, 64), (x, y, z)."""
    for rnd in range(24):
        # theta (linear)
        C = A.sum(axis=1)                          # (5, 64), XOR over y
        rows = [C[(x + 4) % 5] + mpc.np_roll(C[(x + 1) % 5], 1)
                for x in range(5)]
        D = mpc.np_stack(rows, axis=0)             # (5, 64)
        A = A + mpc.np_reshape(D, (5, 1, 64))
        # rho + pi (linear): B[y, (2x+3y)%5] = rot(A[x, y])
        B_rows = [[None] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                B_rows[y][(2 * x + 3 * y) % 5] = mpc.np_roll(
                    A[x, y], ROT[x][y])
        B = mpc.np_stack([mpc.np_stack(r, axis=0) for r in B_rows], axis=0)
        # chi: ONE secure multiplication of the full state
        B1 = mpc.np_roll(B, -1, axis=0)
        B2 = mpc.np_roll(B, -2, axis=0)
        A = B + (B1 + 1) * B2
        # iota
        rc_bits = np.array([(RC[rnd] >> z) & 1 for z in range(64)],
                           dtype=object)
        A = mpc.np_update(A, (0, 0), A[0, 0] + secfld.field.array(rc_bits))
    return A


def keccak_f1600(S):
    """Keccak-f[1600] on a flat secure bit array S of length 1600.

    Flat layout per FIPS 202: bit 64*(5y + x) + z is lane (x, y), bit z.
    """
    A = mpc.np_transpose(mpc.np_reshape(S, (5, 5, 64)), (1, 0, 2))
    A = _keccak_rounds(A)
    return mpc.np_reshape(mpc.np_transpose(A, (1, 0, 2)), (1600,))


def sponge(r, N, d):
    """Keccak sponge with rate r and output length d on bit array N."""
    # pad with 10^*1 to a multiple of r bits
    P = np.concatenate(
        (N, np.array([1] + [0] * ((-(N.size + 2)) % r) + [1])))
    n = P.size // r
    P = P.reshape(n, r)

    # absorb P block by block
    S = secfld.array(np.zeros(1600, dtype=object))
    for i in range(n):
        U = P[i] + S[:r]
        S = mpc.np_update(S, slice(0, r), U)
        S = keccak_f1600(S)

    # squeeze d bits
    Z = S[:r]
    while Z.shape[0] < d:
        S = keccak_f1600(S)
        Z = np.concatenate((Z, S[:r]))
    return Z[:d]


def keccak(c, N, d):
    """Keccak with capacity c and output length d on bit array N."""
    return sponge(1600 - c, N, d)


def sha3(M, d=256, c=None):
    """SHA3 hash (domain bits 01) of bit array M, output length d."""
    if c is None:
        c = 2 * d
    N = np.concatenate((M, np.array([0, 1])))
    return keccak(c, N, d)


def shake(M, d, c=256):
    """SHAKE[c//2] (domain bits 1111) of bit array M, output length d."""
    N = np.concatenate((M, np.array([1, 1, 1, 1])))
    return keccak(c, N, d)


def bytes_to_bits(data: bytes):
    """Bytes to LSB-first bit array (FIPS 202 string-to-bits)."""
    return np.array([(b >> i) & 1 for b in data for i in range(8)],
                    dtype=object)


def bits_to_bytes(bits):
    """LSB-first bit list/array back to bytes."""
    out = bytearray()
    bits = [int(b) for b in np.asarray(bits, dtype=object).reshape(-1)]
    for i in range(0, len(bits), 8):
        v = 0
        for j in range(8):
            v |= bits[i + j] << j
        out.append(v)
    return bytes(out)


def xprint(text, s):
    """Open secure bit array s and print it as a hex string; return it."""
    s = mpc.run(mpc.output(s, raw=True)).value
    h = bits_to_bytes(np.asarray(s, dtype=object).reshape(-1)).hex()
    print(text, h)
    return h


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-i', type=str, metavar='I', default='hello123',
                        help='input string I (default "hello123")')
    parser.add_argument('-n', type=int, metavar='N', default=1,
                        help='number of times N to repeat input I')
    parser.add_argument('--shake', action='store_true',
                        help='apply SHAKE instead of SHA3')
    parser.add_argument('-d', type=int, metavar='D', default=0,
                        help='output length D (default 256 SHA3 / 512 SHAKE)')
    parser.add_argument('-c', type=int, metavar='C', default=512,
                        help='capacity C (default 512)')
    args, _ = parser.parse_known_args()

    d = args.d or (512 if args.shake else 256)
    c = args.c
    data = args.i.encode() * args.n

    mpc.run(mpc.start())

    # party 0 secret-shares the message bits
    M = mpc.input(secfld.array(bytes_to_bits(data)), senders=0)

    t0 = time.time()
    if args.shake:
        digest_bits = shake(M, d, c)
        expect = {128: hashlib.shake_128,
                  256: hashlib.shake_256}[c // 2](data).digest(d // 8)
        name = f'SHAKE{c // 2}'
    else:
        digest_bits = sha3(M, d, c)
        expect = getattr(hashlib, f'sha3_{d}')(data).digest()
        name = f'SHA3-{d}'
    digest = bits_to_bytes(
        mpc.run(mpc.output(digest_bits, raw=True)).value)
    ok = digest == expect
    print(f'party {mpc.pid}: {name}({data!r}) '
          f'{"OK" if ok else "FAILED"} in {time.time() - t0:.2f}s')
    print('digest:', digest.hex())
    assert ok, (digest.hex(), expect.hex())

    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
