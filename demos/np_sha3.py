"""Demo: batched SHA3 / SHAKE on secret-shared bits — b digests at once.

TPU-first extension of demos/sha3.py (the reference has only the scalar
demo, /root/reference/demos/sha3.py): the Keccak-f[1600] state carries a
leading batch axis, so b independent messages absorb, permute, and
squeeze simultaneously. Per round, theta/rho/pi/iota stay linear
(local XOR/rolls over GF(2)), and chi is ONE batched secure
multiplication of the whole (b, 5, 5, 64) bit state — on the co-located
plane a single fused GF(2) round (models/pipelines.make_reshare2_step),
so the message-round count is constant in b and the per-digest cost
drops with batch size.

Everything stays secret-shared end to end; digests are opened only for
the hashlib self-check.

Usage: python demos/np_sha3.py [-M m] [--sim] [-b B] [-d D] [--shake]
         [--bench]
"""

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from mpyc_tpu.runtime import mpc
from sha3 import RC, ROT, bytes_to_bits, bits_to_bytes

secfld = mpc.SecFld(2)


def keccak_rounds_batch(A):
    """Keccak-f[1600] on a secure bit array A of shape (b, 5, 5, 64).

    Axis layout (batch, x, y, z); 24 rounds, one secure mul each (chi).
    """
    for rnd in range(24):
        # theta: column parities, all-batch at once (sum over y)
        C = A.sum(axis=2)                              # (b, 5, 64)
        D = mpc.np_stack(
            [C[:, (x + 4) % 5] + mpc.np_roll(C[:, (x + 1) % 5], 1, axis=-1)
             for x in range(5)], axis=1)               # (b, 5, 64)
        A = A + mpc.np_reshape(D, D.shape[:2] + (1, 64))
        # rho + pi: static rotations / lane permutation (local); same
        # index structure as the scalar demo, batch axis in front
        B_cols = [[None] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                B_cols[y][(2 * x + 3 * y) % 5] = mpc.np_roll(
                    A[:, x, y], ROT[x][y], axis=-1)
        B = mpc.np_stack([mpc.np_stack(row, axis=1) for row in B_cols],
                         axis=1)
        # chi: one batched secure multiplication of the whole state
        B1 = mpc.np_roll(B, -1, axis=1)
        B2 = mpc.np_roll(B, -2, axis=1)
        A = B + (B1 + 1) * B2
        # iota: public round constant into lane (0, 0)
        rc = np.zeros((5, 5, 64), dtype=object)
        rc[0, 0] = [(RC[rnd] >> z) & 1 for z in range(64)]
        A = A + secfld.array(rc)
    return A


def keccak_f1600_batch(S):
    """Keccak-f[1600] on flat secure bit arrays S of shape (b, 1600)."""
    b = S.shape[0]
    A = mpc.np_transpose(mpc.np_reshape(S, (b, 5, 5, 64)), (0, 2, 1, 3))
    A = keccak_rounds_batch(A)
    return mpc.np_reshape(mpc.np_transpose(A, (0, 2, 1, 3)), (b, 1600))


def sponge_batch(r, N, d):
    """Sponge with rate r over a batch of equal-length bit arrays (b, n)."""
    b, n = N.shape
    pad = np.tile(np.array([1] + [0] * ((-(n + 2)) % r) + [1],
                           dtype=object), (b, 1))
    P = mpc.np_concatenate((N, secfld.array(pad)), axis=1)
    blocks = P.shape[1] // r

    # first absorbed block XORs into the all-zero state directly
    cap0 = secfld.array(np.zeros((b, 1600 - r), dtype=object))
    S = keccak_f1600_batch(mpc.np_concatenate((P[:, :r], cap0), axis=1))
    for i in range(1, blocks):
        U = P[:, i * r:(i + 1) * r] + S[:, :r]
        S = keccak_f1600_batch(mpc.np_concatenate((U, S[:, r:]), axis=1))

    Z = S[:, :r]
    while Z.shape[1] < d:
        S = keccak_f1600_batch(S)
        Z = mpc.np_concatenate((Z, S[:, :r]), axis=1)
    return Z[:, :d]


def np_sha3(M, d=256, c=None):
    """SHA3-d over a batch of equal-length secure bit arrays (b, n)."""
    if c is None:
        c = 2 * d
    b = M.shape[0]
    dom = secfld.array(np.tile(np.array([0, 1], dtype=object), (b, 1)))
    return sponge_batch(1600 - c, mpc.np_concatenate((M, dom), axis=1), d)


def np_shake(M, d, c=256):
    """SHAKE[c//2] over a batch of equal-length secure bit arrays."""
    b = M.shape[0]
    dom = secfld.array(np.tile(np.array([1, 1, 1, 1], dtype=object),
                            (b, 1)))
    return sponge_batch(1600 - c, mpc.np_concatenate((M, dom), axis=1), d)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-b', '--batch', type=int, metavar='B', default=8,
                        help='number of messages hashed at once (default 8)')
    parser.add_argument('-d', type=int, metavar='D', default=256,
                        help='digest length D in bits (default 256)')
    parser.add_argument('--shake', action='store_true',
                        help='SHAKE128 instead of SHA3')
    parser.add_argument('--bench', action='store_true',
                        help='print one JSON line with ms per digest')
    args, _ = parser.parse_known_args()

    b, d = args.batch, args.d
    msgs = [f'message #{i:04d}'.encode() for i in range(b)]
    bits = np.stack([bytes_to_bits(m) for m in msgs])   # (b, n)

    mpc.run(mpc.start())
    M = mpc.input(secfld.array(bits), senders=0)

    def run_once():
        if args.shake:
            return np_shake(M, d, c=256), 'SHAKE128', \
                [hashlib.shake_128(m).digest(d // 8) for m in msgs]
        return np_sha3(M, d), f'SHA3-{d}', \
            [getattr(hashlib, f'sha3_{d}')(m).digest() for m in msgs]

    if args.bench:
        # warm pass: first-call costs (trace-cache loads, per-shape
        # executable deserialization, ~25 ms x ~200 programs) are
        # startup, not digest throughput — report steady state, so the
        # committed number reproduces in any warmed process
        digests, name, expect = run_once()
        mpc.run(mpc.output(digests, raw=True))
    t0 = time.time()
    digests, name, expect = run_once()
    opened = mpc.run(mpc.output(digests, raw=True)).value
    dt = time.time() - t0
    got = [bits_to_bytes(opened[i]) for i in range(b)]
    ok = got == expect
    if args.bench and mpc.pid == 0:
        print(json.dumps({'np_sha3_ms_per_digest': round(1e3 * dt / b, 3),
                          'batch': b, 'ok': ok}))
    else:
        print(f'party {mpc.pid}: {name} x{b} batch '
              f'{"OK" if ok else "FAILED"} in {dt:.2f}s '
              f'({1e3 * dt / b:.1f} ms/digest)')
        print('digest[0]:', got[0].hex())
    assert ok, (got[0].hex(), expect[0].hex())
    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
