"""Demo: SHA3-256 and SHAKE128 on secret-shared bits.

Counterpart of the reference demos/sha3.py: the Keccak-f[1600] permutation
evaluated on a secure GF(2) bit state — theta/rho/pi/iota are linear (XOR =
addition, rotations = rolls: local), chi costs one batched secure
multiplication of 1600-bit arrays per round (24 rounds total).

Self-checks against hashlib.

Usage: python demos/sha3.py [-M m] [--sim]
"""

import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import hashlib
import numpy as np

from mpyc_tpu.runtime import mpc

secbit = mpc.SecFld(2)

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


def keccak_f(A):
    """Keccak-f[1600] on secure bit array A of shape (5, 5, 64)."""
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
        # chi: one secure mul of the full state
        B1 = mpc.np_roll(B, -1, axis=0)
        B2 = mpc.np_roll(B, -2, axis=0)
        A = B + (B1 + 1) * B2
        # iota
        rc_bits = np.array([(RC[rnd] >> z) & 1 for z in range(64)],
                           dtype=object)
        A = mpc.np_update(A, (0, 0), A[0, 0] + secbit.array(rc_bits))
    return A


def _bytes_to_bits(data: bytes):
    return [((b >> i) & 1) for b in data for i in range(8)]


def _bits_to_bytes(bits):
    out = bytearray()
    for i in range(0, len(bits), 8):
        v = 0
        for j in range(8):
            v |= int(bits[i + j]) << j
        out.append(v)
    return bytes(out)


def sponge(rate_bytes, domain, data: bytes, out_bytes: int):
    """Keccak sponge on secret-shared input bits."""
    # pad10*1 with domain bits
    q = rate_bytes - (len(data) % rate_bytes)
    padded = bytearray(data) + bytearray(q)
    padded[len(data)] = domain
    padded[-1] |= 0x80
    msg_bits = _bytes_to_bits(bytes(padded))

    # secret-share the message (party 0 inputs)
    state = None  # (5, 5, 64) secure bits
    zero_state = secbit.array(np.zeros((5, 5, 64), dtype=object))
    state = mpc.input(zero_state, senders=0)  # start from shared zero state
    n_blocks = len(padded) // rate_bytes
    for blk in range(n_blocks):
        block_bits = msg_bits[blk * rate_bytes * 8:(blk + 1) * rate_bytes * 8]
        lane_mat = np.zeros((5, 5, 64), dtype=object)
        for i in range(rate_bytes * 8):
            lane = i // 64
            x, y = lane % 5, lane // 5
            lane_mat[x, y, i % 64] = block_bits[i]
        sec_block = mpc.input(secbit.array(lane_mat), senders=0)
        state = state + sec_block
        state = keccak_f(state)

    # squeeze
    out_bits = []
    while len(out_bits) < out_bytes * 8:
        opened = mpc.run(mpc.output(state, raw=True)).value
        for i in range(rate_bytes * 8):
            lane = i // 64
            x, y = lane % 5, lane // 5
            out_bits.append(int(opened[x, y, i % 64]))
            if len(out_bits) == out_bytes * 8:
                break
        if len(out_bits) < out_bytes * 8:
            state = keccak_f(state)
    return _bits_to_bytes(out_bits)


def main():
    mpc.run(mpc.start())
    data = b'abc'

    t0 = time.time()
    digest = sponge(136, 0x06, data, 32)       # SHA3-256
    expect = hashlib.sha3_256(data).digest()
    ok1 = digest == expect
    print(f'party {mpc.pid}: SHA3-256("abc") '
          f'{"OK" if ok1 else "FAILED"} in {time.time() - t0:.2f}s')
    print('digest:', digest.hex())
    assert ok1, (digest.hex(), expect.hex())

    t0 = time.time()
    digest = sponge(168, 0x1F, data, 32)       # SHAKE128, 32 bytes
    expect = hashlib.shake_128(data).digest(32)
    ok2 = digest == expect
    print(f'party {mpc.pid}: SHAKE128("abc") '
          f'{"OK" if ok2 else "FAILED"} in {time.time() - t0:.2f}s')
    assert ok2

    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
