"""Demo: threshold AES, fully vectorized — AES-128 and AES-256, batched blocks.

Counterpart of the reference demos/np_aes.py (which vectorizes aes.py with
secure GF(2^8) arrays; see reference demos/np_aes.py:1-14): every S-box of a
round is evaluated in one go as a secure array power x**254 followed by a
public GF(2) affine map, and MixColumns is a public 4x4 circulant matrix
product over GF(2^8).

TPU-first extension beyond the reference: a leading *block* axis.  The state
is a secure (b, 4, 4) array, so b blocks are en/decrypted simultaneously —
the round count stays that of a single block while all field kernels and the
masked bit-decomposition openings batch across blocks (one message round per
S-box layer regardless of b).  Select with -b/--blocks.

Self-checks: FIPS-197 Appendix C.1 (AES-128) and C.3 (AES-256) vectors.

Usage: python demos/np_aes.py [-M m] [--sim] [-b BLOCKS] [-1]
  -1 restricts to AES-128 encryption only (like the reference's CLI arg).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from mpyc_tpu.runtime import mpc

secfld = mpc.SecFld(2**8)  # secure AES field GF(2^8), modulus x^8+x^4+x^3+x+1
f256 = secfld.field        # plain AES field for public constants


def circulant(r):
    """Circulant GF(2^8) matrix with first row r."""
    r = np.array(r, dtype=object)
    return f256.array(np.stack([np.roll(r, j) for j in range(len(r))]))


A = circulant([1, 0, 0, 0, 1, 1, 1, 1])   # S-box affine bit matrix over GF(2)
A1 = np.linalg.inv(A)
B = f256.array([1, 1, 0, 0, 0, 1, 1, 0])  # S-box affine constant (0x63 bits)
C = circulant([2, 3, 1, 1])               # MixColumns matrix over GF(2^8)
C1 = np.linalg.inv(C)


def sbox(x):
    """AES S-box on every entry of secure array x at once."""
    b = mpc.np_to_bits(x**254)
    b = (A @ b[..., np.newaxis]).reshape(*b.shape) + B
    return mpc.np_from_bits(b)


def sbox1(x):
    """AES inverse S-box on every entry of secure array x at once."""
    b = mpc.np_to_bits(x) + B
    b = (A1 @ b[..., np.newaxis]).reshape(*b.shape)
    return mpc.np_from_bits(b)**254


def key_expansion(k):
    """Key schedule for AES-128 (k: (4, 4)) or AES-256 (k: (4, 8))."""
    w = k
    Nk = k.shape[1]
    Nr = 10 if Nk == 4 else 14
    for i in range(Nk, 4 * (Nr + 1)):
        t = w[:, -1]
        if i % Nk in (0, 4):
            t = sbox(t)
        if i % Nk == 0:
            t = np.roll(t, -1, axis=0)
            t = mpc.np_update(t, 0, t[0] + (f256(1) << i // Nk - 1))
        t = t + w[:, -Nk]
        w = np.append(w, t.reshape(4, 1), axis=1)
    return np.hsplit(w, Nr + 1)


def shift_rows(s, inverse=False):
    """(Inverse) ShiftRows on batched state s of shape (b, 4, 4)."""
    sign = 1 if inverse else -1
    return np.stack([np.roll(s[:, j], sign * j, axis=-1) for j in range(4)],
                    axis=1)


def encrypt(K, s):
    """AES encryption of batched states s (b, 4, 4) under key schedule K."""
    Nr = len(K) - 1
    s = s + K[0]
    for i in range(1, Nr + 1):
        s = sbox(s)
        s = shift_rows(s)
        if i < Nr:
            s = C @ s
        s = s + K[i]
    return s


def decrypt(K, s):
    """AES decryption of batched states s (b, 4, 4) under key schedule K."""
    Nr = len(K) - 1
    for i in range(Nr, 0, -1):
        s = s + K[i]
        if i < Nr:
            s = C1 @ s
        s = shift_rows(s, inverse=True)
        s = sbox1(s)
    return s + K[0]


def to_states(blocks):
    """List of 16-byte blocks -> (b, 4, 4) column-major state array."""
    a = np.array(blocks, dtype=object).reshape(len(blocks), 4, 4)
    return np.swapaxes(a, 1, 2)


def from_states(a):
    """(b, 4, 4) state array -> list of 16-byte lists."""
    a = np.swapaxes(np.asarray(a, dtype=object), 1, 2)
    return [[int(v) for v in blk.reshape(-1)] for blk in a]


def open_hex(s):
    out = mpc.run(mpc.output(s, raw=True))
    return [bytes(b).hex() for b in from_states(out.value)]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-b', '--blocks', type=int, default=1,
                        help='number of blocks en/decrypted in one batch')
    parser.add_argument('-1', dest='only128', action='store_true',
                        help='AES-128 encryption only')
    args, _ = parser.parse_known_args()

    mpc.run(mpc.start())

    nb = max(1, args.blocks)
    # FIPS-197 appendix C plaintext 00112233445566778899aabbccddeeff,
    # batched: block j is the appendix block with every byte xored by j
    # (so all batch lanes are distinct but lane 0 matches the test vector).
    base_pt = list(bytes.fromhex('00112233445566778899aabbccddeeff'))
    pts = [[v ^ (j & 0xFF) for v in base_pt] for j in range(nb)]
    p = mpc.input(secfld.array(f256.array(to_states(pts))), senders=0)

    k128 = mpc.input(secfld.array(f256.array(to_states([list(range(16))])[0])),
                     senders=0)
    mpc.barrier()
    t0 = time.time()
    K = key_expansion(k128)
    c = encrypt(K, p)
    cts = open_hex(c)
    print(f'party {mpc.pid}: AES-128 x{nb} blocks in {time.time() - t0:.2f}s')
    print('AES-128 ciphertext:', cts[0])
    assert cts[0] == '69c4e0d86a7b0430d8cdb78070b4c55a', cts[0]

    if not args.only128:
        t0 = time.time()
        p2 = decrypt(K, c)
        pts2 = open_hex(p2)
        print(f'party {mpc.pid}: AES-128 decrypt x{nb} in '
              f'{time.time() - t0:.2f}s')
        assert pts2 == [bytes(b).hex() for b in pts]

        k256 = mpc.input(
            secfld.array(f256.array(
                np.swapaxes(np.array(list(range(32)), dtype=object)
                            .reshape(8, 4), 0, 1))),
            senders=0)
        t0 = time.time()
        K = key_expansion(k256)
        c = encrypt(K, p)
        cts = open_hex(c)
        print(f'party {mpc.pid}: AES-256 x{nb} blocks in '
              f'{time.time() - t0:.2f}s')
        print('AES-256 ciphertext:', cts[0])
        assert cts[0] == '8ea2b7ca516745bfeafc49904b496089', cts[0]
        p2 = decrypt(K, c)
        assert open_hex(p2) == [bytes(b).hex() for b in pts]
        print(f'party {mpc.pid}: AES-256 decrypt OK')

    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
