"""Demo: threshold AES-128 encryption/decryption with secret key and state.

Counterpart of the reference demos/aes.py + demos/np_aes.py: AES operations
over the secure field GF(2^8) (modulus x^8+x^4+x^3+x+1), with the S-box as
x^254 (11 secure multiplications) followed by a public GF(2) affine map on
the bit decomposition (one masked-open round).

Self-checks against the FIPS-197 appendix vectors.

Usage: python demos/aes.py [-M m] [--sim] [-k K]
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from mpyc_tpu.runtime import mpc

secfld = mpc.SecFld(char=2, min_order=256)  # GF(2^8) with AES modulus 0x11B


def sbox(x, inverse=False):
    """AES S-box: inversion in GF(2^8) + affine map over GF(2)."""
    if not inverse:
        y = x ** 254
        bits = mpc.np_to_bits(y, 8)
        # affine: b'_i = b_i + b_{i+4} + b_{i+5} + b_{i+6} + b_{i+7} + c_i
        nb = []
        for i in range(8):
            t = bits[..., i] + bits[..., (i + 4) % 8] + \
                bits[..., (i + 5) % 8] + bits[..., (i + 6) % 8] + \
                bits[..., (i + 7) % 8]
            if (0x63 >> i) & 1:
                t = t + 1
            nb.append(mpc.np_reshape(t, t.shape + (1,)))
        out_bits = mpc.np_concatenate(nb, axis=-1)
        return mpc.np_from_bits(out_bits)
    # inverse: undo affine, then invert
    bits = mpc.np_to_bits(x, 8)
    nb = []
    for i in range(8):
        t = bits[..., (i + 2) % 8] + bits[..., (i + 5) % 8] + \
            bits[..., (i + 7) % 8]
        if (0x05 >> i) & 1:
            t = t + 1
        nb.append(mpc.np_reshape(t, t.shape + (1,)))
    y = mpc.np_from_bits(mpc.np_concatenate(nb, axis=-1))
    return y ** 254


def shift_rows(s, inverse=False):
    rows = [mpc.np_roll(s[i], -i if not inverse else i) for i in range(4)]
    return mpc.np_stack(rows, axis=0)


def mix_columns(s, inverse=False):
    if not inverse:
        coefs = (2, 3, 1, 1)
    else:
        coefs = (14, 11, 13, 9)
    rows = []
    for r in range(4):
        acc = None
        for k in range(4):
            term = s[(r + k) % 4] * coefs[k]
            acc = term if acc is None else acc + term
        rows.append(acc)
    return mpc.np_stack(rows, axis=0)


def add_round_key(s, rk):
    return s + rk


def key_expansion(k):
    """Expand (4, 4) secret key into 11 round keys (4, 4) each."""
    rcon = 1
    keys = [k]
    w = [k[:, j] for j in range(4)]  # columns, each (4,)
    for r in range(1, 11):
        t = mpc.np_roll(w[-1], -1)
        t = sbox(t)
        t = t + mpc.np_fromlist(
            [secfld(rcon), secfld(0), secfld(0), secfld(0)])
        rcon = (rcon << 1) ^ 0x11B if rcon & 0x80 else rcon << 1
        new_cols = []
        prev = t
        for j in range(4):
            c = w[-4 + j] + prev
            new_cols.append(c)
            prev = c
        w.extend(new_cols)
        keys.append(mpc.np_stack(new_cols, axis=1))
    return keys


def encrypt(keys, s):
    s = add_round_key(s, keys[0])
    for r in range(1, 11):
        s = sbox(s)
        s = shift_rows(s)
        if r < 10:
            s = mix_columns(s)
        s = add_round_key(s, keys[r])
    return s


def decrypt(keys, s):
    for r in range(10, 0, -1):
        s = add_round_key(s, keys[r])
        if r < 10:
            s = mix_columns(s, inverse=True)
        s = shift_rows(s, inverse=True)
        s = sbox(s, inverse=True)
    return add_round_key(s, keys[0])


def to_state(bytes16):
    """16 bytes -> 4x4 column-major state matrix (FIPS-197 layout)."""
    return np.array(bytes16, dtype=object).reshape(4, 4).T


def from_state(mat):
    return [int(v) for v in np.asarray(mat, dtype=object).T.reshape(-1)]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-k', type=int, default=1,
                        help='number of blocks to encrypt')
    parser.parse_known_args()

    mpc.run(mpc.start())

    key_bytes = list(range(16))                     # 000102...0f
    pt_bytes = [0x00, 0x11, 0x22, 0x33, 0x44, 0x55, 0x66, 0x77,
                0x88, 0x99, 0xAA, 0xBB, 0xCC, 0xDD, 0xEE, 0xFF]
    expect_ct = [0x69, 0xC4, 0xE0, 0xD8, 0x6A, 0x7B, 0x04, 0x30,
                 0xD8, 0xCD, 0xB7, 0x80, 0x70, 0xB4, 0xC5, 0x5A]

    k = mpc.input(secfld.array(to_state(key_bytes)), senders=0)
    p = mpc.input(secfld.array(to_state(pt_bytes)), senders=0)

    mpc.barrier()
    import time
    t0 = time.time()
    keys = key_expansion(k)
    c = encrypt(keys, p)
    ct = from_state(mpc.run(mpc.output(c, raw=True)).value)
    elapsed = time.time() - t0
    ok = ct == expect_ct
    print(f'party {mpc.pid}: AES-128 encrypt '
          f'{"OK" if ok else "FAILED"} in {elapsed:.2f}s')
    print('ciphertext:', bytes(ct).hex())
    assert ok, (ct, expect_ct)

    t0 = time.time()
    p2 = decrypt(keys, c)
    pt2 = from_state(mpc.run(mpc.output(p2, raw=True)).value)
    ok = pt2 == pt_bytes
    print(f'party {mpc.pid}: AES-128 decrypt '
          f'{"OK" if ok else "FAILED"} in {time.time() - t0:.2f}s')
    assert ok

    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
