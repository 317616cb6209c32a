"""Demo: threshold one-way hash chains, vectorized, with a SHAKE128 option.

Counterpart of the reference demos/np_onewayhashchains.py: next to the
Matyas-Meyer-Oseas one-way function built from threshold AES (f(x) =
AES_K(x) + x on secure GF(2^8) states), the SHAKE128 one-way function from
the SHA3 family is available with --sha3: f(x) = SHAKE128(x, 128) on a
secure 128-bit GF(2) vector, evaluated entirely on secret-shared bits (24
batched 1600-bit secure multiplications per hash).

The chain x0, f(x0), ..., f^(n-1)(x0) of length n = 2^k is generated
forward and revealed in reverse with optimal binary pebbling (about k/2
hashes per output round, O(k) states stored — demos/pebbling.py holds the
scheduler shared with onewayhashchains.py).

Usage: python demos/np_onewayhashchains.py [-M m] [-k K] [--eager]
         [--sha3] [--no-one-way] [--no-random-seed]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.runtime import mpc
import aes       # secure (4, 4) arrays over GF(2^8)
import sha3      # secure bit arrays over GF(2)
import pebbling


def open_hex_aes(label, state):
    """Open a secure AES state and print it as a hex string."""
    out = mpc.run(mpc.output(state, raw=True))
    print(label, bytes(int(v) for v in out.value.T.reshape(-1)).hex())


def build_f(args):
    """One-way function over the selected secure representation."""
    if args.no_one_way:
        if args.sha3:
            import numpy as np
            return lambda x: np.roll(x, 1)
        return lambda x: mpc.np_roll(x * 3, 1, axis=0)
    if args.sha3:
        return lambda x: sha3.shake(x, 128)
    iv = mpc.np_fromlist([aes.secfld(3)] * 16).reshape(4, 4)
    round_keys = aes.key_expansion(iv)
    return lambda x: aes.encrypt(round_keys, x) + x


def build_seed(args, secfld):
    """Fixed IV or 128 jointly random secret bits, in the chosen shape."""
    if args.no_random_seed:
        if args.sha3:
            bits = sha3.bytes_to_bits(bytes([3] * 16))
            return mpc.input(secfld.array(bits), senders=0)
        return mpc.np_fromlist([secfld(3)] * 16).reshape(4, 4)
    bits = mpc.np_random_bits(secfld, 128)
    if args.sha3:
        return bits
    return mpc.np_from_bits(bits.reshape(4, 4, 8))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-k', '--order', type=int, metavar='K', default=1,
                        help='order K of hash chain, length n=2**K')
    parser.add_argument('--eager', '--recursive', action='store_true',
                        dest='eager',
                        help='use the simple speed-1 pebbling schedule')
    parser.add_argument('--sha3', action='store_true',
                        help='use SHAKE128 as one-way function')
    parser.add_argument('--no-one-way', action='store_true',
                        help='use dummy one-way function')
    parser.add_argument('--no-random-seed', action='store_true',
                        help='use fixed seed')
    args, _ = parser.parse_known_args()

    mpc.run(mpc.start())

    secfld = sha3.secfld if args.sha3 else aes.secfld
    f = build_f(args)
    x0 = build_seed(args, secfld)
    open_hex = sha3.xprint if args.sha3 else open_hex_aes

    k = args.order
    n = 1 << k
    make = pebbling.reverse_chain_eager if args.eager \
        else pebbling.reverse_chain

    print(f'Hash chain of length {n}:')
    reversal = make(k, x0, f)
    for rnd, value in enumerate(reversal, start=1):
        if value is None:
            print(f'{rnd:4} -')                 # forward stage
        else:
            open_hex(f'{rnd:4} x{2 * n - 1 - rnd:<4} =', value)
    stats = reversal.stats
    print(f'Performed {stats.total} hashes in total '
          f'(peak {stats.round_peak} in one round).')

    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
