"""Demo: Threshold one-way hash chains with optimal binary pebbling.

Counterpart of the reference demos/onewayhashchains.py: the parties
jointly generate a secret random seed, build a length-2^k hash chain with
a one-way function based on threshold AES (f(x) = AES_K(x) + x,
Matyas-Meyer-Oseas style), and reverse it with optimal binary pebbling —
about k/2 hashes per output round while storing only O(k) states (see
demos/pebbling.py for the scheduler).  The chain elements are revealed
one by one in reverse order; upcoming elements stay secret.

Usage: python demos/onewayhashchains.py [-M m] [-k K] [--eager]
         [--no-one-way] [--no-random-seed]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.runtime import mpc
from mpyc_tpu import random as mrandom
import aes       # the mpyc_tpu AES demo: secure (4, 4) arrays over GF(2^8)
import pebbling


def open_hex(label, state):
    """Open a secure AES state and print it as a hex string."""
    out = mpc.run(mpc.output(state, raw=True))
    print(label, bytes(int(v) for v in out.value.T.reshape(-1)).hex())


def one_way_from_args(args):
    """Build the one-way function f over secure AES states."""
    if args.no_one_way:
        return lambda x: mpc.np_roll(x * 3, 1, axis=0)
    iv = mpc.np_fromlist([aes.secfld(3)] * 16).reshape(4, 4)
    round_keys = aes.key_expansion(iv)
    return lambda x: aes.encrypt(round_keys, x) + x


def seed_from_args(args):
    """Fixed IV or a jointly generated uniformly random secret state."""
    if args.no_random_seed:
        return mpc.np_fromlist([aes.secfld(3)] * 16).reshape(4, 4)
    cells = [mrandom.getrandbits(aes.secfld, 8, bits=False)
             for _ in range(16)]
    return mpc.np_fromlist(cells).reshape(4, 4)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-k', '--order', type=int, metavar='K', default=1,
                        help='order K of hash chain, length n=2**K')
    parser.add_argument('--eager', '--recursive', action='store_true',
                        dest='eager',
                        help='use the simple speed-1 pebbling schedule')
    parser.add_argument('--no-one-way', action='store_true',
                        help='use dummy one-way function')
    parser.add_argument('--no-random-seed', action='store_true',
                        help='use fixed seed')
    args, _ = parser.parse_known_args()

    mpc.run(mpc.start())

    f = one_way_from_args(args)
    x0 = seed_from_args(args)
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
