"""Demo: Threshold one-way hash chains with optimal binary pebbling.

Counterpart of the reference demos/onewayhashchains.py +
np_onewayhashchains.py: the parties jointly generate a secret random
seed, build a length-2^k hash chain with a one-way function based on
threshold AES (f(x) = AES_K(x) + x, Matyas-Meyer-Oseas style), and
reverse it with Jakobsson-style optimal binary pebbling: k/2 hashes per
output round while storing only k states.  The chain elements are
revealed one by one in reverse order; upcoming elements stay secret.

Usage: python demos/onewayhashchains.py [-M m] [-k K] [--recursive]
         [--no-one-way] [--no-random-seed]
"""
import argparse
import itertools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.runtime import mpc
from mpyc_tpu import random as mrandom
import aes  # the mpyc_tpu AES demo: secure (4, 4) arrays over GF(2^8)

f = None  # the one-way function, set in main()


def tS(k, r):
    """Hash counts of the optimal binary pebbling schedule."""
    if r < 2**(k-1):
        return 0

    return ((k + r) % 2 + k+1
            - ((2*r) % (2**(2**k - r).bit_length())).bit_length()) // 2


def P(k, x):
    """Recursive optimal binary pebbler: yields f^i(x), i=n-1..0, n=2^k."""
    y = [None]*k + [x]
    i = k
    g = 0
    for r in range(1, 2**k):
        for _ in range(tS(k, r)):
            z = y[i]
            if g == 0:
                i -= 1
                g = 2**i
            y[i] = f(z)
            g -= 1
        yield None
    yield y[0]
    for v in itertools.zip_longest(*(P(i-1, y[i]) for i in range(1, k+1))):
        yield next(filter(lambda a: a is not None, v))


def p(k, x):
    """Iterative optimal binary pebbler: yields f^i(x), i=n-1..0, n=2^k."""
    z = []
    y = x
    for h in range(2**k, 1, -1):
        if h & (h-1) == 0:
            z.insert(0, y)
        y = f(y)
        yield None
    yield y
    a = [None] * (k >> 1)
    v = 0
    for r in range(2**k - 1, 0, -1):
        yield z[0]
        c = r
        i = 0
        while ~c & 1:
            z[i] = z[i+1]
            i += 1
            c >>= 1
        i += 1
        c >>= 1
        if c & 1:
            a[v] = (i, 0)
            v += 1
        u = v
        w = (r & 1) + i+1
        while c:
            while ~c & 1:
                w += 1
                c >>= 1
            u -= 1
            q, g = a[u]
            for _ in range(w//2):
                y = z[q]
                if not g:
                    q -= 1
                    g = 2**q
                z[q] = f(y)
                g -= 1
            if q:
                a[u] = q, g
            else:
                v -= 1
            w = w & 1
            while c & 1:
                w += 1
                c >>= 1


def xprint(text, state):
    """Open a secure AES state and print it as a hex string."""
    out = mpc.run(mpc.output(state, raw=True))
    vals = [int(v) for v in out.value.T.reshape(-1)]
    print(text, bytes(vals).hex())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-k', '--order', type=int, metavar='K', default=1,
                        help='order K of hash chain, length n=2**K')
    parser.add_argument('--recursive', action='store_true')
    parser.add_argument('--no-one-way', action='store_true')
    parser.add_argument('--no-random-seed', action='store_true')
    args, _ = parser.parse_known_args()

    mpc.run(mpc.start())

    Pebbler = P if args.recursive else p

    secfld = aes.secfld
    IV = mpc.np_fromlist([secfld(3)] * 16).reshape(4, 4)
    global f
    if args.no_one_way:
        f = lambda x: mpc.np_roll(x * 3, 1, axis=0)
    else:
        K = aes.key_expansion(IV)
        f = lambda x: aes.encrypt(K, x) + x

    if args.no_random_seed:
        x0 = IV
    else:
        x0 = mpc.np_fromlist([mrandom.getrandbits(secfld, 8, bits=False)
                              for _ in range(16)]).reshape(4, 4)

    k = args.order
    print(f'Hash chain of length {2**k}:')
    r = 1
    for v in Pebbler(k, x0):
        if v is None:  # initial stage
            print(f'{r:4}', '-')
        else:          # output stage
            xprint(f'{r:4} x{2**(k+1) - 1 - r:<4} =', v)
        r += 1
    print(f'Performed {k * 2**(k-1)} hashes in total.')

    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
