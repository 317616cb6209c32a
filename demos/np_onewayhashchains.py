"""Demo: threshold one-way hash chains, vectorized, with a SHAKE128 option.

Counterpart of the reference demos/np_onewayhashchains.py: next to the
Matyas-Meyer-Oseas one-way function built from threshold AES (f(x) =
AES_K(x) + x on secure GF(2^8) states), the SHAKE128 one-way function from
the SHA3 family is available with --sha3: f(x) = SHAKE128(x, 128) on a
secure 128-bit GF(2) vector, evaluated entirely on secret-shared bits (24
batched 1600-bit secure multiplications per hash).

The chain x0, f(x0), ..., f^(n-1)(x0) of length n = 2^k is generated
forward and revealed in reverse with Jakobsson-style optimal binary
pebbling (k/2 hashes per output round, k states stored); upcoming chain
elements remain secret.

Usage: python demos/np_onewayhashchains.py [-M m] [-k K] [--recursive]
         [--sha3] [--no-one-way] [--no-random-seed]
"""
import argparse
import itertools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from mpyc_tpu.runtime import mpc
import aes    # secure (4, 4) arrays over GF(2^8)
import sha3   # secure bit arrays over GF(2)

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


def xprint_aes(text, state):
    """Open a secure AES state and print it as a hex string."""
    out = mpc.run(mpc.output(state, raw=True))
    vals = [int(v) for v in out.value.T.reshape(-1)]
    print(text, bytes(vals).hex())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-k', '--order', type=int, metavar='K', default=1,
                        help='order K of hash chain, length n=2**K')
    parser.add_argument('--recursive', action='store_true',
                        help='use recursive pebbler')
    parser.add_argument('--sha3', action='store_true',
                        help='use SHAKE128 as one-way function')
    parser.add_argument('--no-one-way', action='store_true',
                        help='use dummy one-way function')
    parser.add_argument('--no-random-seed', action='store_true',
                        help='use fixed seed')
    args, _ = parser.parse_known_args()

    mpc.run(mpc.start())

    Pebbler = P if args.recursive else p

    secfld = sha3.secfld if args.sha3 else aes.secfld
    IV = np.array([[3] * 4] * 4)  # IV as 4x4 array of bytes

    global f
    if args.no_one_way:
        if args.sha3:
            f = lambda x: np.roll(x, 1)
        else:
            f = lambda x: mpc.np_roll(x * 3, 1, axis=0)
    elif args.sha3:
        f = lambda x: sha3.shake(x, 128)
    else:
        K = aes.key_expansion(
            mpc.np_fromlist([aes.secfld(3)] * 16).reshape(4, 4))
        f = lambda x: aes.encrypt(K, x) + x

    if args.no_random_seed:
        if args.sha3:
            # 4x4 array of bytes -> length-128 bit vector (LSB first)
            bits = sha3.bytes_to_bits(bytes(int(b) for b in IV.flat))
            x0 = mpc.input(secfld.array(bits), senders=0)
        else:
            x0 = mpc.np_fromlist([secfld(3)] * 16).reshape(4, 4)
    else:
        x0 = mpc.np_random_bits(secfld, 128)
        if not args.sha3:
            # length-128 bit vector -> 4x4 array of GF(2^8) bytes
            x0 = mpc.np_from_bits(x0.reshape(4, 4, 8))

    xprint = (lambda t, s: sha3.xprint(t, s)) if args.sha3 else xprint_aes

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
