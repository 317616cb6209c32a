#!/usr/bin/env python
"""Tutorial: Secret Santa — random derangements, built up from first principles.

Counterpart of the reference demos/SecretSantaExplained.py (notebook
export): how the secretsanta.py demo draws a uniformly random secret
DERANGEMENT — a permutation p with p(i) != i for all i, so nobody draws
their own name — without any party learning anything beyond their own
assignment.

The construction is layered, each layer built from the previous one:

  1. random_unit_vector(n): a secret [0,...,0,1,0,...,0] with the 1 in a
     uniformly random position — from log2(n) secret random bits.
  2. random_permutation(n): oblivious Fisher-Yates — position i swaps with
     a random position >= i, chosen by a secret unit vector; each swap is
     a linear update with one batched secure multiplication.
  3. random_derangement(n): rejection sampling — draw a permutation, test
     prod(p(i) - i) != 0 with ONE public zero test (the product reveals
     only whether some fixed point exists, which is exactly the rejection
     event), retry if zero.

Every stage is self-checked; the expected number of rejection rounds is
e ~ 2.72 independent of n (the share of derangements among permutations
tends to 1/e).

Usage: python demos/SecretSantaExplained.py [-M m] [--sim] [-n N]
"""
import argparse
import math
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.runtime import mpc

secint = mpc.SecInt()


# ---------------------------------------------------------------------------
# Stage 1: secret random unit vector of length n.
#
# Draw the bits of a random index one at a time, most significant first,
# expanding a unit vector: starting from u = [1], each secret bit b maps
# u -> [u*(1-b), u*b] (doubling the length); when n is not a power of two
# the overflowing half restarts (rejection-free for the caller: the loop
# below retries internally like mpyc_tpu.random.random_unit_vector).

def random_unit_vector(n):
    if n == 1:
        return [secint(1)]

    b = mpc.random_bit(secint)
    x = random_unit_vector((n + 1) // 2)
    z = mpc.scalar_mul(b, x)            # b*x: x if b=1, all-zero if b=0
    if n % 2 == 0:
        # 2m outcomes: b selects the low or high block of length m
        return z + mpc.vector_sub(x, z)

    # odd n = 2m-1: drop one outcome — reject when b=1 and x[0]=1
    # (probability 1/2m; only the rejection event is revealed)
    if mpc.run(mpc.output(z[0])):
        return random_unit_vector(n)

    return z[1:] + mpc.vector_sub(x, z)


# ---------------------------------------------------------------------------
# Stage 2: secret random permutation of 0..n-1 (oblivious Fisher-Yates).
#
# x starts as the identity; step i obliviously swaps x[i] with a random
# x[i + r], r uniform over 0..n-1-i, using the unit vector u selecting r:
#   x_u    = <x[i:], u>                 (the value moving to slot i)
#   x[i+j] = x[i+j] + u[j]*(x[i] - x[i+j])   (the value moving out)
# Each step is one scalar_mul + one in_prod: a constant number of rounds.

def random_permutation(n):
    x = [secint(i) for i in range(n)]
    for i in range(n - 1):
        u = random_unit_vector(n - i)
        x_u = mpc.in_prod(x[i:], u)
        d = mpc.scalar_mul(x[i] - x_u, u)
        x[i] = x_u
        for j in range(n - i):
            x[i + j] = x[i + j] + d[j]
    return x


# ---------------------------------------------------------------------------
# Stage 3: secret random derangement by rejection.
#
# t = prod(p(i) - i) is 0 iff p has a fixed point.  Opening ONLY the
# zero-ness of t (is_zero_public) leaks exactly the rejection event and
# nothing else; conditioned on acceptance the result is uniform over
# derangements.

def random_derangement(n, stats=None):
    while True:
        p = random_permutation(n)
        t = mpc.prod([p[i] - i for i in range(n)])
        if stats is not None:
            stats['trials'] += 1
        if not mpc.run(mpc.is_zero_public(t)):
            return p


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-n', type=int, default=5,
                        help='number of Secret Santa participants')
    args, _ = parser.parse_known_args()
    n = args.n

    mpc.run(mpc.start())

    print('stage 1: random unit vectors of length', n)
    hist = Counter()
    for _ in range(20):
        u = random_unit_vector(n)
        vals = [int(mpc.run(mpc.output(v))) for v in u]
        assert sum(vals) == 1 and all(v in (0, 1) for v in vals), vals
        hist[vals.index(1)] += 1
    print('  20 draws, position histogram:', dict(sorted(hist.items())))

    print('stage 2: random permutations')
    for _ in range(5):
        p = random_permutation(n)
        vals = [int(mpc.run(mpc.output(v))) for v in p]
        assert sorted(vals) == list(range(n)), vals
    print('  5 draws, all valid permutations, last:', vals)

    print('stage 3: random derangements (Secret Santa)')
    stats = {'trials': 0}
    draws = 5
    for _ in range(draws):
        p = random_derangement(n, stats)
        vals = [int(mpc.run(mpc.output(v))) for v in p]
        assert sorted(vals) == list(range(n)), vals
        assert all(v != i for i, v in enumerate(vals)), vals
        print('  ', vals)
    print(f'  {stats["trials"]} permutations drawn for {draws} derangements '
          f'(expected ratio ~e = {math.e:.2f})')

    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
