#!/usr/bin/env python
"""Tutorial: ways to do prefix-or — mpyc_tpu.mpctools.accumulate() explained.

Counterpart of the reference demos/PrefixOrExplained.py (notebook export):
a guided tour of prefix-or circuits over secret-shared bits, from the
trivial linear-depth chain to the log-depth Sklansky and Brent-Kung prefix
networks used by mpyc_tpu.mpctools.accumulate().

For secure computation the dominant cost of prefix-or over bits
x_0, ..., x_{n-1} is the ROUND complexity (circuit depth in secure
multiplications); the secondary cost is the WORK (number of secure
multiplications).  The variants below trade these off:

  variant                 depth          work
  1. chain (itertools)    n - 1          n - 1
  2. square-root blocks   ~2 sqrt(n)     ~2n
  3. Sklansky             ceil(log2 n)   (n/2) log2 n
  4. Brent-Kung           ~2 log2 n      ~2n
  5. accumulate()         picks 3 or 4 by a cost heuristic

Every variant is checked for correctness on all 2^n bit vectors of length
n = 8, and its depth/work are measured by instrumenting secure
multiplication.

Usage: python demos/PrefixOrExplained.py [-M m] [--sim]
"""
import itertools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.runtime import mpc
from mpyc_tpu import mpctools

secint = mpc.SecInt()


# ---------------------------------------------------------------------------
# Instrumentation.  Every variant below is built from one gate — the
# or-gate on secret bits, a | b = a + b - a*b, costing one secure
# multiplication (= one communication round when gates are sequential).
# We count gates (work) and tag each result with the longest chain of
# gates that produced it (depth = round complexity).

or_count = 0
depths = {}  # id(secint) -> or-gate depth (secure numbers have __slots__)


def or2(a, b):
    global or_count
    or_count += 1
    c = a + b - a * b
    depths[id(c)] = max(depths.get(id(a), 0), depths.get(id(b), 0)) + 1
    return c


def measure(prefix_fn, n=8):
    """(depth, work) of prefix_fn on n secret bits; also check all 2^n."""
    global or_count
    for bits in itertools.product([0, 1], repeat=n):
        x = [secint(b) for b in bits]
        or_count = 0
        depths.clear()
        y = prefix_fn(x)
        got = [int(mpc.run(mpc.output(v))) for v in y]
        expect = list(itertools.accumulate(bits, lambda a, b: a | b))
        assert got == expect, (bits, got, expect)
    depth = max((depths.get(id(v), 0) for v in y), default=0)
    work = or_count
    return depth, work


# 1. The obvious chain: y_i = y_{i-1} | x_i.  Depth n-1, work n-1.
#    This is what itertools.accumulate(x, or2) computes — correct, but the
#    n-1 multiplications are *sequential*: n-1 communication rounds.

def prefix_or_chain(x):
    return list(itertools.accumulate(x, or2))


# 2. Square-root blocking: split x into sqrt(n) blocks of sqrt(n) bits.
#    Chain within blocks, chain over block-ors, combine.  Depth O(sqrt n).
#    Shows that depth can be sublinear without increasing work much.

def prefix_or_sqrt(x):
    n = len(x)
    s = max(1, round(n ** 0.5))
    blocks = [x[i:i + s] for i in range(0, n, s)]
    inner = [prefix_or_chain(b) for b in blocks]           # within blocks
    heads = prefix_or_chain([b[-1] for b in inner[:-1]])   # over block-ors
    y = list(inner[0])
    for h, b in zip(heads, inner[1:]):
        y.extend(or2(h, v) for v in b)
    return y


# 3. Sklansky: divide and conquer; after solving both halves, or the last
#    prefix of the left half into EVERY prefix of the right half.  The
#    recursion depth is log2 n and all n/2 combine-gates of one level run
#    in the SAME round — minimal depth, but n/2 gates per level gives
#    (n/2) log2 n work.

def prefix_or_sklansky(x):
    n = len(x)
    if n == 1:
        return list(x)

    h = (n + 1) // 2
    left = prefix_or_sklansky(x[:h])
    right = prefix_or_sklansky(x[h:])
    t = left[-1]
    return left + [or2(t, v) for v in right]


# 4. Brent-Kung: one halving pass — or adjacent pairs, recurse on the n/2
#    pair-ors — and one expansion pass fixing up the odd positions.  Work
#    recurrence W(n) = W(n/2) + n-1 gives ~2n total, with depth ~2 log2 n.

def prefix_or_brent_kung(x):
    n = len(x)
    if n == 1:
        return list(x)

    pairs = [or2(x[i], x[i + 1]) for i in range(0, n - 1, 2)]
    inner = prefix_or_brent_kung(pairs)          # prefixes of even length
    y = [x[0]]
    for i in range(1, n):
        if i % 2:
            y.append(inner[i // 2])
        else:
            y.append(or2(inner[i // 2 - 1], x[i]))
    return y


# 5. The production version: mpctools.accumulate(x, f) implements both
#    networks for ANY associative f and picks one by a cost heuristic
#    (Brent-Kung when multiplications are the scarcer resource, e.g. with
#    --no-prss randomness; Sklansky otherwise).

def prefix_or_accumulate(x):
    return list(mpctools.accumulate(x, or2))


def main():
    mpc.run(mpc.start())

    print('all variants checked on all 256 bit vectors of length 8:')
    for name, fn in [('chain (itertools)  ', prefix_or_chain),
                     ('square-root blocks ', prefix_or_sqrt),
                     ('Sklansky           ', prefix_or_sklansky),
                     ('Brent-Kung         ', prefix_or_brent_kung),
                     ('accumulate()       ', prefix_or_accumulate)]:
        depth, work = measure(fn)
        print(f'  {name} depth {depth:2d}   work {work:2d}')

    # the general lesson: for associative f, depth O(log n) with linear
    # work is optimal in general — O(1)-depth tricks exist for prefix-or
    # specifically (via masking), but not for arbitrary f such as carry
    # propagation, matrix products, or group operations, which is why
    # accumulate() is the right building block.
    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
