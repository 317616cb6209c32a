"""Demo: oblivious sorting with full secrecy.

Counterpart of the reference demos/sort.py: secret-shared lists are
obliviously shuffled and then sorted (Batcher merge-exchange under the
hood), exercising three surfaces: mpc.sorted() with a key function,
seclist.sort() in place, and the array-first mpc.np_sort() — the batched
path this TPU build favors (one comparison round per Batcher stage for
the whole vector).

Usage: python demos/sort.py [-M m] [n]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from mpyc_tpu.runtime import mpc


def demo_sorted_with_key(values):
    secint = mpc.SecInt()
    print('Using secure integers:', secint.__name__)
    xs = [secint(v) for v in values]
    mpc.random.shuffle(secint, xs)          # oblivious in-place shuffle
    print('Randomly shuffled input:', mpc.run(mpc.output(xs)))
    by_abs = mpc.sorted(xs, key=lambda a: a**2)
    opened = [int(v) for v in mpc.run(mpc.output(by_abs))]
    print('Sorted by absolute value:', opened)
    assert opened == sorted(values, key=abs), opened


def demo_seclist_descending(values):
    secfxp = mpc.SecFxp()
    print('Using secure fixed-point numbers:', secfxp.__name__)
    xs = [secfxp(v + 0.5) for v in values]
    mpc.random.shuffle(secfxp, xs)
    print('Randomly shuffled input:', mpc.run(mpc.output(xs)))
    lst = mpc.seclist(xs)
    lst.sort(reverse=True)                  # in-place, descending
    opened = [float(v) for v in mpc.run(mpc.output(list(lst)))]
    print('Sorted by descending value:', opened)
    assert opened == sorted((v + 0.5 for v in values), reverse=True), opened


def demo_np_sort(values):
    secint = mpc.SecInt()
    print('Using secure integer arrays:', secint.__name__)
    arr = mpc.input(secint.array(np.array(values, dtype=object)), senders=0)
    asc = mpc.np_sort(arr)
    opened = [int(v) for v in np.asarray(mpc.run(mpc.output(asc)))]
    print('np_sort ascending:', opened)
    assert opened == sorted(values), opened


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith('-')]
    n = int(pos[0]) if pos else 5
    if not pos:
        print('Setting input to default =', n)

    # alternating-sign ramp, e.g. n=5: [4, -9, 16, -25, 36]
    values = [(i + n // 2) ** 2 * (1 if i % 2 == 0 else -1) for i in range(n)]

    mpc.run(mpc.start())
    demo_sorted_with_key(values)
    demo_seclist_descending(values)
    demo_np_sort(values)
    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
