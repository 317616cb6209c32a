"""Demo: oblivious sorting with full secrecy.

Counterpart of the reference demos/sort.py: randomly shuffled
secret-shared lists of numbers (integers and fixed-point) are sorted
with mpc.sorted() (Batcher merge-exchange, key support) and with
seclist.sort() in-place (descending).

Usage: python demos/sort.py [-M m] [n]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.runtime import mpc


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith('-')]
    if pos:
        n = int(pos[0])
    else:
        n = 5
        print('Setting input to default =', n)

    s = [(-1)**i * (i + n//2)**2 for i in range(n)]

    mpc.run(mpc.start())

    secnum = mpc.SecInt()
    print('Using secure integers:', secnum.__name__)
    x = list(map(secnum, s))
    mpc.random.shuffle(secnum, x)  # secret in-place random shuffle
    print('Randomly shuffled input:', mpc.run(mpc.output(x)))
    x = mpc.sorted(x, key=lambda a: a**2)  # sort on absolute value
    got = mpc.run(mpc.output(x))
    print('Sorted by absolute value:', got)
    assert [int(a) for a in got] == sorted(s, key=lambda a: a * a), got

    secnum = mpc.SecFxp()
    print('Using secure fixed-point numbers:', secnum.__name__)
    x = list(map(secnum, s))
    mpc.random.shuffle(secnum, x)
    print('Randomly shuffled input:', mpc.run(mpc.output(x)))
    x = mpc.seclist(x)
    x.sort(reverse=True)  # in-place sort in descending order
    got = mpc.run(mpc.output(list(x)))
    print('Sorted by descending value:', got)
    assert [float(a) for a in got] == sorted(map(float, s), reverse=True), got

    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
