"""Demo: Secret Santa — jointly draw a random derangement.

Counterpart of the reference demos/secretsanta.py: the parties compute a
uniformly random derangement of 0..n-1 without anyone learning the full
assignment during the protocol (opened at the end for the demo).

Usage: python demos/secretsanta.py [-M m] [--sim] [-n N]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.runtime import mpc
from mpyc_tpu import random as mrandom


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-n', type=int, default=5)
    args, _ = parser.parse_known_args()
    n = args.n

    mpc.run(mpc.start())
    secint = mpc.SecInt()
    for trial in range(3):
        der = mrandom.random_derangement(secint, n)
        got = [mpc.run(mpc.output(v)) for v in der]
        ok = sorted(got) == list(range(n)) and \
            all(g != i for i, g in enumerate(got))
        print(f'party {mpc.pid}: derangement {got} '
              f'{"OK" if ok else "FAILED"}')
        assert ok
    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
