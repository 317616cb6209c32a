"""Demo: hello world — every party secret-shares a greeting ordinal.

Counterpart of the reference demos/helloworld.py: sanity-checks start/
input/output/shutdown across parties.

Usage: python demos/helloworld.py [-M m] [--sim]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.runtime import mpc


def main():
    mpc.run(mpc.start())
    secint = mpc.SecInt()
    m = len(mpc.parties)
    xs = mpc.input_each(lambda i: secint(i + 1))
    total = mpc.run(mpc.output(mpc.sum(xs)))
    expect = m * (m + 1) // 2
    print(f'party {mpc.pid}: sum of greetings = {total} '
          f'{"OK" if total == expect else "FAILED"}')
    assert total == expect
    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
