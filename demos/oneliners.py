"""Demo: MPyC-TPU oneliners.

Counterpart of the reference demos/oneliners.py.  Run with m parties to
compute, from each party's one-line contribution:

 - m    =  sum_{i=0}^{m-1} 1
 - m**2 =  sum_{i=0}^{m-1} 2i+1
 - 2**m = prod_{i=0}^{m-1} 2
 - m!   = prod_{i=0}^{m-1} i+1

Bit lengths of the secure integers ensure each result fits for any m >= 1.

Usage: python demos/oneliners.py [-M m]
"""
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.runtime import mpc


def main():
    m = len(mpc.parties)
    l = m.bit_length()

    mpc.run(mpc.start())
    r1 = mpc.run(mpc.output(mpc.sum(
        mpc.input_each(lambda i: mpc.SecInt(l + 1)(1)))))
    print('m    =', r1)
    r2 = mpc.run(mpc.output(mpc.sum(
        mpc.input_each(lambda i: mpc.SecInt(2*l + 1)(2*i + 1)))))
    print('m**2 =', r2)
    r3 = mpc.run(mpc.output(mpc.prod(
        mpc.input_each(lambda i: mpc.SecInt(m + 2)(2)))))
    print('2**m =', r3)
    r4 = mpc.run(mpc.output(mpc.prod(
        mpc.input_each(lambda i: mpc.SecInt(int(m*(l - 1.4) + 3))(i + 1)))))
    print('m!   =', r4)
    mpc.run(mpc.shutdown())

    assert (int(r1), int(r2), int(r3), int(r4)) == \
        (m, m**2, 2**m, math.factorial(m)), (r1, r2, r3, r4)


if __name__ == '__main__':
    main()
