"""Demo: parallel sorting of secret-shared inputs.

Counterpart of the reference demos/parallelsort.py: each party inputs a
random value per type; the parties sort all inputs obliviously (vectorized
Batcher network) and open the sorted sequence.

Usage: python demos/parallelsort.py [-M m] [--sim]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from mpyc_tpu.runtime import mpc


def main():
    mpc.run(mpc.start())
    m = len(mpc.parties)

    for name, sectype, mk in (
            ('secint32', mpc.SecInt(32), lambda i: (i * 37) % 11 - 5),
            ('secfxp32', mpc.SecFxp(32), lambda i: ((i * 37) % 11 - 5) / 4)):
        xs = mpc.input_each(lambda i: sectype(mk(i)))
        arr = mpc.np_fromlist(xs)
        srt = mpc.np_sort(arr)
        got = list(mpc.run(mpc.output(srt)))
        expect = sorted(mk(i) for i in range(m))
        ok = all(abs(float(g) - float(e)) < 1e-6
                 for g, e in zip(got, expect))
        print(f'party {mpc.pid}: {name} sorted {got} '
              f'{"OK" if ok else "FAILED"}')
        assert ok, (got, expect)
    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
