"""Demo: secret index to secret unit vector.

Counterpart of the reference demos/indextounitvector.py: generate all
length-n unit vectors from secret indices, for secure prime fields,
integers, and fixed-point numbers, using both the built-in iterative
mpc.unit_vector() and the recursive secret_index() below.

Usage: python demos/indextounitvector.py [-M m] [n]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.runtime import mpc


def secret_index(a, n):
    """Return ath unit vector of length n, assuming 0 <= a < n."""

    def si1(a, n):
        """(a-1)st unit vector of length n-1 (1 <= a < n), or all-0 (a=0)."""
        if n == 1:
            x = []
        elif n == 2:
            x = [a]
        else:
            a2, b = divmod(a, 2)
            z = si1(a2, (n + 1) // 2)
            y = mpc.scalar_mul(b, z)
            x = [b - sum(y)] + [z[i//2] - y[i//2] if i % 2 == 0 else y[i//2]
                                for i in range(n - 2)]
        return x

    x = si1(a, n)
    return [type(a)(1) - sum(x)] + x


def xprint(n, f, sectype):
    print(f'Using {f.__name__} with type {sectype.__name__}:')
    for i in range(n):
        u = mpc.run(mpc.output(f(sectype(i), n)))
        print(i, u)
        expect = [0] * i + [1] + [0] * (n - 1 - i)
        assert [int(a) for a in u] == expect, (i, u)


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith('-')]
    if pos:
        n = int(pos[0])
    else:
        n = 10
        print('Setting input to default =', n)

    secfld = mpc.SecFld(min_order=max(len(mpc.parties) + 1, n))
    secint = mpc.SecInt()
    secfxp = mpc.SecFxp()

    mpc.run(mpc.start())
    xprint(n, mpc.unit_vector, secfld)
    # NB: secret_index does not work with secfld (divmod needs integers)
    xprint(n, mpc.unit_vector, secint)
    xprint(n, secret_index, secint)
    xprint(n, mpc.unit_vector, secfxp)
    xprint(n, secret_index, secfxp)
    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
