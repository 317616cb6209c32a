"""Demo: Linear Programming solver with exact secure integer arithmetic.

Counterpart of the reference demos/lpsolver.py (Toft FC 2009; Catrina &
de Hoogh ESORICS 2010): Simplex over secret-shared integer tableaus with
a common-denominator representation (integer pivoting), Dantzig pivot
selection via oblivious argmin over secure fractions, and FFT-style
solution extraction using an Nth root of unity in the underlying prime
field (basis registers stored as powers of w).  The primal/dual
solutions are verified exactly via LP duality.

Usage: python demos/lpsolver.py [-M m] [-i I] [-l L]
  datasets: 0=uvlp (default), 1=wiki, 2=tb2x2, 3=woody,
            4=LPExample_R20, 5=sc50b, 6=kb2, 7=LPExample
"""
import argparse
import csv
import logging
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.runtime import mpc

DATASETS = [('uvlp', 8, 1, 2),
            ('wiki', 6, 1, 1),
            ('tb2x2', 6, 1, 2),
            ('woody', 8, 1, 3),
            ('LPExample_R20', 70, 1, 9),
            ('sc50b', 104, 10, 55),
            ('kb2', 560, 100000, 154),
            ('LPExample', 110, 1, 175)]


def load_scaled_rows(name, scale):
    """CSV tableau -> integer rows (scaled, gcd-reduced per constraint)."""
    path = os.path.join(os.path.dirname(__file__), 'data', 'lp',
                        name + '.csv')
    with open(path) as fh:
        raw = [[float(v) if v else 0.0 for v in row]
               for row in csv.reader(fh)]
    raw[0][-1] = 0.0                       # objective starts at 0
    rows = [[int(scale * v) for v in row] for row in raw]
    for i in range(1, len(rows)):          # keep cost row unreduced
        g = max(math.gcd(*rows[i]), 1)
        rows[i] = [v // g for v in rows[i]]
    return rows


def geometric(first, ratio, n):
    """[first, first*ratio, ..., first*ratio^(n-1)] in ~2 log n rounds."""
    if n == 1:
        return [first]
    half = geometric(first, ratio * ratio, (n + 1) // 2)
    tail = [half.pop()] if n % 2 else []
    shifted = mpc.scalar_mul(ratio, half)
    merged = []
    for e, o in zip(half, shifted):
        merged += [e, o]
    return merged + tail


class FracKey:
    """argmin key ordering fractions num/den by cross-multiplication."""

    def __init__(self, a):
        self.num, self.den = a

    def __lt__(self, other):
        return mpc.in_prod([self.num, self.den],
                           [other.den, -other.num]) < 0


class IntTableau:
    """Integer-pivoting Simplex tableau over a secure integer type.

    All entries share the common denominator `denom` (the previous
    pivot); basis/cobasis registers are powers of the field's Nth root
    of unity so solutions extract with an inverse-DFT inner product.
    """

    def __init__(self, rows, secint):
        self.secint = secint
        self.n = len(rows[0]) - 1
        self.m = len(rows) - 1
        self.T = [[secint(v) for v in row] for row in rows]
        Zp = secint.field
        self.N = Zp.nth
        root = Zp.root
        self.w_pow = [Zp(1)]
        for _ in range(self.N - 1):
            self.w_pow.append(self.w_pow[-1] * root)
        assert self.w_pow[-1] * root == 1
        self.cobasis = [secint(self.w_pow[-j]) for j in range(self.n)]
        self.basis = [secint(self.w_pow[-(i + self.n)])
                      for i in range(self.m)]
        self.denom = secint(1)

    def entering(self):
        sel, low = mpc.argmin(self.T[0][:-1])
        return mpc.unit_vector(sel, self.n), low

    def leaving(self, col_sel):
        col = mpc.matrix_prod([col_sel], self.T, True)[0]
        # +1 on b entries of non-positive rows pushes them past every
        # feasible ratio (denominators <= 0 excluded from the min)
        keyed = [[self.T[i][-1] + (col[i] <= 0), col[i]]
                 for i in range(1, self.m + 1)]
        sel, key = mpc.argmin(keyed, key=FracKey)
        return mpc.unit_vector(sel, self.m), col, key[1]

    def swap_registers(self, row_sel, col_sel):
        move = mpc.in_prod(self.basis, row_sel) - \
            mpc.in_prod(self.cobasis, col_sel)
        self.cobasis = mpc.vector_add(
            self.cobasis, mpc.scalar_mul(move, col_sel))
        self.basis = mpc.vector_sub(
            self.basis, mpc.scalar_mul(move, row_sel))

    def pivot(self, row_sel, col_sel, col, pivot):
        """Integer-pivoting Gauss update; denom becomes the new pivot."""
        zero = self.secint(0)
        inv_d = 1 / self.denom
        col_ext = mpc.scalar_mul(inv_d, col)
        col_ext = mpc.vector_sub(col_ext, [zero] + row_sel)
        row_ext = mpc.matrix_prod([[zero] + row_sel], self.T)[0]
        row_ext = mpc.vector_add(
            row_ext, mpc.scalar_mul(self.denom, col_sel + [zero]))
        self.T = mpc.gauss(self.T, pivot * inv_d, col_ext, row_ext)
        self.denom = pivot

    def _idft_readout(self, scaled, registers, offset, count):
        """Sum_i scaled_i * delta(register_i) via inverse DFT."""
        N = self.N
        spectrum = [self.secint(0)] * N
        for value, reg in zip(scaled, registers):
            spectrum = mpc.vector_add(spectrum,
                                      geometric(value / N, reg, N))
        out = []
        for j in range(count):
            coefs = [self.w_pow[((offset + j) * k) % N] for k in range(N)]
            out.append(mpc.in_prod(coefs, spectrum))
        return out

    def primal(self):
        scaled = [self.T[i + 1][-1] for i in range(self.m)]
        return self._idft_readout(scaled, self.basis, 0, self.n)

    def dual(self):
        scaled = [self.T[0][j] for j in range(self.n)]
        return self._idft_readout(scaled, self.cobasis, self.n, self.m)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-i', '--dataset', type=int, metavar='I', default=0,
                        help=('dataset 0=uvlp (default), 1=wiki, 2=tb2x2, '
                              '3=woody, 4=LPExample_R20, 5=sc50b, 6=kb2, '
                              '7=LPExample'))
    parser.add_argument('-l', '--bit-length', type=int, metavar='L',
                        default=0)
    args, _ = parser.parse_known_args()

    name, bit_length, scale, n_iter = DATASETS[args.dataset]
    if args.bit_length:
        bit_length = args.bit_length
    rows = load_scaled_rows(name, scale)
    m, n = len(rows) - 1, len(rows[0]) - 1
    secint = mpc.SecInt(bit_length, n=m + n)  # field with (m+n)th root
    print(f'Using secure {bit_length}-bit integers: {secint.__name__}')
    print(f'dataset: {name} with {m} constraints and {n} variables '
          f'(scale factor {scale})')

    mpc.run(mpc.start())

    tab = IntTableau(rows, secint)
    c = [-v for v in tab.T[0][:-1]]        # maximize c.x s.t. A.x<=b, x>=0
    A = [row[:-1] for row in tab.T[1:]]
    b = [row[-1] for row in tab.T[1:]]

    iteration = 0
    while True:
        col_sel, low = tab.entering()
        if not mpc.run(mpc.output(low < 0)):
            break
        row_sel, col, pivot = tab.leaving(col_sel)
        iteration += 1
        if logging.root.isEnabledFor(logging.INFO):
            mx = mpc.run(mpc.output(tab.T[0][-1]))
            cd = mpc.run(mpc.output(tab.denom))
            p = mpc.run(mpc.output(pivot))
            logging.info('Iteration %d/%d: %s pivot=%s',
                         iteration, n_iter, mx / cd, p / cd)
        tab.swap_registers(row_sel, col_sel)
        tab.pivot(row_sel, col_sel, col, pivot)

    mx = mpc.run(mpc.output(tab.T[0][-1]))
    cd = mpc.run(mpc.output(tab.denom))    # common denominator of T
    print(f'max = {mx} / {cd} / {scale} = {mx / cd / scale} '
          f'in {iteration} iterations')

    x = tab.primal()
    y = tab.dual()
    cx = mpc.in_prod(c, x)
    Ax = mpc.matrix_prod([x], A, True)[0]
    yb = mpc.in_prod(y, b)
    yA = mpc.matrix_prod([y], A)[0]
    conditions = [cx == yb]
    conditions += [Ax[i] <= b[i] * cd for i in range(m)]
    conditions += [v >= 0 for v in x]
    conditions += [yA[j] >= c[j] * cd for j in range(n)]
    conditions += [v >= 0 for v in y]
    ok = bool(mpc.run(mpc.output(mpc.all(conditions))))
    print(f'verification c.x == y.b, A.x <= b, x >= 0, y.A >= c, '
          f'y >= 0: {ok}')
    assert ok
    x = mpc.run(mpc.output(x))
    print(f'solution = {[a / cd for a in x]}')

    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
