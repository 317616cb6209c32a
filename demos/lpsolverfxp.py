"""Demo: Linear Programming solver with secure fixed-point arithmetic.

Counterpart of the reference demos/lpsolverfxp.py: a Simplex solver over
secret-shared tableaus using secure fixed-point numbers.  The tableau is
held in a small Tableau class; every pivot step selects the entering
column by oblivious argmin of the cost row, the leaving row by oblivious
argmin of the b/column ratios (three-component comparison key), and
applies the rank-1 Gauss update through mpc.gauss.  The found maximum is
checked against the known exact optimum and the primal/dual solutions are
certified via LP duality (within fixed-point tolerance).

Usage: python demos/lpsolverfxp.py [-M m] [-i I] [-l L]
  datasets: 0=uvlp (default), 1=wiki, 2=tb2x2, 3=woody,
            4=LPExample_R20, 5=sc50b, 6=kb2, 7=LPExample
"""
import argparse
import csv
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from mpyc_tpu.runtime import mpc

DATASETS = [('uvlp', 24, 37 / 3),
            ('wiki', 24, 20),
            ('tb2x2', 18, 10.5),
            ('woody', 36, 540),
            ('LPExample_R20', 52, 3.441176),
            ('sc50b', 52, 70),
            ('kb2', 96, 1749.9204734889486),
            ('LPExample', 96, 1188806595)]


def load_rows(name):
    path = os.path.join(os.path.dirname(__file__), 'data', 'lp',
                        name + '.csv')
    with open(path) as fh:
        return [[float(v) if v else 0.0 for v in row]
                for row in csv.reader(fh)]


class RatioKey:
    """argmin key ordering fractions n/d with a positivity guard.

    a = [n, d, pos]: keys with pos == 0 compare as +infinity; otherwise
    n1/d1 < n2/d2 decided by the cross product n1*d2 < n2*d1 (d > 0).
    """

    def __init__(self, a):
        self.num, self.den, self.ok = a
        self.ok.integral = True

    def __lt__(self, other):
        smaller = mpc.in_prod([self.num, self.den],
                              [other.den, -other.num]) < 0
        smaller = mpc.if_else(self.ok, smaller, 0)
        return mpc.if_else(other.ok, smaller, 1)


class Tableau:
    """Secret-shared Simplex tableau with oblivious pivot bookkeeping."""

    def __init__(self, rows, secfxp):
        self.secfxp = secfxp
        self.n = len(rows[0]) - 1          # variables
        self.m = len(rows) - 1             # constraints
        rows[0][-1] = 0.0                  # objective starts at 0
        self.T = [[secfxp(v, integral=False) for v in row] for row in rows]
        self.cobasis = [secfxp(j) for j in range(self.n)]
        self.basis = [secfxp(self.n + i) for i in range(self.m)]

    def entering(self):
        """Oblivious argmin over the cost row -> (indicator, min value)."""
        sel, low = mpc.argmin(self.T[0][:-1])
        return mpc.unit_vector(sel, self.n), low

    def leaving(self, col_sel):
        """Oblivious min-ratio row for the selected column."""
        col = mpc.matrix_prod([col_sel], self.T, True)[0]
        keyed = [[self.T[i][-1], col[i], col[i] > 0.0001]
                 for i in range(1, self.m + 1)]
        sel, key = mpc.argmin(keyed, key=RatioKey)
        return mpc.unit_vector(sel, self.m), col, key[1]

    def swap_registers(self, row_sel, col_sel):
        move = mpc.in_prod(self.basis, row_sel) - \
            mpc.in_prod(self.cobasis, col_sel)
        self.cobasis = mpc.vector_add(
            self.cobasis, mpc.scalar_mul(move, col_sel))
        self.basis = mpc.vector_sub(
            self.basis, mpc.scalar_mul(move, row_sel))

    def pivot(self, row_sel, col_sel, col, pivot):
        """Rank-1 Gauss update of the full tableau."""
        zero = self.secfxp(0)
        col_ext = mpc.vector_sub(col, [zero] + row_sel)
        col_ext = mpc.scalar_mul(1 / pivot, col_ext)
        row_ext = mpc.matrix_prod([[zero] + row_sel], self.T)[0]
        row_ext = mpc.vector_add(row_ext, col_sel + [zero])
        self.T = mpc.gauss(self.T, self.secfxp(1), col_ext, row_ext)

    def objective(self):
        return self.T[0][-1]

    def primal(self):
        """Solution x read out through the secret basis registers."""
        x = [self.secfxp(0)] * self.n
        for i, reg in enumerate(self.basis):
            hot = mpc.unit_vector(reg, self.m + self.n)[:self.n]
            x = mpc.vector_add(x, mpc.scalar_mul(self.T[i + 1][-1], hot))
        return x

    def dual(self):
        """Dual solution y read out through the cobasis registers."""
        y = [self.secfxp(0)] * self.m
        for j, reg in enumerate(self.cobasis):
            hot = mpc.unit_vector(reg, self.m + self.n)[self.n:]
            y = mpc.vector_add(y, mpc.scalar_mul(self.T[0][j], hot))
        return y


def certify(tab, c, A, b):
    """LP-duality certificate, approximate within fxp tolerance."""
    x, y = tab.primal(), tab.dual()
    cx = mpc.in_prod(c, x)
    Ax = mpc.matrix_prod([x], A, True)[0]
    yb = mpc.in_prod(y, b)
    yA = mpc.matrix_prod([y], A)[0]
    slack_up = lambda a: 1.01 * a + 0.0001                      # noqa: E731
    slack_dn = lambda a: mpc.if_else(a > 0, 1 / 1.01, 1.01) * a - 0.0001  # noqa: E731
    conditions = [abs(cx - yb) <= 0.01 * abs(cx)]
    conditions += [Ax[i] <= slack_up(b[i]) for i in range(len(b))]
    conditions += [v >= 0 for v in x]
    conditions += [yA[j] >= slack_dn(c[j]) for j in range(len(c))]
    conditions += [v >= 0 for v in y]
    return mpc.all(conditions), x


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-i', '--dataset', type=int, metavar='I', default=0,
                        help=('dataset 0=uvlp (default), 1=wiki, 2=tb2x2, '
                              '3=woody, 4=LPExample_R20, 5=sc50b, 6=kb2, '
                              '7=LPExample'))
    parser.add_argument('-l', '--bit-length', type=int, metavar='L',
                        default=0)
    args, _ = parser.parse_known_args()

    name, bit_length, exact_max = DATASETS[args.dataset]
    if args.bit_length:
        bit_length = args.bit_length
    rows = load_rows(name)
    secfxp = mpc.SecFxp(bit_length)
    print(f'Using secure {bit_length}-bit fixed-point numbers: '
          f'{secfxp.__name__}')
    print(f'dataset: {name} with {len(rows) - 1} constraints and '
          f'{len(rows[0]) - 1} variables')

    mpc.run(mpc.start())

    tab = Tableau(rows, secfxp)
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
        logging.info('Iteration %d: %s pivot=%s', iteration,
                     mpc.run(mpc.output(tab.objective())),
                     mpc.run(mpc.output(pivot)))
        tab.swap_registers(row_sel, col_sel)
        tab.pivot(row_sel, col_sel, col, pivot)

    mx = mpc.run(mpc.output(tab.objective()))
    rel_error = (mx - exact_max) / exact_max
    print(f'max = {mx} (error {rel_error:.3%}) in {iteration} iterations')

    ok, x = certify(tab, c, A, b)
    ok = bool(mpc.run(mpc.output(ok)))
    print(f'verification c.x == y.b, A.x <= b, x >= 0, y.A >= c, '
          f'y >= 0: {ok}')
    assert ok
    print('solution =', [float(v) for v in mpc.run(mpc.output(x))])

    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
