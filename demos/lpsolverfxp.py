"""Demo: Linear Programming solver with secure fixed-point arithmetic.

Counterpart of the reference demos/lpsolverfxp.py: a Simplex solver over
secret-shared tableaus using secure fixed-point numbers.  Pivots are
selected with oblivious argmin over secure fractions; each iteration is
one fused gauss() tableau update.  The found maximum is checked against
the known exact optimum and the primal/dual solutions are verified via
LP duality (within fixed-point tolerance).

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


def argmin_int(xs):
    a, m = mpc.argmin(xs)
    return mpc.unit_vector(a, len(xs)), m


def argmin_rat(xs):
    a, m = mpc.argmin(xs, key=SecureFraction)
    return mpc.unit_vector(a, len(xs)), m


class SecureFraction:
    """Comparison key for ratios (numerator, denominator, denominator>0)."""

    def __init__(self, a):
        self.n, self.d, self.pos = a
        self.pos.integral = True

    def __lt__(self, other):
        c = mpc.in_prod([self.n, -self.d], [other.d, other.n]) < 0
        c = mpc.if_else(self.pos, c, 0)
        c = mpc.if_else(other.pos, c, 1)
        return c


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-i', '--dataset', type=int, metavar='I', default=0,
                        help=('dataset 0=uvlp (default), 1=wiki, 2=tb2x2, '
                              '3=woody, 4=LPExample_R20, 5=sc50b, 6=kb2, '
                              '7=LPExample'))
    parser.add_argument('-l', '--bit-length', type=int, metavar='L', default=0)
    args, _ = parser.parse_known_args()

    settings = [('uvlp', 24, 37/3),
                ('wiki', 24, 20),
                ('tb2x2', 18, 10.5),
                ('woody', 36, 540),
                ('LPExample_R20', 52, 3.441176),
                ('sc50b', 52, 70),
                ('kb2', 96, 1749.9204734889486),
                ('LPExample', 96, 1188806595)]
    name, bit_length, exact_max = settings[args.dataset]
    if args.bit_length:
        bit_length = args.bit_length

    path = os.path.join(os.path.dirname(__file__), 'data', 'lp', name + '.csv')
    with open(path) as file:
        T = list(csv.reader(file))
    m = len(T) - 1
    n = len(T[0]) - 1
    secfxp = mpc.SecFxp(bit_length)
    print(f'Using secure {bit_length}-bit fixed-point numbers: {secfxp.__name__}')
    print(f'dataset: {name} with {m} constraints and {n} variables')
    T[0][-1] = '0'  # start with optimal value 0
    for i in range(m+1):
        for j in range(n+1):
            T[i][j] = secfxp(float(T[i][j]), integral=False)

    c = [-T[0][j] for j in range(n)]  # maximize c.x s.t. A.x <= b, x >= 0
    A = [T[i+1][:-1] for i in range(m)]
    b = [T[i+1][-1] for i in range(m)]

    mpc.run(mpc.start())

    cobasis = [secfxp(j) for j in range(n)]
    basis = [secfxp(n + i) for i in range(m)]

    iteration = 0
    while mpc.run(mpc.output((arg_min := argmin_int(T[0][:-1]))[1] < 0)):
        p_col_index = arg_min[0]

        p_col = mpc.matrix_prod([p_col_index], T, True)[0]
        constraints = [[T[i][-1], p_col[i], p_col[i] > 0.0001]
                       for i in range(1, m+1)]
        p_row_index, (_, pivot, _) = argmin_rat(constraints)

        iteration += 1
        mx = mpc.run(mpc.output(T[0][-1]))
        p = mpc.run(mpc.output(pivot))
        logging.info(f'Iteration {iteration}: {mx} pivot={p}')

        delta = mpc.in_prod(basis, p_row_index) - mpc.in_prod(cobasis, p_col_index)
        cobasis = mpc.vector_add(cobasis, mpc.scalar_mul(delta, p_col_index))
        basis = mpc.vector_sub(basis, mpc.scalar_mul(delta, p_row_index))

        p_col_index.append(secfxp(0))
        p_row_index.insert(0, secfxp(0))
        p_col = mpc.vector_sub(p_col, p_row_index)
        p_col = mpc.scalar_mul(1 / pivot, p_col)
        p_row = mpc.matrix_prod([p_row_index], T)[0]
        p_row = mpc.vector_add(p_row, p_col_index)
        T = mpc.gauss(T, secfxp(1), p_col, p_row)

    mx = mpc.run(mpc.output(T[0][-1]))
    rel_error = (mx - exact_max) / exact_max
    print(f'max = {mx} (error {rel_error:.3%}) in {iteration} iterations')

    logging.info('Solution x')
    x = [secfxp(0) for _ in range(n)]
    for i in range(m):
        u = mpc.unit_vector(basis[i], m + n)[:n]
        v = mpc.scalar_mul(T[i+1][-1], u)
        x = mpc.vector_add(x, v)
    cx = mpc.in_prod(c, x)
    Ax = mpc.matrix_prod([x], A, True)[0]
    approx = lambda a: 1.01 * a + 0.0001
    Ax_bounded_by_b = mpc.all(Ax[i] <= approx(b[i]) for i in range(m))
    x_nonnegative = mpc.all(x[j] >= 0 for j in range(n))

    logging.info('Dual solution y')
    y = [secfxp(0) for _ in range(m)]
    for j in range(n):
        u = mpc.unit_vector(cobasis[j], m + n)[n:]
        v = mpc.scalar_mul(T[0][j], u)
        y = mpc.vector_add(y, v)
    yb = mpc.in_prod(y, b)
    yA = mpc.matrix_prod([y], A)[0]
    approx = lambda a: mpc.if_else(a > 0, 1/1.01, 1.01) * a - 0.0001
    yA_bounded_by_c = mpc.all(yA[j] >= approx(c[j]) for j in range(n))
    y_nonnegative = mpc.all(y[i] >= 0 for i in range(m))

    cx_eq_yb = abs(cx - yb) <= 0.01 * abs(cx)
    check = mpc.all([cx_eq_yb, Ax_bounded_by_b, x_nonnegative,
                     yA_bounded_by_c, y_nonnegative])
    check = bool(mpc.run(mpc.output(check)))
    print(f'verification c.x == y.b, A.x <= b, x >= 0, y.A >= c, y >= 0: {check}')
    assert check

    x = mpc.run(mpc.output(x))
    print(f'solution = {[float(v) for v in x]}')

    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
