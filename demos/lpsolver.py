"""Demo: Linear Programming solver with exact secure integer arithmetic.

Counterpart of the reference demos/lpsolver.py (Toft FC 2009; Catrina &
de Hoogh ESORICS 2010): Simplex over secret-shared integer tableaus with
a common-denominator representation, Dantzig pivoting via oblivious
argmin over secure fractions, and FFT-style solution extraction using an
Nth root of unity in the underlying prime field (basis elements stored
as powers of w).  The primal/dual solutions are verified exactly via LP
duality.

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


def pow_list(a, x, n):
    """Return [a, ax, ax^2, ..., ax^(n-1)] in ~2 log n rounds."""
    if n == 1:
        return [a]

    if n == 2:
        return [a, a * x]

    even = pow_list(a, x * x, (n+1)//2)
    d = even.pop() if n % 2 else None
    odd = mpc.scalar_mul(x, even)
    powers = [t for pair in zip(even, odd) for t in pair]
    if d is not None:
        powers.append(d)
    return powers


def argmin_int(xs):
    a, m = mpc.argmin(xs)
    return mpc.unit_vector(a, len(xs)), m


def argmin_rat(xs):
    a, m = mpc.argmin(xs, key=SecureFraction)
    return mpc.unit_vector(a, len(xs)), m


class SecureFraction:
    """Comparison key for ratios (numerator, denominator)."""

    def __init__(self, a):
        self.n, self.d = a

    def __lt__(self, other):
        return mpc.in_prod([self.n, -self.d], [other.d, other.n]) < 0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-i', '--dataset', type=int, metavar='I', default=0,
                        help=('dataset 0=uvlp (default), 1=wiki, 2=tb2x2, '
                              '3=woody, 4=LPExample_R20, 5=sc50b, 6=kb2, '
                              '7=LPExample'))
    parser.add_argument('-l', '--bit-length', type=int, metavar='L', default=0)
    args, _ = parser.parse_known_args()

    settings = [('uvlp', 8, 1, 2),
                ('wiki', 6, 1, 1),
                ('tb2x2', 6, 1, 2),
                ('woody', 8, 1, 3),
                ('LPExample_R20', 70, 1, 9),
                ('sc50b', 104, 10, 55),
                ('kb2', 560, 100000, 154),
                ('LPExample', 110, 1, 175)]
    name, bit_length, scale, n_iter = settings[args.dataset]
    if args.bit_length:
        bit_length = args.bit_length

    path = os.path.join(os.path.dirname(__file__), 'data', 'lp', name + '.csv')
    with open(path) as file:
        T = list(csv.reader(file))
    m = len(T) - 1
    n = len(T[0]) - 1
    secint = mpc.SecInt(bit_length, n=m + n)  # ensure Nth root of unity
    print(f'Using secure {bit_length}-bit integers: {secint.__name__}')
    print(f'dataset: {name} with {m} constraints and {n} variables '
          f'(scale factor {scale})')
    T[0][-1] = '0'  # start with optimal value 0
    for i in range(m+1):
        for j in range(n+1):
            T[i][j] = int(scale * float(T[i][j]))
        g = max(math.gcd(*T[i]), 1) if i else 1  # skip cost row
        for j in range(n+1):
            T[i][j] = secint(T[i][j] // g)

    c = [-T[0][j] for j in range(n)]  # maximize c.x s.t. A.x <= b, x >= 0
    A = [T[i+1][:-1] for i in range(m)]
    b = [T[i+1][-1] for i in range(m)]

    Zp = secint.field
    N = Zp.nth
    w = Zp.root  # Nth root of unity in Zp, N >= m + n
    w_powers = [Zp(1)]
    for _ in range(N-1):
        w_powers.append(w_powers[-1] * w)
    assert w_powers[-1] * w == 1

    mpc.run(mpc.start())

    cobasis = [secint(w_powers[-j]) for j in range(n)]
    basis = [secint(w_powers[-(i + n)]) for i in range(m)]
    previous_pivot = secint(1)

    iteration = 0
    while mpc.run(mpc.output((arg_min := argmin_int(T[0][:-1]))[1] < 0)):
        p_col_index = arg_min[0]

        p_col = mpc.matrix_prod([p_col_index], T, True)[0]
        constraints = [[T[i][-1] + (p_col[i] <= 0), p_col[i]]
                       for i in range(1, m+1)]
        p_row_index, (_, pivot) = argmin_rat(constraints)

        iteration += 1
        mx = mpc.run(mpc.output(T[0][-1]))
        cd = mpc.run(mpc.output(previous_pivot))
        p = mpc.run(mpc.output(pivot))
        logging.info(f'Iteration {iteration}/{n_iter}: {mx / cd} pivot={p / cd}')

        delta = mpc.in_prod(basis, p_row_index) - mpc.in_prod(cobasis, p_col_index)
        cobasis = mpc.vector_add(cobasis, mpc.scalar_mul(delta, p_col_index))
        basis = mpc.vector_sub(basis, mpc.scalar_mul(delta, p_row_index))

        # Tij = Tij*Tkl/Tkl' - (Til/Tkl' - [i==k]) * (Tkj + [j==l]*Tkl')
        p_col_index.append(secint(0))
        p_row_index.insert(0, secint(0))
        pp_inv = 1 / previous_pivot
        p_col = mpc.scalar_mul(pp_inv, p_col)
        p_col = mpc.vector_sub(p_col, p_row_index)
        p_row = mpc.matrix_prod([p_row_index], T)[0]
        p_row = mpc.vector_add(p_row, mpc.scalar_mul(previous_pivot, p_col_index))
        T = mpc.gauss(T, pivot * pp_inv, p_col, p_row)
        previous_pivot = pivot

    mx = mpc.run(mpc.output(T[0][-1]))
    cd = mpc.run(mpc.output(previous_pivot))  # common denominator of T
    print(f'max = {mx} / {cd} / {scale} = {mx / cd / scale} '
          f'in {iteration} iterations')

    logging.info('Solution x')
    sum_x_powers = [secint(0) for _ in range(N)]
    for i in range(m):
        x_powers = pow_list(T[i+1][-1] / N, basis[i], N)
        sum_x_powers = mpc.vector_add(sum_x_powers, x_powers)
    x = [None] * n
    for j in range(n):
        coefs = [w_powers[(j * k) % N] for k in range(N)]
        x[j] = mpc.in_prod(coefs, sum_x_powers)
    cx = mpc.in_prod(c, x)
    Ax = mpc.matrix_prod([x], A, True)[0]
    Ax_bounded_by_b = mpc.all(Ax[i] <= b[i] * cd for i in range(m))
    x_nonnegative = mpc.all(x[j] >= 0 for j in range(n))

    logging.info('Dual solution y')
    sum_x_powers = [secint(0) for _ in range(N)]
    for j in range(n):
        x_powers = pow_list(T[0][j] / N, cobasis[j], N)
        sum_x_powers = mpc.vector_add(sum_x_powers, x_powers)
    y = [None] * m
    for i in range(m):
        coefs = [w_powers[((n + i) * k) % N] for k in range(N)]
        y[i] = mpc.in_prod(coefs, sum_x_powers)
    yb = mpc.in_prod(y, b)
    yA = mpc.matrix_prod([y], A)[0]
    yA_bounded_by_c = mpc.all(yA[j] >= c[j] * cd for j in range(n))
    y_nonnegative = mpc.all(y[i] >= 0 for i in range(m))

    cx_eq_yb = cx == yb
    check = mpc.all([cx_eq_yb, Ax_bounded_by_b, x_nonnegative,
                     yA_bounded_by_c, y_nonnegative])
    check = bool(mpc.run(mpc.output(check)))
    print(f'verification c.x == y.b, A.x <= b, x >= 0, y.A >= c, y >= 0: {check}')
    assert check

    x = mpc.run(mpc.output(x))
    print(f'solution = {[a / cd for a in x]}')

    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
