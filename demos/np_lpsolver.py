"""Demo: vectorized LP solver with exact secure integer arithmetic.

Array counterpart of demos/lpsolver.py (reference demos/np_lpsolver.py):
the whole simplex tableau is ONE secure integer array, so each pivot step
is a constant number of batched rounds — an oblivious argmin over the cost
row, an oblivious argmin over secure fractions (row ratios) using a
two-component comparison key, and a rank-1 tableau update T*piv - outer(
p_col, p_row) that runs as a single fused device kernel per round.  The
certificate check (LP duality) extracts the primal and dual solutions with
the same FFT-style powers-of-root-of-unity trick as lpsolver.py, but with
the power lists built as secure arrays in ~2 log N rounds.

Usage: python demos/np_lpsolver.py [-M m] [-i I] [-l L]
  datasets: 0=uvlp (default), 1=wiki, 2=tb2x2, 3=woody,
            4=LPExample_R20, 5=sc50b, 6=kb2, 7=LPExample
"""
import argparse
import logging
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from mpyc_tpu.runtime import mpc


class SecureFraction:
    """Two-component argmin key: a[..., 0]/a[..., 1] compared exactly."""

    size = 2  # last axis holds (numerator, denominator)

    def __init__(self, a):
        self.a = a

    def __lt__(self, other):
        return self.a[..., 0] * other.a[..., 1] < \
            self.a[..., 1] * other.a[..., 0]


def np_pwlst(a, x, n):
    """Secure array [a, ax, ax^2, ..., ax^(n-1)] in ~2 log2 n rounds."""
    if n == 1:
        powers = mpc.np_fromlist([a])
    elif n == 2:
        powers = mpc.np_fromlist([a, a * x])
    else:
        even = np_pwlst(a, x * x, (n + 1) // 2)
        if n % 2:
            even, d = even[:-1], even[-1:]
        powers = np.stack((even, x * even))
        powers = powers.reshape(n - (n % 2), order='F')
        if n % 2:
            powers = np.append(powers, d)
    return powers


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
    T = np.genfromtxt(path, dtype=float, delimiter=',')
    m, n = T.shape[0] - 1, T.shape[1] - 1
    secint = mpc.SecInt(bit_length, n=m + n)  # ensure Nth root of unity
    print(f'Using secure {bit_length}-bit integers: {secint.__name__}')
    print(f'dataset: {name} with {m} constraints and {n} variables '
          f'(scale factor {scale})')
    T[0, -1] = 0.0  # start with optimal value 0
    T = np.vectorize(int, otypes='O')(T * scale)
    g = np.gcd.reduce(T[1:], axis=1, keepdims=True)
    T[1:] //= np.maximum(g, 1)  # remove common row factors (skip cost row)
    T = secint.array(T)
    c, A, b = -T[0, :-1], T[1:, :-1], T[1:, -1]  # max c.x s.t. A.x<=b, x>=0

    Zp = secint.field
    N = Zp.nth
    w = Zp.root  # w is an Nth root of unity in Zp, N >= m + n
    w_powers = Zp.array(np.array(
        [pow(w, i, Zp.modulus) for i in range(N)], dtype=object))
    assert w_powers[-1] * Zp(w) == Zp(1)

    mpc.run(mpc.start())

    cobasis = w_powers[:n]
    basis = w_powers[N - m:N]
    previous_pivot = secint(1)

    iteration = 0
    while mpc.run(mpc.output((arg_min := T[0, :-1].argmin())[1] < 0)):
        # pivot column (unit vector) and pivot row by secure fraction argmin
        p_col_index = arg_min[0]
        p_col = T[:, :-1] @ p_col_index
        denominator = p_col[1:]
        constraints = np.column_stack(
            (T[1:, -1] + (denominator <= 0), denominator))
        p_row_index, (_, pivot) = constraints.argmin(key=SecureFraction)

        iteration += 1
        mx = mpc.run(mpc.output(T[0, -1]))
        cd = mpc.run(mpc.output(previous_pivot))
        p = mpc.run(mpc.output(pivot))
        logging.info(f'Iteration {iteration}/{n_iter}: {mx / cd} '
                     f'pivot={p / cd}')

        # swap basis entries
        delta = basis @ p_row_index - cobasis @ p_col_index
        cobasis = cobasis + delta * p_col_index
        basis = basis - delta * p_row_index

        # rank-1 update Tij = Tij*Tkl/Tkl' - (Til/Tkl'-[i==k])(Tkj+[j==l]Tkl')
        p_col_index = np.concatenate((p_col_index, np.array([0])))
        p_row_index = np.concatenate((np.array([0]), p_row_index))
        pp_inv = 1 / previous_pivot
        p_col = p_col * pp_inv - p_row_index
        p_row = p_row_index @ T + previous_pivot * p_col_index
        T = T * (pivot * pp_inv) - np.outer(p_col, p_row)
        previous_pivot = pivot

    mx = mpc.run(mpc.output(T[0, -1]))
    cd = mpc.run(mpc.output(previous_pivot))  # common denominator of T
    print(f'max = {mx} / {cd} / {scale} = {mx / cd / scale} '
          f'in {iteration} iterations')

    logging.info('Solution x')
    sum_powers = np_pwlst(T[1][-1] / N, basis[0], N)
    for i in range(1, m):
        sum_powers = sum_powers + np_pwlst(T[i + 1][-1] / N, basis[i], N)
    coefs = w_powers[[[(-j * k) % N for k in range(N)] for j in range(n)]]
    x = coefs @ sum_powers
    Ax_bounded_by_b = mpc.np_all(A @ x <= b * cd)
    x_nonnegative = mpc.np_all(x >= 0)

    logging.info('Dual solution y')
    sum_powers = np_pwlst(T[0][0] / N, cobasis[0], N)
    for j in range(1, n):
        sum_powers = sum_powers + np_pwlst(T[0][j] / N, cobasis[j], N)
    coefs = w_powers[[[(-i * k) % N for k in range(N)]
                      for i in range(N - m, N)]]
    y = coefs @ sum_powers
    yA_bounded_by_c = mpc.np_all(y @ A >= c * cd)
    y_nonnegative = mpc.np_all(y >= 0)

    cx_eq_yb = c @ x == y @ b
    check = mpc.all([cx_eq_yb, Ax_bounded_by_b, x_nonnegative,
                     yA_bounded_by_c, y_nonnegative])
    check = bool(mpc.run(mpc.output(check)))
    print(f'verification c.x == y.b, A.x <= b, x >= 0, y.A >= c, y >= 0: '
          f'{check}')
    assert check

    x = mpc.run(mpc.output(x))
    print(f'solution = {[int(a) / cd for a in np.asarray(x).tolist()]}')

    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
