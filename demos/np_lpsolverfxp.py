"""Demo: vectorized LP solver with secure fixed-point arithmetic.

Array counterpart of demos/lpsolverfxp.py (reference demos/np_lpsolverfxp.py):
the simplex tableau is ONE secure fixed-point array; each pivot step runs a
constant number of batched rounds — cost-row argmin, row-ratio argmin with a
three-component comparison key (numerator, denominator, positivity guard),
and a rank-1 update with a single batched fixed-point division by the pivot.
The solution is extracted with secure unit vectors indexed by the (secret)
basis registers and certified approximately via LP duality.

Usage: python demos/np_lpsolverfxp.py [-M m] [-i I] [-l L]
  datasets: 0=uvlp (default), 1=wiki, 2=tb2x2, 3=woody,
            4=LPExample_R20, 5=sc50b, 6=kb2, 7=LPExample
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from mpyc_tpu.runtime import mpc


class SecureFraction:
    """Three-component argmin key: ratio a0/a1, only where guard a2=1."""

    size = 3  # last axis holds (numerator, denominator, pos)

    def __init__(self, a):
        self.a = a

    def __lt__(self, other):
        b = self.a[..., 0] * other.a[..., 1] < \
            other.a[..., 0] * self.a[..., 1]
        c0 = self.a[..., 2]
        c0.integral = True
        b = b * c0            # b = b if c0 else 0
        c1 = other.a[..., 2]
        c1.integral = True
        b = c1 * (b - 1) + 1  # b = b if c1 else 1
        return b


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
    T = np.genfromtxt(path, dtype=float, delimiter=',')
    m, n = T.shape[0] - 1, T.shape[1] - 1
    secfxp = mpc.SecFxp(bit_length)
    print(f'Using secure {bit_length}-bit fixed-point numbers: '
          f'{secfxp.__name__}')
    print(f'dataset: {name} with {m} constraints and {n} variables')
    T[0, -1] = 0.0  # start with optimal value 0
    T = secfxp.array(T, integral=False)
    c, A, b = -T[0, :-1], T[1:, :-1], T[1:, -1]  # max c.x s.t. A.x<=b, x>=0

    mpc.run(mpc.start())

    cobasis = np.arange(n)
    basis = np.arange(n, n + m)

    iteration = 0
    while mpc.run(mpc.output((arg_min := T[0, :-1].argmin())[1] < 0)):
        # pivot column (unit vector), then pivot row by guarded ratio argmin
        p_col_index = arg_min[0]
        p_col = T[:, :-1] @ p_col_index
        denominator = p_col[1:]
        constraints = np.column_stack(
            (T[1:, -1], denominator, denominator > 0.0001))
        p_row_index, (_, pivot, _) = constraints.argmin(key=SecureFraction)

        iteration += 1
        mx = mpc.run(mpc.output(T[0, -1]))
        p = mpc.run(mpc.output(pivot))
        logging.info(f'Iteration {iteration}: {mx} pivot={p}')

        # swap basis entries
        delta = basis @ p_row_index - cobasis @ p_col_index
        cobasis = cobasis + delta * p_col_index
        basis = basis - delta * p_row_index

        # update Tij = Tij - (Til - [i==k]) / Tkl * (Tkj + [j==l])
        p_col_index = np.concatenate((p_col_index, np.array([0])))
        p_row_index = np.concatenate((np.array([0]), p_row_index))
        p_col = (p_col - p_row_index) / pivot
        p_row = p_row_index @ T + p_col_index
        T = T - np.outer(p_col, p_row)

    mx = mpc.run(mpc.output(T[0, -1]))
    rel_error = (mx - exact_max) / exact_max
    print(f'max = {mx} (error {rel_error:.3%}) in {iteration} iterations')

    logging.info('Solution x')
    x = T[1, -1] * mpc.np_unit_vector(basis[0], n + m)[:n]
    for i in range(1, m):
        x = x + T[i + 1, -1] * mpc.np_unit_vector(basis[i], n + m)[:n]
    Ax_bounded_by_b = mpc.np_all(A @ x <= 1.01 * b + 0.0001)
    x_nonnegative = mpc.np_all(x >= 0)

    logging.info('Dual solution y')
    y = T[0, 0] * mpc.np_unit_vector(cobasis[0], n + m)[n:]
    for j in range(1, n):
        y = y + T[0, j] * mpc.np_unit_vector(cobasis[j], n + m)[n:]
    yA_bounded_by_c = mpc.np_all(
        y @ A >= np.where(c > 0, 1/1.01, 1.01) * c - 0.0001)
    y_nonnegative = mpc.np_all(y >= 0)

    cx_eq_yb = abs((cx := c @ x) - y @ b) <= 0.01 * abs(cx)
    check = mpc.all([cx_eq_yb, Ax_bounded_by_b, x_nonnegative,
                     yA_bounded_by_c, y_nonnegative])
    check = bool(mpc.run(mpc.output(check)))
    print(f'verification c.x == y.b, A.x <= b, x >= 0, y.A >= c, y >= 0: '
          f'{check}')
    assert check

    x = mpc.run(mpc.output(x))
    print(f'solution = {np.asarray(x).tolist()}')

    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
