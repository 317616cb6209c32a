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

# name, fixed-point bit length, exact optimum
DATASETS = [
    ('uvlp', 24, 37 / 3), ('wiki', 24, 20), ('tb2x2', 18, 10.5),
    ('woody', 36, 540), ('LPExample_R20', 52, 3.441176), ('sc50b', 52, 70),
    ('kb2', 96, 1749.9204734889486), ('LPExample', 96, 1188806595),
]


class GuardedRatioKey:
    """Batched argmin key over (num, den, guard) triples.

    Triples whose guard is 0 compare as +infinity; otherwise num/den
    ordered by cross-multiplication (all den > 0 where guard is 1).
    """

    size = 3  # components along the last axis

    def __init__(self, a):
        self.a = a

    def __lt__(self, other):
        smaller = self.a[..., 0] * other.a[..., 1] < \
            other.a[..., 0] * self.a[..., 1]
        mine, theirs = self.a[..., 2], other.a[..., 2]
        mine.integral = theirs.integral = True
        smaller = smaller * mine           # guard self
        return theirs * (smaller - 1) + 1  # guard other


def load_tableau(name, secfxp):
    path = os.path.join(os.path.dirname(__file__), 'data', 'lp',
                        name + '.csv')
    raw = np.genfromtxt(path, dtype=float, delimiter=',')
    raw[0, -1] = 0.0                       # objective starts at 0
    return secfxp.array(raw, integral=False)


def unit_vector_sum(scaled, registers, total, lo, hi):
    """Sum_i scaled_i * onehot(register_i)[lo:hi] via secure unit vectors."""
    acc = None
    for v, reg in zip(list(scaled), registers):
        term = v * mpc.np_unit_vector(reg, total)[lo:hi]
        acc = term if acc is None else acc + term
    return acc


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
    secfxp = mpc.SecFxp(bit_length)
    print(f'Using secure {bit_length}-bit fixed-point numbers: '
          f'{secfxp.__name__}')
    T = load_tableau(name, secfxp)
    m, n = T.shape[0] - 1, T.shape[1] - 1
    print(f'dataset: {name} with {m} constraints and {n} variables')
    c, A, b = -T[0, :-1], T[1:, :-1], T[1:, -1]  # max c.x s.t. A.x<=b, x>=0

    mpc.run(mpc.start())

    cobasis = np.arange(n)
    basis = np.arange(n, n + m)

    iteration = 0
    while True:
        col_sel, low = T[0, :-1].argmin()
        if not mpc.run(mpc.output(low < 0)):
            break
        col = T[:, :-1] @ col_sel
        den = col[1:]
        ratios = np.column_stack((T[1:, -1], den, den > 0.0001))
        row_sel, picked = ratios.argmin(key=GuardedRatioKey)
        pivot = picked[1]

        iteration += 1
        if logging.root.isEnabledFor(logging.INFO):
            mx = mpc.run(mpc.output(T[0, -1]))
            logging.info('Iteration %d: %s pivot=%s', iteration, mx,
                         mpc.run(mpc.output(pivot)))

        # registers swap obliviously
        move = basis @ row_sel - cobasis @ col_sel
        cobasis, basis = cobasis + move * col_sel, basis - move * row_sel

        # rank-1 update of the whole tableau
        col_ext = np.concatenate((col_sel, np.array([0])))
        row_ext = np.concatenate((np.array([0]), row_sel))
        drop = (col - row_ext) / pivot
        mix = row_ext @ T + col_ext
        T = T - np.outer(drop, mix)

    mx = mpc.run(mpc.output(T[0, -1]))
    rel_error = (mx - exact_max) / exact_max
    print(f'max = {mx} (error {rel_error:.3%}) in {iteration} iterations')

    x = unit_vector_sum(T[1:, -1], basis, n + m, 0, n)
    y = unit_vector_sum(T[0, :n], cobasis, n + m, n, n + m)
    cx = c @ x
    dual_slack = np.where(c > 0, 1 / 1.01, 1.01) * c - 0.0001
    conditions = [abs(cx - y @ b) <= 0.01 * abs(cx),
                  mpc.np_all(A @ x <= 1.01 * b + 0.0001),
                  mpc.np_all(x >= 0),
                  mpc.np_all(y @ A >= dual_slack),
                  mpc.np_all(y >= 0)]
    ok = bool(mpc.run(mpc.output(mpc.all(conditions))))
    print(f'verification c.x == y.b, A.x <= b, x >= 0, y.A >= c, '
          f'y >= 0: {ok}')
    assert ok

    x = mpc.run(mpc.output(x))
    print(f'solution = {np.asarray(x).tolist()}')

    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
