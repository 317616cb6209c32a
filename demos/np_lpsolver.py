"""Demo: vectorized LP solver with exact secure integer arithmetic.

Array counterpart of demos/lpsolver.py (reference demos/np_lpsolver.py):
the whole simplex tableau is ONE secure integer array, so each pivot step
is a constant number of batched rounds — an oblivious argmin over the cost
row, an oblivious argmin over secure fractions (row ratios) using a
two-component comparison key, and a rank-1 tableau update that runs as a
single fused device kernel per round.  The certificate check (LP duality)
extracts the primal and dual solutions with the same FFT-style
powers-of-root-of-unity trick as lpsolver.py, but with the power lists
built as secure arrays in ~2 log N rounds.

Usage: python demos/np_lpsolver.py [-M m] [-i I] [-l L]
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

# name, bit length, scale factor, expected iteration count
DATASETS = [
    ('uvlp', 8, 1, 2), ('wiki', 6, 1, 1), ('tb2x2', 6, 1, 2),
    ('woody', 8, 1, 3), ('LPExample_R20', 70, 1, 9), ('sc50b', 104, 10, 55),
    ('kb2', 560, 100000, 154), ('LPExample', 110, 1, 175),
]


class FracKey:
    """Batched argmin key over (numerator, denominator) pairs."""

    size = 2  # components along the last axis

    def __init__(self, a):
        self.a = a

    def __lt__(self, other):
        lhs = self.a[..., 0] * other.a[..., 1]
        rhs = other.a[..., 0] * self.a[..., 1]
        return lhs < rhs


def geometric_array(first, ratio, n):
    """Secure array [first, first*ratio, ..., first*ratio^(n-1)],
    built by repeated squaring in ~2 log2 n rounds."""
    if n <= 2:
        seq = [first] + ([first * ratio] if n == 2 else [])
        return mpc.np_fromlist(seq)
    half = geometric_array(first, ratio * ratio, (n + 1) // 2)
    tail = half[-1:] if n % 2 else None
    if n % 2:
        half = half[:-1]
    woven = np.stack((half, ratio * half)).reshape(2 * len(half), order='F')
    return np.append(woven, tail) if tail is not None else woven


def load_tableau(name, scale, secint):
    """CSV -> scaled, gcd-reduced secure integer tableau."""
    path = os.path.join(os.path.dirname(__file__), 'data', 'lp',
                        name + '.csv')
    raw = np.genfromtxt(path, dtype=float, delimiter=',')
    raw[0, -1] = 0.0                       # objective starts at 0
    ints = np.vectorize(int, otypes='O')(raw * scale)
    factors = np.maximum(np.gcd.reduce(ints[1:], axis=1, keepdims=True), 1)
    ints[1:] //= factors                   # reduce rows, keep cost row
    return secint.array(ints)


def root_powers(secint):
    """All N powers of the field's Nth root of unity, as a public array."""
    Zp = secint.field
    N = Zp.nth
    vals = [pow(Zp.root, i, Zp.modulus) for i in range(N)]
    arr = Zp.array(np.array(vals, dtype=object))
    assert arr[-1] * Zp(Zp.root) == Zp(1)
    return arr, N


def idft_extract(w_powers, N, scaled, registers, offsets):
    """Read values out of power-of-w registers with an inverse DFT."""
    spectrum = geometric_array(scaled[0] / N, registers[0], N)
    for v, reg in zip(list(scaled)[1:], list(registers)[1:]):
        spectrum = spectrum + geometric_array(v / N, reg, N)
    coefs = w_powers[[[(-j * k) % N for k in range(N)] for j in offsets]]
    return coefs @ spectrum


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
    probe = np.genfromtxt(os.path.join(os.path.dirname(__file__), 'data',
                                       'lp', name + '.csv'),
                          dtype=float, delimiter=',')
    m, n = probe.shape[0] - 1, probe.shape[1] - 1
    secint = mpc.SecInt(bit_length, n=m + n)  # field with (m+n)th root
    print(f'Using secure {bit_length}-bit integers: {secint.__name__}')
    print(f'dataset: {name} with {m} constraints and {n} variables '
          f'(scale factor {scale})')
    T = load_tableau(name, scale, secint)
    c, A, b = -T[0, :-1], T[1:, :-1], T[1:, -1]  # max c.x s.t. A.x<=b, x>=0
    w_powers, N = root_powers(secint)

    mpc.run(mpc.start())

    cobasis = w_powers[:n]
    basis = w_powers[N - m:N]
    denom = secint(1)                      # common denominator of T

    iteration = 0
    while True:
        col_sel, low = T[0, :-1].argmin()
        if not mpc.run(mpc.output(low < 0)):
            break
        col = T[:, :-1] @ col_sel
        ratios = np.column_stack((T[1:, -1] + (col[1:] <= 0), col[1:]))
        row_sel, picked = ratios.argmin(key=FracKey)
        pivot = picked[1]

        iteration += 1
        if logging.root.isEnabledFor(logging.INFO):
            mx, cd, p = (mpc.run(mpc.output(v))
                         for v in (T[0, -1], denom, pivot))
            logging.info('Iteration %d/%d: %s pivot=%s',
                         iteration, n_iter, mx / cd, p / cd)

        # registers swap obliviously
        move = basis @ row_sel - cobasis @ col_sel
        cobasis, basis = cobasis + move * col_sel, basis - move * row_sel

        # rank-1 integer-pivoting update of the whole tableau
        col_ext = np.concatenate((col_sel, np.array([0])))
        row_ext = np.concatenate((np.array([0]), row_sel))
        inv_d = 1 / denom
        drop = col * inv_d - row_ext
        mix = row_ext @ T + denom * col_ext
        T = T * (pivot * inv_d) - np.outer(drop, mix)
        denom = pivot

    mx = mpc.run(mpc.output(T[0, -1]))
    cd = mpc.run(mpc.output(denom))
    print(f'max = {mx} / {cd} / {scale} = {mx / cd / scale} '
          f'in {iteration} iterations')

    x = idft_extract(w_powers, N, T[1:, -1], basis, range(n))
    y = idft_extract(w_powers, N, T[0, :n], cobasis, range(N - m, N))
    conditions = [c @ x == y @ b,
                  mpc.np_all(A @ x <= b * cd),
                  mpc.np_all(x >= 0),
                  mpc.np_all(y @ A >= c * cd),
                  mpc.np_all(y >= 0)]
    ok = bool(mpc.run(mpc.output(mpc.all(conditions))))
    print(f'verification c.x == y.b, A.x <= b, x >= 0, y.A >= c, '
          f'y >= 0: {ok}')
    assert ok

    x = mpc.run(mpc.output(x))
    print(f'solution = {[int(a) / cd for a in np.asarray(x).tolist()]}')

    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
