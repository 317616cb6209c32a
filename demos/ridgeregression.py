"""Demo: Secure linear and ridge regression via randomized Gaussian
elimination.

Counterpart of the reference demos/ridgeregression.py (Blom, Bouman,
Schoenmakers, de Vreede — eprint 2019/773 / CSCML 2021): compute the
regularized model W = A^-1 B with A = X^T X + lambda*I and B = X^T Y.
The linear system is solved by blinding [A | B] with a secret random
matrix R of known determinant, opening R*A (uniformly random, leaks
nothing beyond det A != 0), running division-free Bareiss elimination
locally on the public R*A against the secret-shared R*B columns (all
steps linear in the shares), and unblinding the determinant.  The model
is output as (adj A)B and det A, or via rational reconstruction with
--ratrec.

Results are verified against scikit-learn's Ridge (cholesky).

Usage: python demos/ridgeregression.py [-M m] [-i I] [-l L] [-a A]
         [-n N] [-d D] [-e E] [--ratrec]
  datasets: 0=synthetic (default), 1=student, 2=wine-red, 3=wine-white
"""
import argparse
import csv
import io
import logging
import os
import random
import sys
import zipfile

DEMO_DIR = os.path.dirname(__file__)
sys.path.insert(0, os.path.join(DEMO_DIR, '..'))

import numpy as np
import sklearn.datasets
import sklearn.linear_model
import sklearn.metrics
import sklearn.model_selection

from mpyc_tpu.gmpy import ratrec
from mpyc_tpu.runtime import mpc


def synthesize_data(n_samples, n_features, n_targets):
    rnd = mpc.transfer(random.randrange(2**31), senders=0)
    X, Y = sklearn.datasets.make_regression(
        n_samples=n_samples, n_features=n_features,
        n_informative=max(1, n_features - 5), n_targets=n_targets, bias=42,
        effective_rank=max(1, n_features - 3), tail_strength=0.5, noise=1.2,
        random_state=rnd)  # all parties use the same rnd
    if n_targets == 1:
        Y = np.transpose([Y])
    X = np.concatenate((X, Y), axis=1)
    b_m = np.min(X, axis=0)
    b_M = np.max(X, axis=0)
    coef_add = [-(m + M) / 2 for m, M in zip(b_m, b_M)]
    coef_mul = [2 / (M - m) for m, M in zip(b_m, b_M)]
    for xi in X:
        for j in range(len(xi)):
            xi[j] = (xi[j] + coef_add[j]) * coef_mul[j]  # map to [-1, 1]
    return X


def read_data(infofile):
    with open(infofile, newline='') as file:
        reader = csv.reader(file)
        datafile, delim, skip_header, split, n, d_, e = next(reader)
        skip_header = int(skip_header)
        split = int(split)
        n = int(n)
        d_ = int(d_)
        e = int(e)

        d = 0
        L = d_ + e
        categories = [None] * L
        coef_add = [None] * L
        coef_mul = [None] * L
        for j in range(L):
            line = next(reader)
            kind = line[0]
            if kind == 'numerical':
                m, M = float(line[1]), float(line[2])
                coef_add[j] = -(m + M) / 2
                coef_mul[j] = 2 / (M - m)
                d += 1
            elif kind == 'categorical':
                while not line[-1]:
                    line.pop()
                categories[j] = line[1:]
                d += len(categories[j])
            elif kind == 'exclude':
                categories[j] = []
            else:
                raise ValueError('unknown feature type')
        d -= e

    datafile = os.path.join(DEMO_DIR, 'data', 'regr', datafile)
    if datafile.find('.zip!') >= 0:
        archive, datafile = datafile.split('!')
        open_file = lambda f: io.TextIOWrapper(
            zipfile.ZipFile(archive).open(f), newline='')
    else:
        open_file = lambda f: open(f, newline='')

    X = np.empty((n, d + e), dtype=float)
    with open_file(datafile) as file:
        reader = csv.reader(file, delimiter=delim)
        for _ in range(skip_header):
            next(reader)
        for i, row in enumerate(reader):
            if len(row) > L:
                row = row[:L]
            x = X[i]
            l = 0
            for j in range(L):
                if categories[j] is None:
                    x[l] = (float(row[j]) + coef_add[j]) * coef_mul[j]
                    l += 1
                elif categories[j]:
                    for item in categories[j]:
                        x[l] = 1.0 if item == row[j] else -1.0
                        l += 1
    return X, d, e, split


def bareiss(Zp, A):
    """Division-free Gaussian elimination over Zp with one inverse per
    row; entries of A are plain ints (shares or public values)."""
    p = Zp.modulus
    d, d_e = A.shape

    for k in range(d):
        for i in range(k+1, d):
            for j in range(k+1, d_e):
                A[i, j] = (A[k, k] * A[i, j] - A[k, j] * A[i, k]) % p

    for i in range(d-1, -1, -1):
        inv = Zp(int(A[i, i])).reciprocal().value
        if i < d-2:
            A[i, i] = inv  # keep reciprocal for the determinant
        for j in range(d, d_e):
            s = A[i, j]
            for k in range(i+1, d):
                s -= A[i, k] * A[k, j]
            A[i, j] = (s % p) * inv % p

    inv = 1
    det = A[d-1, d-1]
    for i in range(d-2):
        inv = (inv * A[i, i]) % p
        det = (det * inv) % p
    return A[:, d:], det


def random_matrix_determinant(secnum, d):
    """Secret random matrix R = L U with secret determinant prod(diag U)."""
    d_2 = d * (d-1) // 2
    L = np.diagflat([secnum(1)] * d)
    L[np.tril_indices(d, -1)] = mpc._randoms(secnum, d_2)
    L[np.triu_indices(d, 1)] = [secnum(0)] * d_2
    diag = mpc._randoms(secnum, d)
    U = np.diagflat(diag)
    U[np.tril_indices(d, -1)] = [secnum(0)] * d_2
    U[np.triu_indices(d, 1)] = mpc._randoms(secnum, d_2)
    R = mpc.matrix_prod(L.tolist(), U.tolist())
    detR = mpc.prod(list(diag))  # nonzero with overwhelming probability
    return R, detR


def linear_solve(A, B):
    """Solve A w = B: return [(adj A) B entries..., det A] secret-shared."""
    secnum = type(A[0][0])
    d, e = len(A), len(B[0])

    R, detR = random_matrix_determinant(secnum, d)
    RA = mpc.matrix_prod(R, A)
    RA = mpc.output([a for row in RA for a in row], raw=True)
    RA = np.array([int(v) for v in RA], dtype=object).reshape(d, d)
    RB = mpc.matrix_prod(R, B)
    # raw shares of RB: Bareiss steps are linear, so shares flow through
    if getattr(mpc, 'is_simulator', False):
        # co-located plane: shares are party-stacked; run the local
        # elimination once per party and restack the results
        m = len(mpc.parties)
        RBs_all = np.array(
            [[int(v) for v in np.asarray(x.share.value).reshape(-1)]
             for row in RB for x in row], dtype=object)  # (d*e, m)
        per_party = []
        detRA_sh = None
        for pidx in range(m):
            RBs = RBs_all[:, pidx].reshape(d, e)
            invA_B, detRA_sh = bareiss(secnum.field,
                                       np.concatenate((RA, RBs), axis=1))
            per_party.append(invA_B)
        detA = secnum(secnum.field(int(detRA_sh))) / detR  # detRA public
        adjA_B = []
        for i in range(d):
            for j in range(e):
                stacked = secnum.field.array(np.array(
                    [int(per_party[p][i][j]) for p in range(m)],
                    dtype=object))
                adjA_B.append(secnum(stacked) * detA)
        return adjA_B + [detA]

    RBs = np.array([int(x.share.value[()]) for row in RB for x in row],
                   dtype=object).reshape(d, e)
    invA_B, detRA_sh = bareiss(secnum.field,
                               np.concatenate((RA, RBs), axis=1))
    # detRA is public (from RA columns only)
    detA = secnum(secnum.field(int(detRA_sh))) / detR
    adjA_B = [secnum(secnum.field(int(a))) * detA
              for row in invA_B for a in row]
    return adjA_B + [detA]


def rmse(Y, P):
    return np.sqrt(sklearn.metrics.mean_squared_error(
        Y, P, multioutput='raw_values'))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-i', '--dataset', type=int, metavar='I', default=0,
                        help=('dataset 0=synthetic (default), 1=student, '
                              '2=wine-red, 3=wine-white'))
    parser.add_argument('-l', '--lambda_', type=float, metavar='L', default=1.0)
    parser.add_argument('-a', '--accuracy', type=int, metavar='A', default=-1)
    parser.add_argument('-n', '--samples', type=int, metavar='N', default=1000)
    parser.add_argument('-d', '--features', type=int, metavar='D', default=10)
    parser.add_argument('-e', '--targets', type=int, metavar='E', default=1)
    parser.add_argument('--ratrec', action='store_true',
                        help='rational reconstruction hides the determinant')
    args, _ = parser.parse_known_args()

    mpc.run(mpc.start())

    if not args.dataset:
        range_alpha = range(4, 8)
        n, d, e, split = args.samples, args.features, args.targets, 0
        name = 'SYNTHETIC'
        X = synthesize_data(n, d, e)
    else:
        settings = [('student-mat', 6), ('winequality-red', 7),
                    ('winequality-white', 8)]
        name, alpha = settings[args.dataset - 1]
        range_alpha = range(alpha, alpha + 1)
        infofile = os.path.join(DEMO_DIR, 'data', 'regr', f'info-{name}.csv')
        X, d, e, split = read_data(infofile)
        n = len(X)
    print(f'dataset: {name} with {n} samples, {d} features, {e} target(s)')
    print(f'regularization lambda: {args.lambda_}')

    if split:
        X1, X2 = X[:split], X[split:]
    else:
        rnd = mpc.transfer(random.randrange(2**31), senders=0)
        X1, X2 = sklearn.model_selection.train_test_split(
            X, train_size=0.7, random_state=rnd)
    del X
    X1, Y1 = X1[:, :d], X1[:, d:]
    X2, Y2 = X2[:, :d], X2[:, d:]
    n1 = len(X1)
    d = d + 1  # virtual all-ones feature column for the intercept

    ridge = sklearn.linear_model.Ridge(alpha=args.lambda_, fit_intercept=True,
                                       copy_X=True, solver='cholesky')
    ridge.fit(X1, Y1)
    error_train_skit = rmse(Y1, ridge.predict(X1))
    error_test_skit = rmse(Y2, ridge.predict(X2))
    print(f'scikit train error: {error_train_skit}')
    print(f'scikit test error:  {error_test_skit}')

    if args.accuracy >= 0:
        range_alpha = range(args.accuracy, args.accuracy + 1)
    for alpha in range_alpha:
        print('accuracy alpha:', alpha)
        beta = 2**alpha
        lambda_ = round(args.lambda_ * beta**2)
        gamma = n1 * beta**2 + lambda_
        secint = mpc.SecInt(gamma.bit_length() + 1)
        bound = round(d**(d/2)) * gamma**d
        if not args.ratrec:
            secnum = mpc.SecFld(min_order=2*bound + 1, signed=True)
        else:
            secnum = mpc.SecInt(l=bound.bit_length() + 1)
            secfld = mpc.SecFld(min_order=4*bound**2)

        f2 = float(beta)
        q = secint.field.modulus
        # scaled degree-0 shares of X, Y (all parties hold the plain data)
        Xt = [[int(a * f2) + q for a in col] for col in X1.transpose()]
        Yt = [[int(a * f2) + q for a in col] for col in Y1.transpose()]

        logging.info('Compute A = X^T X + lambda I and B = X^T Y')
        AB = []
        for i in range(d-1):
            xi = Xt[i]
            for j in range(i, d-1):
                xj = Xt[j]
                AB.append(sum(a * b for a, b in zip(xi, xj)))
            AB.append(sum(xi) * beta)
            for j in range(e):
                yj = Yt[j]
                AB.append(sum(a * b for a, b in zip(xi, yj)))
        AB.append(n1 * beta**2)
        for j in range(e):
            AB.append(beta * sum(Yt[j]))
        del Xt, Yt

        # degree-0 sharing (all parties hold the same sums) -> degree-t via
        # one reshare; _share_like broadcasts over the party axis on --sim
        ABarr = mpc._share_like(secint.field.array(np.array(AB, dtype=object)))
        ABarr = mpc._reshare(ABarr)
        AB = mpc.np_tolist(mpc._wrap(secint, ABarr, array=True, integral=True))
        AB = mpc.convert(AB, secnum)

        A = [[None] * d for _ in range(d)]
        B = [[None] * e for _ in range(d)]
        index = 0
        for i in range(d):
            A[i][i] = AB[index] + lambda_
            index += 1
            for j in range(i+1, d):
                A[i][j] = A[j][i] = AB[index]
                index += 1
            for j in range(e):
                B[i][j] = AB[index]
                index += 1

        w_det = linear_solve(A, B)
        if not args.ratrec:
            w_det = mpc.run(mpc.output(w_det))
            *w, det = [int(v) for v in w_det]
            w = np.reshape(w, (d, e)) / det
        else:
            *w, det = mpc.convert(w_det, secfld)
            w = mpc.scalar_mul(1/det, w)
            w = mpc.run(mpc.output(w))
            w = [ratrec(int(a), secfld.field.modulus) for a in w]
            w = np.reshape([a / b for a, b in w], (d, e))

        error_train = rmse(Y1, np.dot(X1, w[:-1]) + w[-1])
        error_test = rmse(Y2, np.dot(X2, w[:-1]) + w[-1])
        print(f'MPyC-TPU train error: {error_train}')
        print(f'MPyC-TPU test error:  {error_test}')
        rel = (error_train - error_train_skit) / error_train_skit
        print(f'relative train error: {rel}')
        assert np.all(np.abs(rel) < 0.2), rel
    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
