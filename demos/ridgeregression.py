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

TPU-build deltas from the reference demo: the normal equations are one
integer matmul (Z^T [Z | W] over numpy object arrays) instead of
per-column accumulation loops; Bareiss elimination is vectorized over a
leading batch axis, so on the co-located plane all m parties' share
columns eliminate in one pass; dataset preprocessing is numpy-broadcast
(affine rescale + one-hot expansion) rather than per-cell loops.

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


def _rescale(cols):
    """Affine map of each column onto [-1, 1] (numpy-broadcast)."""
    lo = cols.min(axis=0)
    hi = cols.max(axis=0)
    return (cols - (lo + hi) / 2) * (2 / (hi - lo))


def synthesize_data(n_samples, n_features, n_targets):
    seed = mpc.transfer(random.randrange(2**31), senders=0)
    X, Y = sklearn.datasets.make_regression(
        n_samples=n_samples, n_features=n_features,
        n_informative=max(1, n_features - 5), n_targets=n_targets, bias=42,
        effective_rank=max(1, n_features - 3), tail_strength=0.5, noise=1.2,
        random_state=seed)  # same seed at every party
    Y = Y.reshape(n_samples, n_targets)
    return _rescale(np.hstack([X, Y]))


def load_dataset(infofile):
    """Parse an info CSV + its data file into a rescaled/one-hot matrix.

    The info file lists one feature per line: ``numerical,min,max``,
    ``categorical,v1,v2,...`` (expanded one-hot with +1/-1 levels), or
    ``exclude``.  The last e columns are the regression targets.
    """
    with open(infofile, newline='') as fh:
        meta = csv.reader(fh)
        fname, delim, hdr, split, n, d_in, e = next(meta)
        hdr, split, n, d_in, e = (int(v) for v in (hdr, split, n, d_in, e))
        specs = []
        for _ in range(d_in + e):
            line = next(meta)
            if line[0] == 'numerical':
                specs.append(('num', float(line[1]), float(line[2])))
            elif line[0] == 'categorical':
                levels = [v for v in line[1:] if v]
                specs.append(('cat', levels))
            elif line[0] == 'exclude':
                specs.append(('skip',))
            else:
                raise ValueError(f'bad feature spec: {line[0]}')

    path = os.path.join(DEMO_DIR, 'data', 'regr', fname)
    if '!' in path:  # data file inside a zip archive
        zpath, inner = path.split('!')
        fh = io.TextIOWrapper(zipfile.ZipFile(zpath).open(inner), newline='')
    else:
        fh = open(path, newline='')
    with fh:
        rows = [r[:len(specs)] for r in csv.reader(fh, delimiter=delim)]
    rows = rows[hdr:]
    raw = np.array(rows, dtype=object)

    out_cols = []
    for j, spec in enumerate(specs):
        if spec[0] == 'num':
            lo, hi = spec[1], spec[2]
            col = raw[:, j].astype(float)
            out_cols.append((col - (lo + hi) / 2) * (2 / (hi - lo)))
        elif spec[0] == 'cat':
            for level in spec[1]:
                out_cols.append(np.where(raw[:, j] == level, 1.0, -1.0))
    X = np.column_stack(out_cols)
    d = X.shape[1] - e
    return X, d, e, split


def bareiss_batched(p, M):
    """Division-free elimination mod p on a (..., d, d+e) object array.

    Works on any leading batch shape: on the co-located plane the m
    parties' share columns form a batch and eliminate in one vectorized
    pass. Only the first d columns (public, identical across the batch)
    drive the pivoting; the trailing e columns carry (linear) shares.
    Returns (solution block (..., d, e), determinant (...,)).
    """
    d = M.shape[-2]
    width = M.shape[-1]

    # forward pass: Bareiss cross-multiplication, row k eliminating below
    for k in range(d):
        piv = M[..., k:k+1, k:k+1]
        low = M[..., k+1:, k+1:]
        M[..., k+1:, k+1:] = (piv * low
                              - M[..., k+1:, k:k+1] * M[..., k:k+1, k+1:]
                              ) % p

    # back-substitution with one modular inverse per pivot
    inv_vec = np.vectorize(lambda v: pow(int(v), -1, p), otypes=[object])
    for i in range(d - 1, -1, -1):
        inv = inv_vec(M[..., i, i])
        rhs = M[..., i, d:]
        if i + 1 < d:
            rhs = rhs - (M[..., i, None, i+1:d] @ M[..., i+1:d, d:])[..., 0, :]
        M[..., i, d:] = rhs % p * inv[..., None] % p
        if i < d - 2:
            M[..., i, i] = inv       # retain for the determinant product

    det = M[..., d-1, d-1]
    scale = np.ones(det.shape, dtype=object)
    for i in range(d - 2):
        scale = scale * M[..., i, i] % p
        det = det * scale % p
    return M[..., :, d:], det


def blinding_matrix(secnum, d):
    """Secret uniformly random R = L U with known secret determinant.

    L is unit lower triangular and U upper triangular with random
    diagonal, all entries PRSS-drawn; det R = prod(diag U) is nonzero
    except with probability ~ d/|F|.
    """
    strict = d * (d - 1) // 2
    rand = iter(mpc._randoms(secnum, strict * 2 + d))
    lo = [[secnum(1) if i == j else (next(rand) if j < i else secnum(0))
           for j in range(d)] for i in range(d)]
    diag = [next(rand) for _ in range(d)]
    up = [[diag[i] if i == j else (next(rand) if j > i else secnum(0))
           for j in range(d)] for i in range(d)]
    return mpc.matrix_prod(lo, up), mpc.prod(diag)


def _share_columns(rows):
    """Local share integers of a list-of-lists of secnums, as an object
    array with a leading batch axis: (m, d, e) party-stacked on the
    co-located plane, (1, d, e) on the per-party plane."""
    d, e = len(rows), len(rows[0])
    flat = []
    for row in rows:
        for x in row:
            v = np.asarray(x.share.value).reshape(-1)
            flat.append([int(s) for s in v])
    arr = np.array(flat, dtype=object)           # (d*e, batch)
    return arr.T.reshape(arr.shape[1], d, e)


def linear_solve(A, B):
    """Solve A w = B: return [(adj A) B entries..., det A] secret-shared."""
    secnum = type(A[0][0])
    field = secnum.field
    p = field.modulus
    d, e = len(A), len(B[0])

    R, detR = blinding_matrix(secnum, d)
    RA_open = mpc.output([x for row in mpc.matrix_prod(R, A) for x in row],
                         raw=True)
    RA = np.array([int(v) for v in RA_open], dtype=object).reshape(d, d)
    RB = mpc.matrix_prod(R, B)

    # Bareiss is share-linear: run it on the public RA columns against the
    # raw share columns of RB, batched over the (per-party or stacked)
    # share axis in one vectorized pass.
    rb_batch = _share_columns(RB)                       # (batch, d, e)
    batch = rb_batch.shape[0]
    tableau = np.concatenate(
        [np.broadcast_to(RA, (batch, d, d)).copy(), rb_batch], axis=2)
    sol, det_batch = bareiss_batched(p, tableau)
    det_RA = int(det_batch[0])                  # public: RA columns only

    detA = secnum(field(det_RA)) / detR
    if batch == 1:
        entries = [secnum(field(int(v))) * detA for v in sol[0].reshape(-1)]
    else:  # party-stacked shares: rewrap each stacked entry
        entries = []
        for i in range(d):
            for j in range(e):
                col = field.array(np.array(
                    [int(v) for v in sol[:, i, j]], dtype=object))
                entries.append(secnum(col) * detA)
    return entries + [detA]


def rmse(Y, P):
    return np.sqrt(sklearn.metrics.mean_squared_error(
        Y, P, multioutput='raw_values'))


def normal_equations(X1, Y1, beta, lambda_, field):
    """A = Z^T Z + lambda I, B = Z^T W over the integers, as one matmul.

    Z = [round(beta X) | beta] (the constant column gives the intercept),
    W = round(beta Y); everything stays exact in object-dtype ints.
    """
    n1 = len(X1)
    Z = np.hstack([
        (X1 * float(beta)).astype(np.int64).astype(object),
        np.full((n1, 1), beta, dtype=object)])
    W = (Y1 * float(beta)).astype(np.int64).astype(object)
    G = Z.T @ np.hstack([Z, W])                 # (d, d+e) Gram block
    d = Z.shape[1]
    G[np.arange(d), np.arange(d)] += lambda_
    return field.array(G.reshape(-1) % field.modulus)


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

    datasets = {1: ('student-mat', 6), 2: ('winequality-red', 7),
                3: ('winequality-white', 8)}
    if args.dataset:
        name, alpha0 = datasets[args.dataset]
        alphas = [alpha0]
        X, d, e, split = load_dataset(
            os.path.join(DEMO_DIR, 'data', 'regr', f'info-{name}.csv'))
        n = len(X)
    else:
        name, alphas = 'SYNTHETIC', list(range(4, 8))
        n, d, e, split = args.samples, args.features, args.targets, 0
        X = synthesize_data(n, d, e)
    print(f'dataset: {name} with {n} samples, {d} features, {e} target(s)')
    print(f'regularization lambda: {args.lambda_}')

    if split:
        train, test = X[:split], X[split:]
    else:
        seed = mpc.transfer(random.randrange(2**31), senders=0)
        train, test = sklearn.model_selection.train_test_split(
            X, train_size=0.7, random_state=seed)
    X1, Y1 = train[:, :d], train[:, d:]
    X2, Y2 = test[:, :d], test[:, d:]
    n1 = len(X1)
    d += 1                          # + all-ones intercept column

    ridge = sklearn.linear_model.Ridge(alpha=args.lambda_, fit_intercept=True,
                                       copy_X=True, solver='cholesky')
    ridge.fit(X1, Y1)
    err_train_ref = rmse(Y1, ridge.predict(X1))
    err_test_ref = rmse(Y2, ridge.predict(X2))
    print(f'scikit train error: {err_train_ref}')
    print(f'scikit test error:  {err_test_ref}')

    if args.accuracy >= 0:
        alphas = [args.accuracy]
    for alpha in alphas:
        print('accuracy alpha:', alpha)
        beta = 2**alpha
        lambda_ = round(args.lambda_ * beta**2)
        gamma = n1 * beta**2 + lambda_
        secint = mpc.SecInt(gamma.bit_length() + 1)
        bound = round(d**(d/2)) * gamma**d
        if args.ratrec:
            secnum = mpc.SecInt(l=bound.bit_length() + 1)
            secfld = mpc.SecFld(min_order=4*bound**2)
        else:
            secnum = mpc.SecFld(min_order=2*bound + 1, signed=True)

        logging.info('Compute A = X^T X + lambda I and B = X^T Y')
        gram = normal_equations(X1, Y1, beta, lambda_, secint.field)
        # the Gram entries are identical at every party (degree-0 sharing);
        # one reshare lifts them to a proper degree-t sharing
        gram = mpc._reshare(mpc._share_like(gram))
        AB = mpc.np_tolist(mpc._wrap(secint, gram, array=True, integral=True))
        AB = mpc.convert(AB, secnum)

        tab = np.array(AB, dtype=object).reshape(d, d + e)
        A = [list(row[:d]) for row in tab]
        B = [list(row[d:]) for row in tab]

        w_det = linear_solve(A, B)
        if args.ratrec:
            *w, det = mpc.convert(w_det, secfld)
            w = mpc.scalar_mul(1/det, w)
            w = mpc.run(mpc.output(w))
            w = np.reshape([a / b for a, b in
                            (ratrec(int(v), secfld.field.modulus)
                             for v in w)], (d, e))
        else:
            *w, det = [int(v) for v in mpc.run(mpc.output(w_det))]
            w = np.reshape(w, (d, e)) / det

        err_train = rmse(Y1, X1 @ w[:-1] + w[-1])
        err_test = rmse(Y2, X2 @ w[:-1] + w[-1])
        print(f'MPyC-TPU train error: {err_train}')
        print(f'MPyC-TPU test error:  {err_test}')
        rel = (err_train - err_train_ref) / err_train_ref
        print(f'relative train error: {rel}')
        assert np.all(np.abs(rel) < 0.2), rel
    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
