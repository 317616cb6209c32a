"""Demo: secure Moore-Penrose pseudoinverse over the rationals.

Counterpart of the reference demos/pseudoinverse.py (Bouman, de Vreede,
ACNS 2020, eprint 2019/470): the pseudoinverse of an integer matrix A
is computed exactly over a prime field as X = A^T (U^T Z U) (A A^T)
with Z a reflexive generalized inverse of U (A A^T)^2 U^T, built by
recursive 2x2 block Schur complements; the only nonlinear steps are
field reciprocals 1/(d + [d == 0]) at the recursion leaves.  Each
Schur-complement level is a handful of large secure matmuls (MXU work),
so depth is log m.

The result is checked against numpy.linalg.pinv and against the four
Penrose equations verified exactly mod p.

Usage: python demos/pseudoinverse.py [-M M'] [-m M] [-n N] [-r R] [-b B]
"""
import argparse
import logging
import math
import os
import sys

DEMO_DIR = os.path.dirname(__file__)
sys.path.insert(0, os.path.join(DEMO_DIR, '..'))

import numpy as np

from mpyc_tpu.runtime import mpc

secint = None


def scalar(a):
    """Shape-() secure array entry as a secure number."""
    if hasattr(a, 'share'):
        # plane-agnostic: keep any leading party axis of the share
        return secint(mpc._logical_reshape(mpc._share(a), ()))
    return secint(a)


def blocks(TL, TR, BL, BR):
    top = mpc.np_concatenate((TL, TR), axis=1)
    bot = mpc.np_concatenate((BL, BR), axis=1)
    return mpc.np_concatenate((top, bot), axis=0)


def reflexive_generalized_inverse(A):
    """Reflexive generalized inverse Z of m x m secure matrix A, and det A."""
    m = int(A.shape[0])
    if m == 1:
        d = scalar(A[0, 0])
        b = d == 0
        z = mpc.reciprocal(d + b) - b  # exact field reciprocal; 0 if d == 0
        Z = mpc.np_fromlist([z]).reshape(1, 1)
        return Z, d

    t = m // 2
    E, F = A[:t, :t], A[:t, t:]
    FT, H = A[t:, :t], A[t:, t:]
    X, d1 = reflexive_generalized_inverse(E)
    FTX = FT @ X
    Y, d2 = reflexive_generalized_inverse(H - FTX @ F)
    XFY = mpc.np_transpose(FTX) @ Y
    Z = blocks(X + XFY @ FTX, -XFY, -mpc.np_transpose(XFY), Y)
    return Z, d1 * d2


def pseudo_inverse(A, U):
    """n x m pseudoinverse of m x n secure matrix A (public precond. U)."""
    m, n = (int(s) for s in A.shape)
    AT = mpc.np_transpose(A)
    if m > n:
        return mpc.np_transpose(pseudo_inverse(AT, U))

    A_AT = A @ AT
    M = A_AT @ A_AT
    X = mpc.np_matmul(mpc.np_matmul(U, M), U.transpose())
    X = reflexive_generalized_inverse(X)[0]
    X = mpc.np_matmul(mpc.np_matmul(U.transpose(), X), U)
    return AT @ (X @ A_AT)


def signed(v, p):
    v = int(v) % p
    return v - p if v > p // 2 else v


def main():
    global secint

    parser = argparse.ArgumentParser()
    parser.add_argument('-m', type=int, metavar='M',
                        help='number of matrix rows M > 0 (default=N or R or 5)')
    parser.add_argument('-n', type=int, metavar='N',
                        help='number of matrix columns N > 0 (default=M or R or 5)')
    parser.add_argument('-r', type=int, metavar='R',
                        help='(max.) matrix rank R >= 0 (default=min(M,N) or 5)')
    parser.add_argument('-b', type=int, metavar='B',
                        help='(max.) bit length B > 0 of entries (default=4)')
    parser.set_defaults(b=4)
    args, _ = parser.parse_known_args()

    m = args.m or args.n or args.r or 5
    n = args.n or m
    r = args.r if args.r is not None else min(m, n)

    if mpc.pid == 0:
        if r == 0:
            A = np.zeros((m, n), dtype=int)
        else:
            while True:
                beta = 1 + math.floor(math.sqrt((2**(args.b - 1) - 1) / r))
                A = (np.random.randint(-beta, beta, (m, r))
                     @ np.random.randint(-beta, beta, (r, n)))
                if np.linalg.matrix_rank(A) == r:
                    break
    else:
        A = None

    mpc.run(mpc.start())

    A = mpc.transfer(A, senders=0)
    print(f'Matrix A, {m}x{n} of rank {r}, entries up to bit length {args.b}:\n {A}')
    A1 = np.linalg.pinv(A)  # plain pseudoinverse to check results

    # Springer's bound in terms of r and the Frobenius norm of A:
    l = 0 if r == 0 else math.ceil(r * math.log(np.linalg.norm(A, 'fro')**2 / r, 2))
    l = 1 + l  # one more bit for signed integers
    secint = mpc.SecInt(l)
    print(f'Using secure integers: {secint.__name__}')
    field = secint.field
    p = field.modulus
    A_pub = A
    A = secint.array(A.astype(object))

    # public random preconditioner, same at all parties
    rnd = mpc.transfer(np.random.randint(0, min(p, 2**63), size=(min(m, n),) * 2,
                                         dtype=np.int64) if mpc.pid == 0 else None,
                       senders=0)
    U = field.array(rnd.astype(object))

    logging.info('Compute pseudoinverse X of A (numerator)')
    X = pseudo_inverse(A, U)

    logging.info('Set D = I + A(A^T - X); common denominator d = det D')
    I = secint.array(np.eye(m, dtype=object))
    D = I + A @ (mpc.np_transpose(A) - X)
    d_rgi = reflexive_generalized_inverse(D)[1]
    d_det = mpc.np_det(D)
    X = mpc.run(mpc.output(X, raw=True))
    d = int(mpc.run(mpc.output(d_rgi, raw=True)))
    d_ = int(mpc.run(mpc.output(d_det, raw=True)))
    assert d == d_, (d, d_)
    print(f'Common denominator vol^2(A): {signed(d, p)}')

    logging.info('Check result.')
    Xv = np.vectorize(int, otypes=[object])(np.asarray(X.value, dtype=object))
    Av = A_pub.astype(object)
    AX = Av @ Xv % p
    XA = Xv @ Av % p
    assert np.array_equal(AX @ Av % p, Av % p), 'AXA != A'
    assert np.array_equal(Xv @ AX % p, Xv % p), 'XAX != X'
    assert np.array_equal(AX.T % p, AX), '(AX)^T != AX'
    assert np.array_equal(XA.T % p, XA), '(XA)^T != XA'
    print('Penrose equations AXA=A, XAX=X, (AX)^T=AX, (XA)^T=XA: True')

    # d*X is integer valued with d = vol^2(A); reconstruct over Q
    dX = np.vectorize(lambda v: signed(d * int(v), p), otypes=[object])(Xv)
    Xq = dX.astype(float) / signed(d, p)
    print(f'Pseudoinverse X of A:\n {Xq}')
    assert np.allclose(A1, Xq), (A1, Xq)

    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
