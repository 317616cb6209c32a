"""Demo: secure binarized neural network inference (bnnmnist-style).

Counterpart of the reference demos/np_bnnmnist.py: a multi-layer binarized
network evaluated on secret-shared inputs with secret weights — secint
matrix products (one resharing round per layer) and vectorized secure sign
activations.  Like the reference, the sign activation can use the
Legendre-symbol-based bsgn_0/1/2 protocols [SS19] over special primes
(reference demos/np_bnnmnist.py:45-156), selected with -d 0/1/2; the
default (-d none) uses the generic np_sgn comparison.  The reference's
published weights are not bundled, so this demo draws a random +-1 network
and verifies the secure inference against the plaintext forward pass.

Usage: python demos/np_bnnmnist.py [-M m] [--sim] [-b BATCH] [-d {none,0,1,2}]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
import jax.numpy as jnp

from mpyc_tpu.runtime import mpc


def _fstack(rows):
    """Stack equal-shape 1D field arrays into a (k, n) field array."""
    cls = type(rows[0])
    return cls.from_data(jnp.stack([r.data for r in rows]))


def _leg_field(Zp, y):
    """Legendre symbols of an opened field array, as a public field array."""
    leg = np.asarray(Zp.array.ctx.legendre(y.data)).reshape(-1)
    p = Zp.modulus
    return Zp.array(np.array([int(v) % p for v in leg], dtype=object))


def bsgn_0(a):
    """Secure binary sign of a: (2a+1 | p) via one blinded opening
    (reference demos/np_bnnmnist.py:45-74)."""
    stype = type(a)
    Zp = stype.sectype.field
    shape = a.shape
    n = a.size
    s = mpc.np_random_bits(Zp, n, signed=True)      # random signs (shares)
    r = mpc._np_randoms(Zp, n)
    r2 = mpc._reshare(r * r)                        # random squares
    y = mpc._reshare(s * r2)
    a_sh = mpc.gather(a).flatten()
    y = y * (a_sh * 2 + 1)
    y = mpc.output(y, threshold=2 * mpc.threshold)  # public
    res = s * _leg_field(Zp, y)
    return mpc._wrap(stype.sectype, res.reshape(shape), array=True,
                     integral=True)


def bsgn_1(a):
    """Secure binary sign of a: (u+v+w-u*v*w)/2 with u,v,w the Legendre
    symbols of 2a-1, 2a+1, 2a+3 (reference demos/np_bnnmnist.py:78-118);
    requires a Legendre-1 prime (range |a| <= 383 for the demo prime)."""
    stype = type(a)
    Zp = stype.sectype.field
    shape = a.shape
    n = a.size
    s = mpc.np_random_bits(Zp, 3 * n, signed=True).reshape(3, n)
    r = mpc._np_randoms(Zp, 3 * n)
    r2 = mpc._reshare(r * r).reshape(3, n)
    s_rows = [s[0], s[1], s[2]]
    z = mpc._reshare(_fstack(s_rows + [s_rows[0]]) *
                     _fstack([r2[0], r2[1], r2[2], s_rows[1]]))
    a_sh = mpc.gather(a).flatten()
    ysh = a_sh * 2 + 1
    y = z * _fstack([ysh - 2, ysh, ysh + 2, s_rows[2]])
    y = mpc.output(y, threshold=2 * mpc.threshold)  # public (4, n)
    h = [_leg_field(Zp, y[i]) for i in range(3)]
    t = s_rows[0] * h[0] + s_rows[1] * h[1] + s_rows[2] * h[2]
    z_pub = h[0] * h[1] * h[2] * y[3]
    res = (t - z_pub) >> 1                          # multiply by 1/2 mod p
    return mpc._wrap(stype.sectype, res.reshape(shape), array=True,
                     integral=True)


def bsgn_2(a):
    """Secure binary sign of a: (t | p) with t = sum of the Legendre
    symbols of 2a+1+2i for i in [-2..2] (reference
    demos/np_bnnmnist.py:121-156); requires a Legendre-2 prime."""
    stype = type(a)
    Zp = stype.sectype.field
    shape = a.shape
    n = a.size
    s = mpc.np_random_bits(Zp, 6 * n, signed=True).reshape(6, n)
    r = mpc._np_randoms(Zp, 6 * n)
    r2 = mpc._reshare(r * r).reshape(6, n)
    z = mpc._reshare(s * r2)                        # (6, n)
    a_sh = mpc.gather(a).flatten()
    ysh = a_sh * 2 + 1
    y = _fstack([ysh - 4, ysh - 2, ysh, ysh + 2, ysh + 4]) * z[:5]
    y = mpc._reshare(y)
    y_open = mpc.output(
        _fstack([y[i] for i in range(5)] + [z[5]]),
        threshold=2 * mpc.threshold)                # public (6, n)
    t = None
    for i in range(5):
        term = s[i] * _leg_field(Zp, y_open[i])
        t = term if t is None else t + term
    t_open = mpc.output(t * y_open[5])              # public (n,)
    res = s[5] * _leg_field(Zp, t_open)
    return mpc._wrap(stype.sectype, res.reshape(shape), array=True,
                     integral=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-b', type=int, default=4, help='batch size')
    parser.add_argument('--d-in', type=int, default=64)
    parser.add_argument('--d-hidden', type=int, default=32)
    parser.add_argument('--d-out', type=int, default=10)
    parser.add_argument('-d', '--d-k-star', default='none',
                        choices=['none', '0', '1', '2'],
                        help='Legendre-based sign protocol bsgn_k')
    args, _ = parser.parse_known_args()
    B, D, H, O = args.b, args.d_in, args.d_hidden, args.d_out

    # Legendre-k primes from the reference demo (np_bnnmnist.py:180-187)
    if args.d_k_star == '0':
        secint = mpc.SecInt(14, p=3546374752298322551)   # range [-134, 134]
        act = bsgn_0
    elif args.d_k_star == '1':
        secint = mpc.SecInt(14, p=9409569905028393239)   # range [-383, 383]
        act = bsgn_1
    elif args.d_k_star == '2':
        secint = mpc.SecInt(14, p=15569949805843283171)  # range [-594, 594]
        act = bsgn_2
    else:
        secint = mpc.SecInt(16)
        act = lambda z: mpc.np_sgn(z, LT=True) * -2 + 1
    mpc.run(mpc.start())

    rng = np.random.default_rng(42)
    x = rng.choice([-1, 1], size=(B, D)).astype(object)
    w1 = rng.choice([-1, 1], size=(D, H)).astype(object)
    w2 = rng.choice([-1, 1], size=(H, O)).astype(object)

    # plaintext reference forward pass
    z1 = x @ w1
    a1 = np.where(z1 >= 0, 1, -1).astype(object)
    logits = a1 @ w2
    expect = np.argmax(logits.astype(np.int64), axis=1)

    # party 0 inputs the images, party 1 (or 0) the model weights
    mdl_owner = 1 if len(mpc.parties) > 1 else 0
    X = mpc.input(secint.array(x), senders=0)
    W1 = mpc.input(secint.array(w1), senders=mdl_owner)
    W2 = mpc.input(secint.array(w2), senders=mdl_owner)

    mpc.barrier()
    t0 = time.time()
    Z1 = X @ W1
    A1 = act(Z1)            # binary sign activation: -1 if z < 0 else +1
    L = A1 @ W2
    idx = mpc.np_argmax(L, axis=1)
    got = mpc.run(mpc.output(idx))
    elapsed = time.time() - t0

    got = np.array([int(v) for v in np.atleast_1d(got)])
    ok = (got == expect).all()
    print(f'party {mpc.pid}: secure BNN inference ({B}x{D}->{H}->{O}, '
          f'act={act.__name__ if hasattr(act, "__name__") else "sgn"}) '
          f'{"OK" if ok else "FAILED"} in {elapsed:.2f}s; '
          f'predictions {got.tolist()}')
    assert ok, (got, expect)
    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
