"""Demo: secure binarized neural network inference on MNIST (BNN MNIST).

Counterpart of the reference demos/np_bnnmnist.py: the published 4-layer
binarized MNIST classifier (fc 784x4096, 4096x4096, 4096x4096, 4096x10;
binary weights bundled in demos/data/bnn, biases integer) evaluated on
MNIST test images with secint matrix products (one resharing round per
layer) and vectorized secure sign activations.  Like the reference, the
sign activation can use the Legendre-symbol-based bsgn_0/1/2 protocols
[SS19] over special primes (reference demos/np_bnnmnist.py:45-156),
selected with -d 0/1/2 (default 1); --no-legendre uses the generic
vectorized comparison.  Predicted labels are checked against the MNIST
test labels.

With --selftest, a small random +-1 network is verified against the
plaintext forward pass instead (no data files needed; used by run-all).

Usage: python demos/np_bnnmnist.py [-M m] [--sim] [-b B] [-o OFFSET]
         [-d {0,1,2}] [--no-legendre] [--selftest]
"""

import argparse
import gzip
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
import jax.numpy as jnp

from mpyc_tpu.runtime import mpc

_DATA = os.path.join(os.path.dirname(__file__), 'data')


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


def load_layer(secint, name):
    """Published BNN layer: packed binary weights -> +-1, integer biases."""
    W = np.load(os.path.join(_DATA, 'bnn', f'W_{name}.npy'))
    W = np.unpackbits(W, axis=0).astype(np.int8) * 2 - 1
    b = np.load(os.path.join(_DATA, 'bnn', f'b_{name}.npy')).astype(object)
    return secint.array(W.astype(object)), secint.array(b)


def load_mnist(offset, batch_size):
    """MNIST test labels + images from demos/data/cnn (idx format)."""
    with gzip.open(os.path.join(_DATA, 'cnn',
                                't10k-labels-idx1-ubyte.gz')) as df:
        labels = list(df.read()[8 + offset:8 + offset + batch_size])
    with gzip.open(os.path.join(_DATA, 'cnn',
                                't10k-images-idx3-ubyte.gz')) as df:
        raw = df.read()[16 + offset * 784:16 + (offset + batch_size) * 784]
    images = np.frombuffer(raw, dtype=np.ubyte).reshape(batch_size, 784)
    return labels, images


def selftest(secint, act, batch):
    """Random +-1 network verified against the plaintext forward pass."""
    rng = np.random.default_rng(42)
    D, H, O = 64, 32, 10
    x = rng.choice([-1, 1], size=(batch, D)).astype(object)
    w1 = rng.choice([-1, 1], size=(D, H)).astype(object)
    w2 = rng.choice([-1, 1], size=(H, O)).astype(object)
    a1 = np.where(x @ w1 >= 0, 1, -1).astype(object)
    expect = np.argmax((a1 @ w2).astype(np.int64), axis=1)

    mdl_owner = 1 if len(mpc.parties) > 1 else 0
    X = mpc.input(secint.array(x), senders=0)
    W1 = mpc.input(secint.array(w1), senders=mdl_owner)
    W2 = mpc.input(secint.array(w2), senders=mdl_owner)
    mpc.barrier()
    t0 = time.time()
    L = act(X @ W1) @ W2
    got = mpc.run(mpc.output(mpc.np_argmax(L, axis=1)))
    elapsed = time.time() - t0
    got = np.array([int(v) for v in np.atleast_1d(got)])
    ok = (got == expect).all()
    print(f'party {mpc.pid}: secure BNN selftest ({batch}x{D}->{H}->{O}) '
          f'{"OK" if ok else "FAILED"} in {elapsed:.2f}s; '
          f'predictions {got.tolist()}')
    assert ok, (got, expect)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-b', '--batch-size', type=int, default=1,
                        help='number of images to classify')
    parser.add_argument('-o', '--offset', type=int, default=0,
                        help='offset into the MNIST test set')
    parser.add_argument('-d', '--d-k-star', type=int, default=1,
                        choices=[0, 1, 2],
                        help='Legendre-based sign protocol bsgn_k')
    parser.add_argument('--no-legendre', action='store_true',
                        help='use the generic vectorized comparison')
    parser.add_argument('--selftest', action='store_true',
                        help='random small network, no data files needed')
    args, _ = parser.parse_known_args()

    # Legendre-k primes from the reference demo (np_bnnmnist.py:180-187).
    # The bsgn_* protocols are written against the per-party plane's
    # internal helpers; on the co-located simulator plane fall back to the
    # generic vectorized comparison.
    if getattr(mpc, 'is_simulator', False):
        args.no_legendre = True
    if args.no_legendre:
        secint = mpc.SecInt(14)
        act = lambda z: (z >= 0) * 2 - 1                     # noqa: E731
    elif args.d_k_star == 0:
        secint = mpc.SecInt(14, p=3546374752298322551)   # range [-134, 134]
        act = bsgn_0
    elif args.d_k_star == 1:
        secint = mpc.SecInt(14, p=9409569905028393239)   # range [-383, 383]
        act = bsgn_1
    else:
        secint = mpc.SecInt(14, p=15569949805843283171)  # range [-594, 594]
        act = bsgn_2
    mpc.run(mpc.start())

    if args.selftest:
        selftest(secint, act if not args.no_legendre else
                 (lambda z: mpc.np_sgn(z, LT=True) * -2 + 1),
                 args.batch_size)
        mpc.run(mpc.shutdown())
        return

    B = args.batch_size
    labels, images = load_mnist(args.offset, B)
    print(f'Type = {secint.__name__}, range = ({args.offset}, '
          f'{args.offset + B})')
    print('Labels:', labels)

    def generic_sign(z):
        return mpc.np_sgn(z, LT=True) * -2 + 1   # +1 iff z >= 0

    L = secint.array(images.astype(object))
    t0 = time.time()
    for layer in ('fc1', 'fc2', 'fc3'):
        W, b = load_layer(secint, layer)
        L = L @ W + b
        if layer == 'fc1':
            # layer-1 sums exceed the bsgn ranges; generic comparison
            # (trained sums fit 14 bits, like the reference)
            L = generic_sign(L)
        elif args.no_legendre:
            secint.bit_length = 10   # trained +-1 sums are narrow
            L = generic_sign(L)
            secint.bit_length = 14
        else:
            L = act(L)
        mpc.barrier(f'after-{layer}')
    W, b = load_layer(secint, 'fc4')
    L = L @ W + b

    # one batched argmax protocol + one opening for the whole batch (the
    # reference demo loops per image; vectorizing is the TPU-plane win)
    preds = mpc.run(mpc.output(mpc.np_argmax(L, axis=1)))
    preds = [int(v) for v in np.atleast_1d(np.asarray(preds))]
    errors = 0
    for i in range(B):
        prediction = preds[i]
        tag = '' if prediction == labels[i] else '******* ERROR *******'
        print(f'Image #{args.offset + i} with label {labels[i]}: '
              f'{prediction} predicted. {tag}')
        errors += prediction != labels[i]
    print(f'party {mpc.pid}: {B - errors}/{B} correct '
          f'in {time.time() - t0:.2f}s')
    mpc.run(mpc.shutdown())
    # the published BNN itself misclassifies ~2% of MNIST (e.g. image
    # #115, 4 -> 9, reproduced by the reference demo); only an unusual
    # error rate indicates a protocol problem
    assert errors <= max(2, B // 16), f'{errors} misclassifications'


if __name__ == '__main__':
    main()
