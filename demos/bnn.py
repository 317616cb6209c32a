"""Demo: secure binarized neural network inference (bnnmnist-style).

Counterpart of the reference demos/np_bnnmnist.py: a multi-layer binarized
network evaluated on secret-shared inputs with secret weights — secint
matrix products (one resharing round per layer) and vectorized secure sign
activations (np_sgn). The reference's published weights are not bundled, so
this demo draws a random +-1 network and verifies the secure inference
against the plaintext forward pass.

Usage: python demos/bnn.py [-M m] [--sim] [-b BATCH]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from mpyc_tpu.runtime import mpc


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('-b', type=int, default=4, help='batch size')
    parser.add_argument('--d-in', type=int, default=64)
    parser.add_argument('--d-hidden', type=int, default=32)
    parser.add_argument('--d-out', type=int, default=10)
    args, _ = parser.parse_known_args()
    B, D, H, O = args.b, args.d_in, args.d_hidden, args.d_out

    secint = mpc.SecInt(16)
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
    # bsgn activation: -1 if z < 0 else +1
    A1 = mpc.np_sgn(Z1, LT=True) * -2 + 1
    L = A1 @ W2
    idx = mpc.np_argmax(L, axis=1)
    got = mpc.run(mpc.output(idx))
    elapsed = time.time() - t0

    got = np.array([int(v) for v in np.atleast_1d(got)])
    ok = (got == expect).all()
    print(f'party {mpc.pid}: secure BNN inference ({B}x{D}->{H}->{O}) '
          f'{"OK" if ok else "FAILED"} in {elapsed:.2f}s; '
          f'predictions {got.tolist()}')
    assert ok, (got, expect)
    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
