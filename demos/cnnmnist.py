"""Demo: Secure CNN inference on MNIST (vectorized, MXU-shaped).

Counterpart of the reference demos/cnnmnist.py + np_cnnmnist.py: a
4-layer CNN (conv 5x5x32, maxpool, conv 5x5x64, maxpool, fc 3136x1024,
fc 1024x10) evaluated on secret-shared images with secret-shared
weights.  TPU-first data flow: each convolution becomes im2col (local
share slicing) followed by ONE large secret-secret matmul — a single
reshare/truncation round feeding the MXU — instead of the reference's
per-pixel correlate loops (np_cnnmnist.py:58-86).  ReLU and maxpool are
batched elementwise comparisons.

The weights were trained locally (see git history) on the first 9000
t10k MNIST images (97.7% accuracy on the held-out 1000); the reference
checkout ships the same architecture but its W_fc1.npy blob is absent.
Predictions are checked against the true labels and against the plain
float forward pass.

Usage: python demos/cnnmnist.py [-M m] [batch[.5] [offset]]
  batch.5 selects fixed-point (SecFxp), integer (SecInt37) otherwise;
  offset picks the first image (default random, broadcast by party 0).
"""
import gzip
import logging
import os
import random
import sys

DEMO_DIR = os.path.dirname(__file__)
sys.path.insert(0, os.path.join(DEMO_DIR, '..'))

import numpy as np

from mpyc_tpu.runtime import mpc
from mpyc_tpu import sectypes

secnum = None


def scale_int(x, f2):
    return np.vectorize(round, otypes=[object])(x * f2)


def load(name, f, a=2):
    W = np.load(os.path.join(DEMO_DIR, 'data', 'cnn', f'W_{name}.npy'))
    b = np.load(os.path.join(DEMO_DIR, 'data', 'cnn', f'b_{name}.npy'))
    W = W.astype(np.float64)
    b = b.astype(np.float64)
    if issubclass(secnum, sectypes.SecureInteger):
        Ws = secnum.array(scale_int(W, 1 << f))
        bs = secnum.array(scale_int(b, 1 << (a * f)))
    else:
        Ws = secnum.array(W)
        bs = secnum.array(b)
    return Ws, bs, W, b


def conv2d(x, W, b):
    """Secure 'same' 2-D convolution: im2col + one big matmul."""
    k, r, m, n = x.shape
    v, _, s, _ = W.shape
    pad = (s - 1) // 2
    zrows = np.zeros((k, r, pad, n), dtype=object)
    xp = mpc.np_concatenate((zrows, x, zrows), axis=2)
    zcols = np.zeros((k, r, m + 2*pad, pad), dtype=object)
    xp = mpc.np_concatenate((zcols, xp, zcols), axis=3)
    patches = mpc.np_stack(
        [xp[:, :, di:di+m, dj:dj+n] for di in range(s) for dj in range(s)],
        axis=2)                                   # (k, r, s*s, m, n)
    patches = mpc.np_transpose(patches, (0, 3, 4, 1, 2))  # (k, m, n, r, ss)
    patches = mpc.np_reshape(patches, (k * m * n, r * s * s))
    Wmat = mpc.np_transpose(mpc.np_reshape(W, (v, r * s * s)))
    out = patches @ Wmat + b                      # ONE reshare (+trunc)
    out = mpc.np_reshape(out, (k, m, n, v))
    return mpc.np_transpose(out, (0, 3, 1, 2))


def np_maximum(a, b):
    return mpc.np_where(a >= b, a, b)


def maxpool(x):
    """(2,2) maxpool with stride 2 (two comparison rounds)."""
    x = np_maximum(x[:, :, ::2, :], x[:, :, 1::2, :])
    return np_maximum(x[:, :, :, ::2], x[:, :, :, 1::2])


def relu(x):
    return (x >= 0) * x


def plain_forward(x, weights):
    """Cleartext float forward pass for verification."""
    (W1, b1), (W2, b2), (W3, b3), (W4, b4) = weights

    def conv(x, W, b):
        k, r, m, n = x.shape
        v, _, s, _ = W.shape
        pad = (s - 1) // 2
        xp = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
        cols = np.stack([xp[:, :, di:di+m, dj:dj+n]
                         for di in range(s) for dj in range(s)], axis=2)
        cols = cols.transpose(0, 3, 4, 1, 2).reshape(k * m * n, r * s * s)
        out = cols @ W.reshape(v, -1).T + b
        return out.reshape(k, m, n, v).transpose(0, 3, 1, 2)

    def pool(x):
        x = np.maximum(x[:, :, ::2, :], x[:, :, 1::2, :])
        return np.maximum(x[:, :, :, ::2], x[:, :, :, 1::2])

    x = np.maximum(pool(conv(x, W1, b1)), 0)
    x = np.maximum(pool(conv(x, W2, b2)), 0)
    x = x.reshape(x.shape[0], -1)
    x = np.maximum(x @ W3 + b3, 0)
    return x @ W4 + b4


def main():
    global secnum

    pos = [a for a in sys.argv[1:] if not a.startswith('-')]
    k = 1 if not pos else float(pos[0])
    if k - int(k) == 0.5:
        secnum = mpc.SecFxp(14, 6)
    else:
        secnum = mpc.SecInt(37)
    batch_size = round(k - 0.01)

    mpc.run(mpc.start())

    if len(pos) <= 1:
        offset = random.randrange(10001 - batch_size) if mpc.pid == 0 else None
        offset = mpc.transfer(offset, senders=0)
    else:
        offset = int(pos[1])

    f = 6

    print(f'Type = {secnum.__name__}, range = ({offset}, {offset + batch_size})')
    df = gzip.open(os.path.join(DEMO_DIR, 'data', 'cnn',
                                't10k-labels-idx1-ubyte.gz'))
    d = df.read()[8 + offset: 8 + offset + batch_size]
    labels = list(map(int, d))
    print('Labels:', labels)
    df = gzip.open(os.path.join(DEMO_DIR, 'data', 'cnn',
                                't10k-images-idx3-ubyte.gz'))
    d = df.read()[16 + offset * 28**2: 16 + (offset + batch_size) * 28**2]
    x_plain = np.frombuffer(d, dtype=np.ubyte).reshape(
        batch_size, 1, 28, 28) / 255
    if batch_size == 1:
        print(np.array2string(
            np.vectorize(lambda a: int(bool(a)))(x_plain[0, 0]), separator=''))
    if issubclass(secnum, sectypes.SecureInteger):
        x = secnum.array(scale_int(x_plain, 1 << f))
    else:
        x = secnum.array(x_plain)

    logging.info('--------------- LAYER 1 -------------')
    W, b, W1, b1 = load('conv1', f)
    x = conv2d(x, W, b)
    if issubclass(secnum, sectypes.SecureInteger):
        secnum.bit_length = 16
    x = maxpool(x)
    x = relu(x)
    mpc.barrier('after-layer-1')

    logging.info('--------------- LAYER 2 -------------')
    W, b, W2, b2 = load('conv2', f, 3)
    x = conv2d(x, W, b)
    if issubclass(secnum, sectypes.SecureInteger):
        secnum.bit_length = 23
    x = maxpool(x)
    x = relu(x)
    mpc.barrier('after-layer-2')

    x = mpc.np_reshape(x, (batch_size, 64 * 7**2))

    logging.info('--------------- LAYER 3 -------------')
    W, b, W3, b3 = load('fc1', f, 4)
    x = x @ W + b
    if issubclass(secnum, sectypes.SecureInteger):
        secnum.bit_length = 30
    x = relu(x)
    mpc.barrier('after-layer-3')

    logging.info('--------------- LAYER 4 -------------')
    W, b, W4, b4 = load('fc2', f, 5)
    x = x @ W + b

    if issubclass(secnum, sectypes.SecureInteger):
        secnum.bit_length = 37

    ref_logits = plain_forward(x_plain, ((W1, b1), (W2, b2), (W3, b3), (W4, b4)))
    n_err = 0
    for i in range(batch_size):
        prediction = int(mpc.run(mpc.output(mpc.np_argmax(x[i]))))
        expected = int(np.argmax(ref_logits[i]))
        err = '' if prediction == labels[i] else '******* ERROR *******'
        print(f'Image #{offset+i} with label {labels[i]}: '
              f'{prediction} predicted. {err}')
        assert prediction == expected, (prediction, expected)
        n_err += prediction != labels[i]
    assert n_err == 0 or batch_size > 3, 'predictions disagree with labels'

    mpc.run(mpc.shutdown())


if __name__ == '__main__':
    main()
