"""NumPy access point with MPyC shape-inference helpers.

Counterpart of the reference's mpyc/numpy.py (a soft-dependency shim with
`np._matmul_shape` / `np._item_shape` attached, reference numpy.py:17-185).
NumPy is a hard dependency of the TPU build (host-side object arrays feed
the device limb encoders), so no stub fallback is needed; the
`MPYC_NONUMPY` kill-switch is still honored for CLI compatibility by
refusing to disable what the build requires.

The shape helpers are used by the secure-array layer to type placeholder
results without touching share data.
"""

import os
import logging

import numpy as np

if os.getenv('MPYC_NONUMPY') == '1':
    logging.warning('MPYC_NONUMPY ignored: numpy is integral to mpyc_tpu')


def _matmul_shape(shapeA, shapeB):
    """Shape of A @ B given the operand shapes; None for vector @ vector
    (which is a scalar). Mirrors numpy matmul's promotion rules
    (reference numpy.py:17-38)."""
    a_vec = len(shapeA) == 1
    b_vec = len(shapeB) == 1
    if a_vec:
        shapeA = (1,) + tuple(shapeA)
    if b_vec:
        shapeB = tuple(shapeB) + (1,)
    if shapeA[-1] != shapeB[-2]:
        raise ValueError('matmul: dimension mismatch')
    batch = np.broadcast_shapes(shapeA[:-2], shapeB[:-2])
    shape = batch + (shapeA[-2], shapeB[-1])
    if a_vec:
        shape = shape[:-2] + shape[-1:]
    if b_vec:
        shape = shape[:-1]
    return shape or None


def _item_shape(shape, key):
    """Shape of a[key] for an array of the given shape.

    Correct by construction: index a zero-byte broadcast view so numpy
    itself applies the full basic/advanced indexing semantics (and raises
    the exact numpy errors for invalid keys) without allocating the source
    array (reference numpy.py:41-152 computes this symbolically).
    """
    dummy = np.broadcast_to(np.empty((), dtype=np.uint8), tuple(shape))
    return dummy[key].shape


np._matmul_shape = _matmul_shape
np._item_shape = _item_shape

if np.lib.NumpyVersion(np.__version__) < '2.0.0':
    np.concat = np.concatenate
    np.pow = np.power
