"""Demo: secure CNN inference on MNIST, vectorized (entry point).

In the reference, np_cnnmnist.py is a secure-array reimplementation of the
scalar cnnmnist.py (reference demos/np_cnnmnist.py:1-12).  In mpyc_tpu the
base demo is array-vectorized from the start — cnnmnist.py lowers every
convolution to im2col + ONE large secret-secret matmul (a single
reshare/truncation round on the MXU) and batches ReLU/maxpool comparisons
(TPU-first, static shapes), so the scalar/np split of the reference
collapses into a single implementation.  This entry point exists for
reference CLI parity and simply runs it.

Usage: python demos/np_cnnmnist.py [-M m] [batch[.5] [offset]]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from cnnmnist import main

if __name__ == '__main__':
    main()
