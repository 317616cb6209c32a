"""Demo: secure binarized neural network inference (entry point).

In the reference, bnnmnist.py is the scalar variant and np_bnnmnist.py the
secure-array one (reference demos/np_bnnmnist.py:10-17, ~3x faster).  In
mpyc_tpu the implementation is array-vectorized from the start —
np_bnnmnist.py runs batched secint matrix products (one resharing round
per layer) with the Legendre-symbol bsgn_0/1/2 sign activations [SS19]
over the reference's special primes — so the scalar/np split of the
reference collapses into a single implementation.  This entry point
exists for reference CLI parity and simply runs it.

Usage: python demos/bnnmnist.py [-M m] [--sim] [-b BATCH] [-d {none,0,1,2}]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from np_bnnmnist import main

if __name__ == '__main__':
    main()
