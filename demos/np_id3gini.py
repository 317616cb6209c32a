"""Demo: secure ID3 decision-tree learning, vectorized (entry point).

In the reference, np_id3gini.py is a secure-array reimplementation of the
scalar id3gini.py (reference demos/np_id3gini.py:1-10, ~9x faster).  In
mpyc_tpu the base demo is array-vectorized from the start — id3gini.py
already computes each node's class contingency tables as ONE secure matmul
and runs the Gini tournament over secure fraction arrays (TPU-first,
static shapes), so the scalar/np split of the reference collapses into a
single implementation.  This entry point exists for reference CLI parity
and simply runs it.

Usage: python demos/np_id3gini.py [-M m] [-i I] [-l L] [-e E] [-a A]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from id3gini import main

if __name__ == '__main__':
    main()
