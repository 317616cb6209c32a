"""Demo: privacy-preserving Kaplan-Meier survival analysis, vectorized
(entry point).

In the reference, np_kmsurvival.py is a secure-array reimplementation of
the scalar kmsurvival.py with the per-time fixed-point divisions of the
logrank test batched into one array division (reference
demos/np_kmsurvival.py:1-13, 6-9x faster).  In mpyc_tpu the base demo is
array-vectorized from the start — kmsurvival.py computes the secure
logrank statistic with batched fixed-point array divisions and offers the
aggregated-curve variant with oblivious compaction (TPU-first, static
shapes), so the scalar/np split of the reference collapses into a single
implementation.  This entry point exists for reference CLI parity and
simply runs it.

Usage: python demos/np_kmsurvival.py [-M m] [-i {0,2}] [-s S] [-a A] [--agg]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from kmsurvival import main

if __name__ == '__main__':
    main()
