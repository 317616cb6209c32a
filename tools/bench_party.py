"""Deployment-plane benchmark: secure multiplication over real TCP parties.

Measures end-to-end ``mpc.np_multiply`` throughput on the PER-PARTY plane
(the reference's deployment/trust model: m separate processes exchanging
shares over localhost TCP, reference mpyc/runtime.py:5156-5193), as
opposed to the co-located simulator plane bench.py's headline metric runs
on. Each round is the full BGW88+GRR98 protocol with real marshaling and
socket exchange between the m processes.

Party 0 prints ONE JSON line: {"party_plane_mul_ops_s": N, "n": n, "m": m}.

Usage: python tools/bench_party.py -M3 [-n log2_batch]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np

from mpyc_tpu.runtime import mpc


def main():
    logn = 16
    for i, a in enumerate(sys.argv):
        if a == '-n' and i + 1 < len(sys.argv):
            logn = int(sys.argv[i + 1])
    n = 1 << logn

    mpc.run(mpc.start())
    secint = mpc.SecInt(32)

    # in-run correctness on a small slice
    small = np.arange(256, dtype=object)
    A = mpc.input(secint.array(small), senders=0)
    B = mpc.input(secint.array((small * 3 + 1) % 97), senders=0)
    got = np.asarray(mpc.run(mpc.output(mpc.np_multiply(A, B))))
    assert (got == small * ((small * 3 + 1) % 97)).all(), 'mul mismatch'

    vals = np.arange(n, dtype=np.int64).astype(object)
    A = mpc.input(secint.array(vals), senders=0)
    B = mpc.input(secint.array((vals + 1) % 1000), senders=0)
    X = mpc.np_multiply(A, B)          # warm (compile/caches)
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        X = mpc.np_multiply(X, B)
    # the eager plane blocks on the exchange each round, so perf_counter
    # deltas are honest end-to-end round times
    dt = (time.perf_counter() - t0) / reps
    mpc.run(mpc.shutdown())
    if mpc.pid == 0:
        print(json.dumps({'party_plane_mul_ops_s': round(n / dt),
                          'n': n, 'm': len(mpc.parties)}))


if __name__ == '__main__':
    main()
