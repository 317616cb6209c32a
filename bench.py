#!/usr/bin/env python
"""Headline benchmark: Shamir split+recombine throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline target (BASELINE.md): >= 1e8 split+recombine ops/s per chip over a
64-bit prime field, coefficient randomness included (counter-mode SHAKE128).
Correctness is asserted in-run: recombined values must equal the inputs
bit-exactly.

The measured step is the fused Pallas kernel (mpyc_tpu/models/pipelines.py
make_split_recombine_fused): Keccak-f[1600] coefficient stream + degree-t
Horner split at x=1..m + Lagrange recombination, one HBM read + one write.
Timing methodology: iterations are data-chained (out feeds the next input —
valid because recombine(split(s)) == s bit-exactly), finished by a tiny
device-sliced fetch, so async-dispatch/tunnel semantics cannot hide work;
median of 5 runs. On CPU-only hosts the XLA (non-Pallas) pipeline is used.
"""
import json
import sys
import time

sys.path.insert(0, '.')

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mpyc_tpu import finfields  # noqa: E402
from mpyc_tpu.models import pipelines  # noqa: E402
from mpyc_tpu.ops import keccak, limb  # noqa: E402
from mpyc_tpu.ops.fieldops import prime_field_ctx  # noqa: E402


def main():
    m, t = 3, 1
    p, _, _ = finfields.find_prime_root(64)
    ctx = prime_field_ctx(p)
    L = ctx.L

    hi, lo_ = keccak._absorb_host(b'\x42' * 32 + b'bench-coef-stream')
    state = jnp.asarray(np.stack([np.array(hi, np.uint32),
                                  np.array(lo_, np.uint32)]))
    rnd = np.random.default_rng(0)

    if keccak._pallas_available():
        R, grid = 16, 147
        step, (tile_inst, epb) = pipelines.make_split_recombine_fused(
            p, t, m, R=R)
        n = grid * epb * tile_inst
        vals = rnd.integers(0, 1 << 62, n, dtype=np.uint64).astype(object)
        mont = (vals * ctx.R) % p
        sec_np = limb.ints_to_limbs(mont, L).reshape(grid, R, 128, epb, L)
        sec_np = np.transpose(sec_np, (0, 3, 4, 1, 2)).copy()
        secrets = jnp.asarray(sec_np)
        out = np.asarray(step(secrets, state))
        if not (out == sec_np).all():
            print(json.dumps({"metric": "shamir_split_recombine",
                              "value": 0, "unit": "ops/s",
                              "vs_baseline": 0, "error": "mismatch"}))
            return
        sync = lambda cur: np.asarray(cur[0, 0, 0, 0, :1])  # noqa: E731
    else:
        # CPU fallback: XLA pipeline, small batch
        n = 1 << 16
        step = pipelines.make_split_recombine(p, t, m)
        vals = rnd.integers(0, 1 << 62, n, dtype=np.uint64).astype(object)
        mont = (vals * ctx.R) % p
        secrets = jnp.asarray(limb.ints_to_limbs(mont, L))
        out = np.asarray(step(secrets, state))
        if not (out == np.asarray(secrets)).all():
            print(json.dumps({"metric": "shamir_split_recombine",
                              "value": 0, "unit": "ops/s",
                              "vs_baseline": 0, "error": "mismatch"}))
            return
        sync = lambda cur: np.asarray(cur[0, :1])  # noqa: E731

    def run(k):
        cur = secrets
        t0 = time.perf_counter()
        for _ in range(k):
            cur = step(cur, state)  # chained: recombined == input
        sync(cur)
        return time.perf_counter() - t0

    run(3)  # warm
    iters = 200 if keccak._pallas_available() else 20
    dt = sorted(run(iters) for _ in range(5))[2] / iters
    ops = n / dt
    print(json.dumps({
        "metric": "shamir_split_recombine_64bit_m3_t1",
        "value": round(ops),
        "unit": "ops/s",
        "vs_baseline": round(ops / 1e8, 3),
    }))


if __name__ == '__main__':
    main()
