"""Batch-axis scaling-efficiency harness (BASELINE.md: >=80% target).

The primary scaling axis of the framework is the share-batch dimension
(SURVEY.md §5.7): protocol rounds are O(1) in batch size per round and the
local work is embarrassingly parallel per element, so a batch sharded over
a device mesh scales with XLA inserting no (or only party-axis)
collectives.  This module measures end-to-end fused-reshare throughput
(`models/pipelines.make_reshare_step`) at 1, 2, 4, ... devices with the
batch axis sharded over a ('data',) mesh, and reports scaling efficiency
ops/s(d) / (d * ops/s(1)).

On real multi-chip hardware this is the BASELINE.md measurement; on a
virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=N) the
numbers only validate that the sharded program compiles, partitions, and
runs — the virtual devices share physical cores, so "efficiency" there is
not meaningful and is reported with "virtual": true.

CLI: python -m mpyc_tpu.parallel.scaling [n_per_device]
prints one JSON line per device count.
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def measure(dev_counts=None, n_per_device=1 << 16, t=1, m=3, iters=10,
            p=None):
    """Measure fused-reshare ops/s per device count.

    Returns a list of dicts: {"devices": d, "ops_per_s": float,
    "efficiency": float (vs linear scaling from the 1-device point)}.
    """
    from mpyc_tpu import finfields
    from mpyc_tpu.models import pipelines
    from mpyc_tpu.ops import keccak
    from mpyc_tpu.ops.fieldops import prime_field_ctx

    if p is None:
        p, _, _ = finfields.find_prime_root(64)
    ctx = prime_field_ctx(p)
    step = pipelines.make_reshare_step(p, t, m)
    hi, lo = keccak._absorb_host(b'scaling-harness-key'.ljust(32, b'\0')
                                 + bytes(8))
    state = jnp.asarray(np.stack([np.array(hi, np.uint32),
                                  np.array(lo, np.uint32)]))
    devices = jax.devices()
    if dev_counts is None:
        dev_counts = []
        d = 1
        while d <= len(devices):
            dev_counts.append(d)
            d *= 2
    from mpyc_tpu import thresha
    from mpyc_tpu.ops import limb
    from mpyc_tpu.ops import rng as rng_mod

    F = finfields.GF((p, 2, p - 1))
    results = []
    base = None
    for d in dev_counts:
        mesh = Mesh(np.array(devices[:d]), ('data',))
        sh = NamedSharding(mesh, P(None, 'data', None))
        n = n_per_device * d
        # real Shamir shares; first iteration recombines and verifies, so
        # every hardware measurement is self-validating
        secrets = np.arange(n, dtype=np.uint64).astype(object) % p
        rng = rng_mod.KeccakRNG(b'\x5c' * 32)
        split = thresha.np_random_split(F, F.array(secrets), t, m, rng)
        shares = jax.device_put(np.asarray(split.data), sh)
        ctr = jnp.zeros(2, jnp.uint32)
        out, ctr = step(shares, state, ctr)
        out_np = np.asarray(out)               # sync: compile done
        vec = thresha._recombination_vector(F, tuple(range(1, t + 2)), 0)
        acc = None
        for i in range(t + 1):
            term = limb.limbs_to_ints(out_np[i]).astype(object) * int(vec[i])
            acc = term if acc is None else acc + term
        got = acc % p * ctx.Rinv % p
        assert (got == secrets).all(), 'reshare recombine mismatch'
        t0 = time.perf_counter()
        for _ in range(iters):
            out, ctr = step(out, state, ctr)
        np.asarray(out[:1, :1, :1])
        dt = (time.perf_counter() - t0) / iters
        ops = n / dt
        if base is None:
            base = ops
        results.append({
            'devices': d,
            'n': n,
            'ops_per_s': round(ops),
            'efficiency': round(ops / (base * d / dev_counts[0]), 3),
        })
    return results


def main():
    import os
    import sys
    if os.environ.get('JAX_PLATFORMS') == 'cpu':
        # env alone does not stick when a sitecustomize preload already
        # initialized another backend; force it (same as tests/conftest)
        try:
            jax.config.update('jax_platforms', 'cpu')
        except Exception:
            pass
    n_per_device = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
    virtual = jax.default_backend() == 'cpu'
    for row in measure(n_per_device=n_per_device):
        row['virtual'] = virtual
        if virtual:
            # virtual devices share physical cores: the efficiency column
            # is physically meaningless there — null it so downstream
            # readers cannot mistake it for measured scaling
            row['efficiency'] = None
        print(json.dumps(row))


if __name__ == '__main__':
    main()
