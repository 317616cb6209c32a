"""Multi-chip sharding tests: protocol ops under a real jax Mesh.

Runs on the 8 virtual CPU devices forced by conftest.py
(XLA_FLAGS=--xla_force_host_platform_device_count=8) — validating that the
fused protocol rounds compile, SPMD-partition, and execute bit-exactly
with the party axis and/or the batch axis sharded, as they would over ICI
on a real pod slice (SURVEY.md §2.13/§7 plane (a)).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mpyc_tpu import finfields, thresha
from mpyc_tpu.models import pipelines
from mpyc_tpu.ops import keccak, limb, rng as rng_mod
from mpyc_tpu.ops.fieldops import prime_field_ctx


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason='needs 8 (virtual) devices')


def _field64():
    p, _, _ = finfields.find_prime_root(64)
    return p, finfields.GF((p, 2, p - 1)), prime_field_ctx(p)


def _state(tag=b'multichip'):
    hi, lo = keccak._absorb_host(tag.ljust(32, b'\0') + bytes(8))
    return jnp.asarray(np.stack([np.array(hi, np.uint32),
                                 np.array(lo, np.uint32)]))


def _recombine_ints(F, ctx, out_np, t):
    """Degree-t Montgomery share rows -> plaintext ints at x=0."""
    vec = thresha._recombination_vector(F, tuple(range(1, t + 2)), 0)
    acc = None
    for i in range(t + 1):
        vals = limb.limbs_to_ints(out_np[i]).astype(object)
        term = vals * int(vec[i])
        acc = term if acc is None else acc + term
    return acc % ctx.p * ctx.Rinv % ctx.p


@needs_8
def test_reshare_party_and_data_sharded():
    """GRR98 reshare with the party axis AND batch axis sharded (4x2 mesh):
    output recombines bit-exactly to the input secrets."""
    p, F, ctx = _field64()
    m, t = 4, 1
    n = 1 << 10
    rng = rng_mod.KeccakRNG(b'\x05' * 32)
    secrets = np.arange(n, dtype=np.uint64).astype(object)
    sh = thresha.np_random_split(F, F.array(secrets), t, m, rng)  # (4, n)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                ('party', 'data'))
    shard = NamedSharding(mesh, P('party', 'data', None))
    step = pipelines.make_reshare_step(p, t, m)
    data = jax.device_put(np.asarray(sh.data), shard)
    out, ctr = step(data, _state(), jnp.zeros(2, jnp.uint32))
    out_np = np.asarray(out)
    assert np.asarray(ctr).tolist() == [1, 0]
    got = _recombine_ints(F, ctx, out_np, t)
    assert (got == secrets).all()
    # resharing actually changed the share values (fresh randomness)
    assert not (out_np == np.asarray(sh.data)).all()


@needs_8
def test_fused_mul_data_sharded():
    """Whole secure multiplication (fuse_mul) with the batch sharded over
    all 8 devices: output recombines to a*b mod p bit-exactly."""
    p, F, ctx = _field64()
    m, t = 3, 1
    n = 1 << 11
    rng = rng_mod.KeccakRNG(b'\x06' * 32)
    a = (np.arange(n, dtype=np.uint64).astype(object) * 12345) % p
    b = (np.arange(n, dtype=np.uint64).astype(object) ** 2 + 7) % p
    a_sh = thresha.np_random_split(F, F.array(a), t, m, rng)
    b_sh = thresha.np_random_split(F, F.array(b), t, m, rng)

    mesh = Mesh(np.array(jax.devices()[:8]), ('data',))
    shard = NamedSharding(mesh, P(None, 'data', None))
    step = pipelines.make_reshare_step(p, t, m, fuse_mul=True)
    da = jax.device_put(np.asarray(a_sh.data), shard)
    db = jax.device_put(np.asarray(b_sh.data), shard)
    out, _ = step(da, db, _state(b'mul'), jnp.zeros(2, jnp.uint32))
    got = _recombine_ints(F, ctx, np.asarray(out), t)
    assert (got == (a * b) % p).all()


@needs_8
def test_secure_matmul_party_sharded():
    """Co-located secure matmul round on a 4x2 mesh (the graft entry's
    flagship step) — recombined output equals the plaintext matmul."""
    import __graft_entry__ as g
    g.dryrun_multichip(8)   # asserts output == plaintext matmul mod p


@needs_8
def test_scaling_harness_runs():
    """Scaling harness produces monotone device counts and sane numbers."""
    from mpyc_tpu.parallel import scaling
    rows = scaling.measure(dev_counts=[1, 2, 4, 8], n_per_device=1 << 10,
                           iters=2)
    assert [r['devices'] for r in rows] == [1, 2, 4, 8]
    assert all(r['ops_per_s'] > 0 for r in rows)
    assert all(r['efficiency'] > 0 for r in rows)


@needs_8
def test_sgn_step_data_sharded():
    """Fused comparison kernel with the batch axis sharded over 8 devices:
    signs recombine correctly for values crossing zero."""
    t, m, l, k = 1, 3, 6, 8
    from mpyc_tpu import gmpy
    p = int(gmpy.next_prime(1 << (l + k + 4)))
    F = finfields.GF(p)
    ctx = prime_field_ctx(p)
    n = 1 << 9
    rng = rng_mod.KeccakRNG(b'\x09' * 32)
    base = np.array([-31, -2, -1, 0, 1, 2, 17, 30], dtype=object)
    vals = np.tile(base, n // 8)
    sh = thresha.np_random_split(F, F.array(vals % p), t, m, rng)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ('data',))
    shard = NamedSharding(mesh, P(None, 'data', None))
    data = jax.device_put(jnp.asarray(np.asarray(sh.data)), shard)
    state = _state(b'sgn-mesh')
    ctr = jnp.zeros(2, jnp.uint32)

    step = pipelines.make_sgn_step(p, t, m, l, k)
    out, _ = step(data, state, ctr)
    got = _recombine_ints(F, ctx, np.asarray(out), t)
    got = np.array([int(v) - p if int(v) > p // 2 else int(v) for v in got])
    expect = np.sign(vals.astype(np.int64))
    assert (got == expect).all()
