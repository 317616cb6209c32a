"""Tests for threshold secret sharing (compat + device planes).

Mirrors the coverage of the reference tests/test_thresha.py: split/recombine
round-trips over several fields and thresholds, PRSS share-of-secret and
share-of-zero properties, PRF vectors.
"""
import itertools
import random

import numpy as np
import pytest

from mpyc_tpu import thresha, finfields, gfpx
from mpyc_tpu.ops import rng as rng_mod


class _FakeSecrets:
    def __init__(self, seed):
        self._r = random.Random(seed)

    def randbelow(self, n):
        return self._r.randrange(n)


def test_split_recombine_host_fields():
    for field, t_max, m in [
        (finfields.GF(19), 2, 5),
        (finfields.GF(2), 0, 1),
        (finfields.GF(gfpx.GFpX(2)('x^3+x+1')), 2, 5),
        (finfields.GF(gfpx.GFpX(3)([1, 0, 1])), 3, 8),
    ]:
        for t in range(t_max + 1):
            secrets_list = [field(random.randrange(field.order))
                            for _ in range(4)]
            shares = thresha.random_split(field, secrets_list, t, m)
            pts = [(i + 1, shares[i]) for i in range(m)]
            rec = thresha.recombine(field, random.sample(pts, t + 1))
            # split/recombine return raw values (reference behavior):
            # compare after reduction into the field
            assert all(field(a) == b for a, b in zip(rec, secrets_list))


def test_split_known_vector():
    """Deterministic coefficients -> deterministic shares (regression anchor)."""
    F = finfields.GF(19)
    old = thresha.secrets
    try:
        thresha.secrets = _FakeSecrets(42)
        shares = thresha.random_split(F, [3, 17], 2, 5)
    finally:
        thresha.secrets = old
    as_ints = [[int(v) for v in row] for row in shares]
    # verified bit-exact against the reference implementation
    assert as_ints == [[6, 13], [15, 6], [11, 15], [13, 2], [2, 5]]


def test_recombine_multipoint():
    F = finfields.GF(19)
    # f(X) = 3 + 2X: shares at 1..3 are 5, 7, 9
    pts = [(1, [5]), (2, [7]), (3, [9])]
    vals = thresha.recombine(F, pts, [0, 4, 5])
    assert [v[0] % 19 for v in vals] == [3, 11, 13]


def test_prf_vectors():
    key = bytes(range(16))
    # power-of-2 bound: exact low bits, no widening
    prf = thresha.PRF(key, 256)
    assert prf.byte_length == 1
    from hashlib import shake_128
    stream = shake_128(key + b'\x01' * 8).digest(5)
    assert prf(b'\x01' * 8, 5) == list(stream)
    # non-power-of-2 bound: widened by key length
    prf19 = thresha.PRF(key, 19)
    assert prf19.byte_length == 1 + len(key)
    vals = prf19(b'\x02' * 8, 100)
    assert all(0 <= v < 19 for v in vals)
    arr = prf19(b'\x02' * 8, (10, 10))
    assert arr.shape == (10, 10) and list(arr.reshape(-1)) == vals
    assert prf19(b'\x02' * 8) == vals[0]
    # zero bound edge
    prf1 = thresha.PRF(key, 1)
    assert prf1(b'x', 3) == [0, 0, 0]


def test_prss_host():
    m, t = 4, 1
    F = finfields.GF(19)
    subsets = list(itertools.combinations(range(m), m - t))
    prfs = {S: thresha.PRF(bytes([sum(S) + 1] * 16), 19) for S in subsets}
    rows = [thresha.pseudorandom_share(F, m, i, prfs, b'\x05' * 8, 3)
            for i in range(m)]
    # any t+1 parties recombine to the same secrets
    r_a = thresha.recombine(F, [(1, rows[0]), (2, rows[1])])
    r_b = thresha.recombine(F, [(3, rows[2]), (4, rows[3])])
    assert [int(v) for v in r_a] == [int(v) for v in r_b]
    # zero sharings recombine (2t+1 parties) to zero
    z = [thresha.pseudorandom_share_zero(F, m, i, prfs, b'\x06' * 8, 3)
         for i in range(m)]
    rec = thresha.recombine(F, [(i + 1, z[i]) for i in range(2 * t + 1)])
    assert all(int(v) == 0 for v in rec)


@pytest.fixture(scope='module')
def F64():
    p, _, _ = finfields.find_prime_root(64)
    return finfields.GF((p, 2, p - 1))


def test_np_split_recombine(F64):
    p = F64.modulus
    rng = rng_mod.KeccakRNG(b'\x01' * 32)
    secrets_list = [3, 17, p - 1, 0]
    s = F64.array(secrets_list)
    for (m, t) in ((3, 1), (5, 2), (1, 0)):
        sh = thresha.np_random_split(F64, s, t, m, rng)
        assert sh.shape == (m, 4)
        rec = thresha.np_recombine(F64, [(i + 1, sh[i]) for i in range(t + 1)])
        assert [int(v) for v in rec.value] == [x % p for x in secrets_list]


def test_np_prss(F64):
    p = F64.modulus
    m, t = 3, 1
    subsets = list(itertools.combinations(range(m), m - t))
    prfs = {S: thresha.DevicePRF(bytes([sum(S) + 1] * 16), p) for S in subsets}
    rows = [thresha.np_pseudorandom_share(F64, m, i, prfs, b'\x05' * 8, 4)
            for i in range(m)]
    rows2 = [thresha.np_pseudorandom_share(F64, m, i, prfs, b'\x05' * 8, 4)
             for i in range(m)]
    assert all((a.value == b.value).all() for a, b in zip(rows, rows2))
    r01 = thresha.np_recombine(F64, [(1, rows[0]), (2, rows[1])])
    r02 = thresha.np_recombine(F64, [(1, rows[0]), (3, rows[2])])
    assert (r01.value == r02.value).all()
    z = [thresha.np_pseudorandom_share_0(F64, m, i, prfs, b'\x06' * 8, 4)
         for i in range(m)]
    rec = thresha.np_recombine(F64, [(i + 1, z[i]) for i in range(m)])
    assert all(int(v) == 0 for v in rec.value)


def test_device_prf_bits():
    prf = thresha.DevicePRF(bytes(16), 2)
    bits = np.asarray(prf.bits_uint32(b'\x00' * 8, (1000,)))
    assert set(np.unique(bits)) <= {0, 1}
    assert 300 < bits.sum() < 700
    # determinism
    bits2 = np.asarray(prf.bits_uint32(b'\x00' * 8, (1000,)))
    assert (bits == bits2).all()
    # different input -> different stream
    bits3 = np.asarray(prf.bits_uint32(b'\x01' * 8, (1000,)))
    assert (bits != bits3).any()
