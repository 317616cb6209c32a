"""Native host-field batch kernel tests (ops/hostfield.py +
native/hostfield.cpp) and the per-party-plane protocol paths they serve.

The deployment plane's local kernels are the C batch library (uint64
Montgomery residues; reference counterparts: mpyc/thresha.py:23-44 Shamir
split, :88-116 recombine, finfields to_bytes/from_bytes wire marshaling).
Kernels are verified bit-exact against Python-int math for both limb
widths (L=1: p < 2^32, L=2: p < 2^64), and the end-to-end multi-party
round is verified by a spawned 3-process TCP run over the native-path
batch sizes.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

import conftest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from mpyc_tpu import finfields, thresha
from mpyc_tpu.ops import hostfield
from mpyc_tpu.ops.fieldops import prime_field_ctx


def _hf(bits):
    p, _, _ = finfields.find_prime_root(bits)
    hf = hostfield.host_ctx(prime_field_ctx(p))
    assert hf is not None
    return p, hf


@pytest.mark.parametrize('bits', [29, 32, 61, 64])
def test_elementwise_kernels(bits):
    p, hf = _hf(bits)
    R = 1 << (32 * hf.L)
    rnd = np.random.default_rng(bits)
    n = 1500
    a = [int(x) % p for x in rnd.integers(0, 1 << 63, n)]
    b = [int(x) % p for x in rnd.integers(0, 1 << 63, n)]
    am = np.array([x * R % p for x in a], np.uint64)
    bm = np.array([x * R % p for x in b], np.uint64)
    assert (hf.mul(am, bm) == np.array(
        [x * y % p * R % p for x, y in zip(a, b)], np.uint64)).all()
    assert (hf.add(am, bm) == np.array(
        [(x + y) % p * R % p for x, y in zip(a, b)], np.uint64)).all()
    assert (hf.sub(am, bm) == np.array(
        [(x - y) % p * R % p for x, y in zip(a, b)], np.uint64)).all()
    assert (hf.neg(am) == np.array(
        [-x % p * R % p for x in a], np.uint64)).all()
    c = 12345 % p
    assert (hf.mulc(am, c * R % p) == np.array(
        [x * c % p * R % p for x in a], np.uint64)).all()
    assert (hf.to_plain(am) == np.array(a, np.uint64)).all()
    assert (hf.from_plain(np.array(a, np.uint64)) == am).all()


@pytest.mark.parametrize('bits', [32, 64])
def test_wire_roundtrip_matches_reference_marshaling(bits):
    p, hf = _hf(bits)
    F = finfields.GF(p)
    R = 1 << (32 * hf.L)
    rnd = np.random.default_rng(7)
    n = 1100
    a = [int(x) % p for x in rnd.integers(0, 1 << 63, n)]
    am = np.array([x * R % p for x in a], np.uint64)
    bl = F.byte_length
    wire = hf.to_wire(am, bl)
    # identical bytes to the object-plane marshaling (plain LE values)
    assert wire == F.to_bytes(a)
    assert (hf.from_wire(wire, n, bl) == am).all()
    # and the object plane can parse the native wire back
    assert F.from_bytes(wire) == a


@pytest.mark.parametrize('bits,t,m', [(64, 1, 3), (64, 2, 5), (32, 1, 4)])
def test_split_recombine_cycle(bits, t, m):
    p, hf = _hf(bits)
    F = finfields.GF(p)
    R = 1 << (32 * hf.L)
    rnd = np.random.default_rng(t * m)
    n = 1200
    secrets_ = [int(x) % p for x in rnd.integers(0, 1 << 63, n)]
    sec = np.array([x * R % p for x in secrets_], np.uint64)
    coefs = hf.chacha_uniform(b'\x42' * 32, b'nonce-tst-01', t * n)
    rows = hf.split(sec, coefs, t, m)
    # recombine any t+1 of the m rows back to the secrets
    for xs in (tuple(range(1, t + 2)), tuple(range(m - t, m + 1))):
        vec = thresha._recombination_vector(F, xs, 0)
        acc = np.zeros(n, np.uint64)
        for j, x in enumerate(xs):
            hf.axpy(acc, rows[x - 1], int(vec[j]))
        assert (acc == sec).all(), xs
    # wire-path recombination gives the same result
    bl = F.byte_length
    xs = tuple(range(1, t + 2))
    vec = thresha._recombination_vector(F, xs, 0)
    acc = np.zeros(n, np.uint64)
    for j, x in enumerate(xs):
        hf.axpy_wire(acc, hf.to_wire(rows[x - 1], bl), n, bl, int(vec[j]))
    assert (acc == sec).all()


def test_stream_uniform_exact_and_deterministic():
    for bits in (29, 64):
        p, hf = _hf(bits)
        R = 1 << (32 * hf.L)
        l = hf._uniform_l
        rnd = np.random.default_rng(3)
        n = 777
        stream = rnd.integers(0, 256, n * l, dtype=np.int64).astype(np.uint8)
        got = hf.stream_uniform(stream, n)
        raw = stream.tobytes()
        exp = np.array(
            [int.from_bytes(raw[i * l:(i + 1) * l], 'little') % p * R % p
             for i in range(n)], np.uint64)
        assert (got == exp).all()
        a = hf.chacha_uniform(b'k' * 32, b'n' * 12, n)
        assert (a == hf.chacha_uniform(b'k' * 32, b'n' * 12, n)).all()
        assert (a != hf.chacha_uniform(b'k' * 32, b'm' * 12, n)).any()


def test_chacha_rfc8439_block():
    """The keystream generator matches the RFC 8439 block function."""
    p, hf = _hf(64)
    from mpyc_tpu.ops.hostfield import _lib, _p8
    key = np.frombuffer(bytes(range(32)), np.uint8)
    nonce = np.frombuffer(bytes.fromhex('000000090000004a00000000'), np.uint8)
    out = np.empty(128, np.uint8)
    _lib.hf_chacha_stream(_p8(key), _p8(nonce), _p8(out), 128)
    exp = bytes.fromhex(
        '10f1e7e4d13b5915500fdd1fa32071c4c7d1f4c733c068030422aa9ac3d46c4e'
        'd2826446079faa0914c2d705d98b02a2b5129cd1de164eb9cbd083e8a2503c4e')
    assert out[64:128].tobytes() == exp  # counter-1 block (we start at 0)


@pytest.mark.parametrize('bits', [68, 96, 160, 335])
def test_generic_width_kernels(bits):
    """CIOS generic-limb kernels (fields beyond 64 bits: fxp/SecInt(64)/
    multilateration widths), bit-exact vs Python ints."""
    p, hf = _hf(bits)
    L = hf.L
    assert hf.stride == L
    R = 1 << (32 * L)
    rnd = np.random.default_rng(bits)
    n = 400
    a = [int.from_bytes(rnd.bytes(L * 4), 'little') % p for _ in range(n)]
    b = [int.from_bytes(rnd.bytes(L * 4), 'little') % p for _ in range(n)]

    def enc(vals):
        out = np.empty(len(vals) * L, np.uint32)
        for i, v in enumerate(vals):
            mv = v * R % p
            for j in range(L):
                out[i * L + j] = (mv >> (32 * j)) & 0xFFFFFFFF
        return out

    def dec(flat):
        out = []
        Rinv = pow(R, -1, p)
        for i in range(len(flat) // L):
            v = sum(int(flat[i * L + j]) << (32 * j) for j in range(L))
            out.append(v * Rinv % p)
        return out

    am, bm = enc(a), enc(b)
    assert dec(hf.mul(am, bm)) == [x * y % p for x, y in zip(a, b)]
    assert dec(hf.add(am, bm)) == [(x + y) % p for x, y in zip(a, b)]
    assert dec(hf.sub(am, bm)) == [(x - y) % p for x, y in zip(a, b)]
    assert dec(hf.neg(am)) == [-x % p for x in a]
    assert dec(hf.mulc_int(am, 98765)) == [x * 98765 % p for x in a]
    # wire roundtrip matches the object-plane marshaling
    F = finfields.GF(p)
    bl = F.byte_length
    wire = hf.to_wire(am, bl)
    assert wire == F.to_bytes(a)
    assert (hf.from_wire(wire, n, bl) == am).all()
    # stream fold exactness
    l = hf._uniform_l
    stream = rnd.integers(0, 256, n * l, dtype=np.int64).astype(np.uint8)
    raw = stream.tobytes()
    got = dec(hf.stream_uniform(stream, n))
    assert got == [int.from_bytes(raw[i * l:(i + 1) * l], 'little') % p
                   for i in range(n)]
    # fused reshare send + recombine cycle (t=1, m=3)
    t, m = 1, 3
    own, wire3 = hf.reshare_send(am, t, m, 1, b'\x07' * 32, b'nonce-g-0001',
                                 bl)
    # rows: party0 from wire, party1 own (mont), recombine at x=1,2
    from mpyc_tpu import thresha
    vec = thresha._recombination_vector(F, (1, 2), 0)
    acc = hf.recombine_rows(own, int(vec[1]), [wire3[0]], [int(vec[0])],
                            n, bl)
    assert (acc == am).all()


MP_SCRIPT = r"""
import sys
sys.path.insert(0, %r)
import numpy as np
from mpyc_tpu.runtime import mpc

mpc.run(mpc.start())
secint = mpc.SecInt(32)
n = 5000   # above the large-batch native cutoffs
vals = np.arange(n, dtype=object)
other = ((vals * 7) + 3) %% 1001
A = mpc.input(secint.array(vals), senders=0)
B = mpc.input(secint.array(other), senders=1)
C = mpc.np_multiply(A, B)          # native reshare round
D = mpc.np_add(C, A)               # native elementwise add
got = np.asarray(mpc.run(mpc.output(D)))
assert (got == vals * other + vals).all(), 'native-path mul/add mismatch'
E = mpc.np_multiply(C, B)          # chained second round
got2 = np.asarray(mpc.run(mpc.output(E)))
assert (got2 == vals * other * other).all(), 'chained native round mismatch'

# comparisons over the native sgn path (fused hfg_sgn_prepare + pooled
# random bits), small arrays + scalars
sm = np.array([-5, -1, 0, 1, 3, -8000, 8000, 2], dtype=object)
S = mpc.input(secint.array(sm), senders=2)
lt = np.asarray(mpc.run(mpc.output(mpc.np_sgn(S, LT=True))))
assert (lt == (sm.astype(np.int64) < 0)).all(), 'native sgn LT mismatch'
sg = np.asarray(mpc.run(mpc.output(mpc.np_sgn(S))))
assert (sg == np.sign(sm.astype(np.int64))).all(), 'native sgn mismatch'
eq = np.asarray(mpc.run(mpc.output(mpc.np_sgn(S, EQ=True))))
assert (eq == (sm.astype(np.int64) == 0)).all(), 'native sgn EQ mismatch'
x = mpc.input(secint(-7), senders=0)
y = mpc.input(secint(5), senders=1)
assert mpc.run(mpc.output(x < y)) == 1, 'scalar lt mismatch'

# fixed-point (68-bit field: generic-width native kernels)
secfxp = mpc.SecFxp(24, 12)
fv = np.array([1.5, -2.25, 0.0, 3.0], dtype=float)
Fv = mpc.input(secfxp.array(fv), senders=0)
prod = np.asarray(mpc.run(mpc.output(mpc.np_multiply(Fv, Fv))))
assert np.allclose(prod, fv * fv, atol=2**-11), 'fxp square mismatch'
flt = np.asarray(mpc.run(mpc.output(mpc.np_less(Fv, 0))))
assert (flt == (fv < 0)).all(), 'fxp less mismatch'
mpc.run(mpc.shutdown())
print('HF-MP-OK', mpc.pid)
"""


@pytest.mark.slow
def test_multiparty_native_rounds(tmp_path):
    """3 real TCP party processes over native-path batch sizes."""
    script = tmp_path / 'mp_hf.py'
    script.write_text(MP_SCRIPT % REPO)
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    env.pop('XLA_FLAGS', None)
    for attempt in range(2):
        out = subprocess.run(
            [sys.executable, str(script), '-M3',
             '-B', str(conftest.free_base_port())],
            capture_output=True, text=True, timeout=600, env=env,
            cwd=str(tmp_path))
        if out.returncode == 0:
            break
        # a lingering party from a previous spawned-process test can
        # still hold the chosen base port; retry once on a fresh one
    assert out.returncode == 0, (out.stdout[-1000:], out.stderr[-2000:])
    assert 'HF-MP-OK 0' in out.stdout
