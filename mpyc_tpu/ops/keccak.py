"""Keccak-f[1600] / SHAKE128 on the device, bit-exact with hashlib.

Lanes are 64-bit, represented as (hi, lo) uint32 pairs so the kernel runs on
TPU integer lanes without 64-bit emulation. The permutation is fully unrolled
(24 rounds of XOR/rotate/AND graphs) and vectorizes over any batch shape —
one batch element = one independent sponge instance.

Used for:
  * the PRSS pseudorandom function (reference semantics:
    /root/reference/mpyc/thresha.py:220-266 uses shake_128(key + input));
  * counter-mode batched randomness: many single-block sponges evaluated in
    parallel instead of one long sequential squeeze (TPU-first delta — the
    sequential reference stream cannot be parallelized).
"""

from __future__ import annotations

import functools
from hashlib import shake_128

import numpy as np
from mpyc_tpu.utils.lazyjax import jax, jnp, jit as _lazy_jit

U32 = np.uint32

RATE = 168  # shake128 rate in bytes (1344 bits); 21 lanes
N_LANES = 25

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# rotation offsets r[x][y] for lane A[x, y] (index x + 5 y)
_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]


def _rot64(hi, lo, r):
    """Rotate a 64-bit (hi, lo) pair left by r (static)."""
    r %= 64
    if r == 0:
        return hi, lo
    if r == 32:
        return lo, hi
    if r < 32:
        nhi = (hi << r) | (lo >> (32 - r))
        nlo = (lo << r) | (hi >> (32 - r))
        return nhi, nlo
    r -= 32
    nhi = (lo << r) | (hi >> (32 - r))
    nlo = (hi << r) | (lo >> (32 - r))
    return nhi, nlo


_RC_ARR = np.array([[rc >> 32, rc & 0xFFFFFFFF] for rc in _RC],
                   dtype=np.uint32)


def keccak_f(hi, lo):
    """One Keccak-f[1600] permutation.

    hi, lo: lists of 25 uint32 arrays (arbitrary common batch shape).
    Returns new (hi, lo) lists. The 24 rounds run under a fori_loop (one
    round traced) to keep XLA graphs small; the round body is elementwise
    XOR/rotate/AND, fully vectorized over the batch.
    """
    shape = jnp.broadcast_shapes(*(x.shape for x in hi), *(x.shape for x in lo))
    state = jnp.stack([jnp.broadcast_to(x, shape) for x in hi]
                      + [jnp.broadcast_to(x, shape) for x in lo], axis=0)
    rc_arr = jnp.asarray(_RC_ARR)

    def round_body(rnd, st):
        hi = [st[i] for i in range(25)]
        lo = [st[25 + i] for i in range(25)]
        hi, lo = _keccak_round(hi, lo, rc_arr[rnd, 0], rc_arr[rnd, 1])
        return jnp.stack(hi + lo, axis=0)

    state = jax.lax.fori_loop(0, 24, round_body, state)
    return [state[i] for i in range(25)], [state[25 + i] for i in range(25)]


def _keccak_round(hi, lo, rc_hi, rc_lo):
    if True:  # single round (theta, rho+pi, chi, iota)
        # theta
        chi_ = [None] * 5
        clo_ = [None] * 5
        for x in range(5):
            h = hi[x]
            l = lo[x]
            for y in range(1, 5):
                h = h ^ hi[x + 5 * y]
                l = l ^ lo[x + 5 * y]
            chi_[x] = h
            clo_[x] = l
        for x in range(5):
            th, tl = _rot64(chi_[(x + 1) % 5], clo_[(x + 1) % 5], 1)
            dh = chi_[(x + 4) % 5] ^ th
            dl = clo_[(x + 4) % 5] ^ tl
            for y in range(5):
                hi[x + 5 * y] = hi[x + 5 * y] ^ dh
                lo[x + 5 * y] = lo[x + 5 * y] ^ dl
        # rho + pi
        bh = [None] * 25
        bl = [None] * 25
        for x in range(5):
            for y in range(5):
                nx, ny = y, (2 * x + 3 * y) % 5
                bh[nx + 5 * ny], bl[nx + 5 * ny] = _rot64(
                    hi[x + 5 * y], lo[x + 5 * y], _ROT[x][y])
        # chi
        for y in range(5):
            row_h = [bh[x + 5 * y] for x in range(5)]
            row_l = [bl[x + 5 * y] for x in range(5)]
            for x in range(5):
                hi[x + 5 * y] = row_h[x] ^ (~row_h[(x + 1) % 5] & row_h[(x + 2) % 5])
                lo[x + 5 * y] = row_l[x] ^ (~row_l[(x + 1) % 5] & row_l[(x + 2) % 5])
        # iota
        hi[0] = hi[0] ^ rc_hi
        lo[0] = lo[0] ^ rc_lo
    return hi, lo


def _pad_shake128(data: bytes) -> bytes:
    """Multi-rate padding for shake128 (domain 0x1F), single or multi block."""
    q = RATE - (len(data) % RATE)
    pad = bytearray(q)
    pad[0] = 0x1F
    pad[-1] |= 0x80
    return data + bytes(pad)


def _absorb_host(data: bytes):
    """Absorb padded input on the host -> initial lane words (np arrays).

    Returns (hi, lo): two (25,) uint32 np arrays if input fits one block,
    otherwise runs the permutation per extra block (host inputs are tiny:
    key + uci counters).
    """
    padded = _pad_shake128(data)
    hi = [np.uint32(0)] * N_LANES
    lo = [np.uint32(0)] * N_LANES
    n_blocks = len(padded) // RATE
    for b in range(n_blocks):
        blk = padded[b * RATE:(b + 1) * RATE]
        for i in range(RATE // 8):
            w = int.from_bytes(blk[8 * i:8 * i + 8], 'little')
            hi[i] = np.uint32(int(hi[i]) ^ (w >> 32))
            lo[i] = np.uint32(int(lo[i]) ^ (w & 0xFFFFFFFF))
        if b < n_blocks - 1:
            st = _keccak_f_state(jnp.asarray(
                np.stack([np.array(hi, np.uint32), np.array(lo, np.uint32)])))
            st = np.asarray(st)
            hi = [np.uint32(v) for v in st[0]]
            lo = [np.uint32(v) for v in st[1]]
    return hi, lo


@_lazy_jit
def _keccak_f_state(state):
    """keccak_f on a (2, 25) scalar state (hi row 0, lo row 1)."""
    hi, lo = keccak_f([state[0, i] for i in range(N_LANES)],
                      [state[1, i] for i in range(N_LANES)])
    return jnp.stack([jnp.stack(hi), jnp.stack(lo)])


@functools.partial(_lazy_jit, static_argnums=(1, 2, 3))
def _squeeze_ctr(state_words, n_instances: int, ctr_lane: int,
                 base: int = 0):
    """Counter-mode parallel squeeze.

    state_words: (2, 25) uint32 (hi, lo) absorbed state of the padded
    message prefix||pad8||ctr0 (counter field zero).  Lane ``ctr_lane``
    holds the 8-byte counter field of the message, so XORing instance j's
    counter into its low word yields exactly the absorbed state of
    shake_128(prefix || pad8 || ctr_j) — every instance is an independent,
    hashlib-checkable single-block sponge.

    ``base`` offsets the counters (instances base..base+n-1): fused
    protocol programs drawing several independent streams from one
    absorbed state partition the counter space with static offsets.

    Returns (n_instances, 42) uint32: the rate portion (168 bytes) of each
    instance's first squeezed block, words interleaved [lo0, hi0, lo1, ...]
    in byte order.
    """
    ctr = jax.lax.broadcasted_iota(jnp.uint32, (n_instances, 1), 0)[:, 0] \
        + jnp.uint32(base)
    hi = [jnp.broadcast_to(state_words[0, i], (n_instances,))
          for i in range(N_LANES)]
    lo = [jnp.broadcast_to(state_words[1, i], (n_instances,))
          for i in range(N_LANES)]
    lo[ctr_lane] = lo[ctr_lane] ^ ctr
    hi, lo = keccak_f(hi, lo)
    # output 21 rate lanes, little-endian word order (lo then hi per lane)
    words = []
    for i in range(RATE // 8):
        words.append(lo[i])
        words.append(hi[i])
    return jnp.stack(words, axis=-1)


@functools.partial(_lazy_jit, static_argnums=(1, 2, 3))
def _squeeze_ctr_pallas(state_words, n_instances: int, ctr_lane: int,
                        base: int = 0):
    """Counter-mode squeeze as a Pallas TPU kernel.

    The 50-word sponge state lives in registers/VMEM for all 24 unrolled
    rounds (the XLA fori_loop variant round-trips the state through HBM
    every round, ~5x slower). Grid tiles of R x 128 instances; output block
    (R*128, 42) words. jit-cached per instance count: tracing the unrolled
    permutation costs seconds of host time, so it must happen once, not per
    call.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = 8                      # sublanes per tile; tile = R*128 instances
    TILE = R * 128
    n_pad = -(-n_instances // TILE) * TILE
    grid = n_pad // TILE
    rc = _RC_ARR

    def kernel(state_ref, out_ref):
        i = pl.program_id(0)
        ctr0 = (jnp.uint32(base) + jnp.uint32(i * TILE)
                + jax.lax.broadcasted_iota(jnp.uint32, (R, 128), 0)
                * jnp.uint32(128)
                + jax.lax.broadcasted_iota(jnp.uint32, (R, 128), 1))
        hi = [jnp.full((R, 128), state_ref[0, k]) for k in range(N_LANES)]
        lo = [jnp.full((R, 128), state_ref[1, k]) for k in range(N_LANES)]
        lo[ctr_lane] = lo[ctr_lane] ^ ctr0
        for rnd in range(24):
            hi, lo = _keccak_round(hi, lo, jnp.uint32(int(rc[rnd, 0])),
                                   jnp.uint32(int(rc[rnd, 1])))
        # word-major output keeps the 128-lane minor dim aligned
        for k in range(RATE // 8):
            out_ref[0, 2 * k] = lo[k]
            out_ref[0, 2 * k + 1] = hi[k]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((grid, 42, R, 128), jnp.uint32),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 42, R, 128), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )(state_words)
    # (grid, 42, R, 128) -> (n_pad, 42): instance = g*TILE + r*128 + c
    out = out.transpose(0, 2, 3, 1).reshape(n_pad, 42)
    return out[:n_instances]


# host-permutation constant tables (lane index x + 5y), all (25,) vectors:
#   _NP_PI_SRC[k]  source lane for rho+pi destination k
#   _NP_ROTL/_NP_ROTR  rho rotation shift pairs for destination k
#   _NP_CHI1/_NP_CHI2  chi neighbor lanes
#   _NP_TH1/_NP_TH4    theta column neighbors per lane
def _np_tables():
    pi_src = np.empty(25, np.intp)
    rotl = np.empty(25, np.uint64)
    for x in range(5):
        for y in range(5):
            dst = y + 5 * ((2 * x + 3 * y) % 5)
            pi_src[dst] = x + 5 * y
            rotl[dst] = _ROT[x][y] % 64
    rotr = (np.uint64(64) - rotl) % np.uint64(64)
    chi1 = np.array([(k % 5 + 1) % 5 + 5 * (k // 5) for k in range(25)],
                    np.intp)
    chi2 = np.array([(k % 5 + 2) % 5 + 5 * (k // 5) for k in range(25)],
                    np.intp)
    th1 = np.array([(k % 5 + 1) % 5 for k in range(25)], np.intp)
    th4 = np.array([(k % 5 + 4) % 5 for k in range(25)], np.intp)
    return pi_src, rotl, rotr, chi1, chi2, th1, th4


_NP_PI_SRC, _NP_ROTL, _NP_ROTR, _NP_CHI1, _NP_CHI2, _NP_TH1, _NP_TH4 = \
    _np_tables()
_NP_ROT_NZ = _NP_ROTL != 0


def _keccak_f_np(A):
    """Vectorized host Keccak-f[1600]: (n, 25) uint64 lanes, index x + 5y.

    Bit-exact with the device kernel; used for small counter-mode batches
    where XLA dispatch/compile latency dwarfs the permutation cost.
    All lane loops are table-driven gathers (~15 numpy ops per round)."""
    one, s63 = np.uint64(1), np.uint64(63)
    for rc in _RC:
        # theta
        B = A.reshape(-1, 5, 5)                     # [n, y, x]
        C = B[:, 0] ^ B[:, 1] ^ B[:, 2] ^ B[:, 3] ^ B[:, 4]
        t = C[:, _NP_TH1]                           # C[(x+1)%5] per lane
        D = C[:, _NP_TH4] ^ ((t << one) | (t >> s63))
        A = A ^ D
        # rho + pi (gather + vector shifts; shift-by-64 lanes masked off)
        v = A[:, _NP_PI_SRC]
        Bst = np.where(_NP_ROT_NZ,
                       (v << _NP_ROTL) | (v >> _NP_ROTR), v)
        # chi
        A = Bst ^ (~Bst[:, _NP_CHI1] & Bst[:, _NP_CHI2])
        # iota
        A[:, 0] ^= np.uint64(rc)
    return A


def _squeeze_ctr_host(state, n_instances: int, ctr_lane: int):
    """Host counter-mode squeeze, bit-exact with _squeeze_ctr.

    state: (2, 25) uint32 np array. Returns (n_instances, 42) uint32."""
    lanes = ((state[0].astype(np.uint64) << np.uint64(32))
             | state[1].astype(np.uint64))          # (25,)
    st = np.repeat(lanes[None, :], n_instances, axis=0)
    st[:, ctr_lane] ^= np.arange(n_instances, dtype=np.uint64)
    st = _keccak_f_np(st)
    out = np.empty((n_instances, 42), np.uint32)
    out[:, 0::2] = (st[:, :21] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    out[:, 1::2] = (st[:, :21] >> np.uint64(32)).astype(np.uint32)
    return out


def _squeeze_ctr_hashlib(msg0: bytes, n_instances: int, ctr_off: int):
    """Small-draw path: each instance via one C-speed hashlib call (~1.5us).

    msg0 is the full counter-mode message with a zero counter field at byte
    offset ctr_off; instance j hashes msg0 with the counter field replaced
    by j (little-endian), giving the same bytes as the batched kernels.
    """
    head, tail = msg0[:ctr_off], msg0[ctr_off + 8:]
    raw = b''.join(
        shake_128(head + j.to_bytes(8, 'little') + tail).digest(RATE)
        for j in range(n_instances))
    return np.frombuffer(raw, '<u4').reshape(n_instances, 42)


_HOST_SHAKE_N = 0 if __import__('os').getenv('MPYC_TPU_NOHOSTOPS') else 512

_PALLAS_OK = None


def _pallas_available():
    global _PALLAS_OK
    if _PALLAS_OK is None:
        import sys
        if 'jax' not in sys.modules:
            return False        # host-only plane: don't force the import
        try:
            _PALLAS_OK = jax.default_backend() not in ('cpu',)
        except Exception:
            _PALLAS_OK = False
    return _PALLAS_OK


# hashlib wins below this count (~1.5us/instance vs ~0.7ms fixed numpy cost)
_HASHLIB_N = 0 if __import__('os').getenv('MPYC_TPU_NOHOSTOPS') else 256


def shake128_ctr_blocks(prefix: bytes, n_instances: int):
    """n_instances independent 168-byte SHAKE128 blocks, counter-separated.

    Instance j's bytes equal shake_128(prefix || pad8 || ctr_j): the prefix
    is zero-padded to an 8-byte boundary and followed by the 8-byte LE
    counter, so every instance is a distinct single-block sponge input,
    verifiable with hashlib, and the batched kernels reach instance j by
    XORing j into one aligned message lane of the shared absorbed state.
    (A parallel counter-mode PRF construction — the sequential hashlib
    stream of the reference PRF, /root/reference/mpyc/thresha.py:220-266,
    cannot be parallelized.)

    Three bit-identical execution paths by draw size: C-speed hashlib per
    instance (small protocol draws), one vectorized numpy permutation
    (medium), and the jit/Pallas device kernels (large; instance count
    padded to a power of two so XLA compilations are shared across batch
    sizes, state resident in VMEM for all rounds on TPU backends).
    """
    assert len(prefix) <= 144, 'prefix must leave room for the counter lane'
    ctr_off = -(-len(prefix) // 8) * 8
    msg0 = prefix + bytes(ctr_off - len(prefix)) + bytes(8)
    if 0 < n_instances <= _HASHLIB_N:
        return _squeeze_ctr_hashlib(msg0, int(n_instances), ctr_off)
    hi, lo = _absorb_host(msg0)
    state = np.stack([np.array(hi, np.uint32), np.array(lo, np.uint32)])
    import sys
    if n_instances <= _HOST_SHAKE_N or \
            ('jax' not in sys.modules and _HOST_SHAKE_N):
        # host path: native C Keccak-f when available (~4x the numpy
        # permutation and no array churn), else vectorized numpy
        from mpyc_tpu.ops import hostfield
        lanes = ((state[0].astype(np.uint64) << np.uint64(32))
                 | state[1].astype(np.uint64))
        out = hostfield.keccak_ctr_blocks(lanes, ctr_off // 8,
                                          int(n_instances))
        if out is not None:
            return out
        return _squeeze_ctr_host(state, int(n_instances), ctr_off // 8)
    n_pad = max(8, 1 << (int(n_instances) - 1).bit_length())
    if _pallas_available() and n_pad >= 1024:
        return _squeeze_ctr_pallas(jnp.asarray(state), int(n_instances),
                                   ctr_off // 8)
    out = _squeeze_ctr(jnp.asarray(state), n_pad, ctr_off // 8)
    if n_pad <= 64:
        # small draws feed host-resident protocol data: pull to numpy once
        return np.asarray(out)[:n_instances]
    return out[:n_instances]


@functools.partial(_lazy_jit, static_argnums=(1,))
def _squeeze_seq(state_words, n_blocks: int):
    """Sequential squeeze of n_blocks rate-blocks (bit-exact hashlib stream).

    Returns (n_blocks, 42) uint32 words. Sequential in n_blocks (latency
    chain) — used by the compat PRF for test-vector parity on small sizes.
    """
    hi = [state_words[0, i] for i in range(N_LANES)]
    lo = [state_words[1, i] for i in range(N_LANES)]
    out = []
    for _ in range(n_blocks):
        hi, lo = keccak_f(hi, lo)
        words = []
        for i in range(RATE // 8):
            words.append(lo[i])
            words.append(hi[i])
        out.append(jnp.stack(words, axis=-1))
    return jnp.stack(out, axis=0)


def shake128_device(data: bytes, n_bytes: int) -> bytes:
    """Bit-exact shake_128(data).digest(n_bytes) computed on the device.

    Small-input utility used to validate the kernel against hashlib and for
    host-side compat paths when hashlib is unavailable.
    """
    hi, lo = _absorb_host(data)
    state = np.stack([np.array(hi, np.uint32), np.array(lo, np.uint32)])
    n_blocks = -(-n_bytes // RATE)
    words = np.asarray(_squeeze_seq(jnp.asarray(state), n_blocks))
    raw = words.astype('<u4').tobytes()
    return raw[:n_bytes]
