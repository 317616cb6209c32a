"""Device randomness: counter-mode SHAKE128 streams mapped into fields.

Two generators:
  * KeccakRNG — cryptographic, counter-mode SHAKE128 (one parallel
    single-block sponge per 168-byte block). Default for protocol secrets
    (Shamir coefficients, masks), replacing the reference's
    ``secrets.randbelow`` loops (thresha.py:37,60).
  * FastRNG — jax.random (threefry); NOT cryptographic, for benchmarks.

Mapping uniform bytes into GF(p) follows the reference PRF convention
(thresha.py:226-236): for a non-power-of-2 bound, each value consumes
byte_length(bound-1) + 16 extra bytes and is reduced mod bound, making the
statistical distance to uniform < 2^-128; power-of-2 bounds take the low
bits exactly.
"""

from __future__ import annotations

import functools
import secrets

import numpy as np
from mpyc_tpu.utils.lazyjax import jax, jnp

from mpyc_tpu.ops import keccak
from mpyc_tpu.ops.fieldops import prime_field_ctx

_WIDEN_BYTES = 16  # statistical widening for mod-p reduction

# Fused dealer streams (models/pipelines.py) use word-aligned draws with
# 64-bit statistical widening: distance to uniform < 2^-64 per draw, far
# beyond the protocols' own statistical security (sec_param k = 30 by
# default), while keeping every draw a whole number of uint32 words so the
# stream->element mapping is a pure reshape (no byte gathers on device).
# The host PRF (thresha.PRF) keeps the reference's 128-bit convention for
# bit-exact PRSS parity.
_WIDEN_BYTES_FUSED = 8


def fused_draw_bytes(p: int) -> int:
    """Word-aligned per-draw byte width for fused pipeline streams."""
    b = ((p - 1).bit_length() + 7 >> 3) + _WIDEN_BYTES_FUSED
    return -(-b // 4) * 4


def _prod(shape):
    n = 1
    for s in shape:
        n *= int(s)
    return n


def words_to_elements(blocks, n: int, l: int, L: int):
    """(n_blocks, 42) uint32 words -> (n, n_chunks, L) uint32 wide values.

    Small elements (l <= 168 bytes) consume l bytes from within a single
    168-byte block (never straddling; block tails are discarded).  Large
    elements own ceil(l/168) whole consecutive blocks each.
    n_chunks = ceil(ceil(l/4) / L).
    """
    W = -(-l // 4)                  # uint32 words per element
    n_chunks = -(-W // L)
    xp = np if isinstance(blocks, np.ndarray) else jnp
    if l > keccak.RATE:
        # multi-block elements: bpe whole blocks per element, flattened
        bpe = -(-l // keccak.RATE)
        words = blocks.reshape(-1, bpe * (keccak.RATE // 4))[:n]
        if l % 4 == 0:
            usable = words[:, :W]
        else:
            b = xp.stack([(words >> (8 * j)) & 0xFF for j in range(4)],
                          axis=-1).reshape(n, -1)[:, :l]
            pad = W * 4 - l
            if pad:
                b = xp.pad(b, ((0, 0), (0, pad)))
            usable = sum((b[:, j::4][:, :W] << (8 * j))
                         for j in range(4)).astype(np.uint32)
    elif l % 4 == 0:
        k = keccak.RATE // l        # elements per block
        w_per = l // 4
        usable = blocks[:, :k * w_per].reshape(-1, w_per)[:n]
    else:
        # byte-granular path
        k = keccak.RATE // l
        b = xp.stack([(blocks >> (8 * j)) & 0xFF for j in range(4)],
                      axis=-1).reshape(blocks.shape[0], keccak.RATE)
        b = b[:, :k * l].reshape(-1, l)[:n]
        pad = W * 4 - l
        if pad:
            b = xp.pad(b, ((0, 0), (0, pad)))
        usable = sum((b[:, j::4][:, :W] << (8 * j)) for j in range(4)).astype(np.uint32)
    pad_w = n_chunks * L - W
    if pad_w:
        usable = xp.pad(usable, ((0, 0), (0, pad_w)))
    return usable.reshape(n, n_chunks, L)


@functools.lru_cache(maxsize=None)
def _squeeze_mont_kernel(p: int, l_bytes: int, ctr_lane: int):
    """Pallas kernel factory: counter-mode squeeze + field reduction fused.

    Maps the SHAKE128 stream into Montgomery-form GF(p) draws without the
    words leaving VMEM: 24 unrolled Keccak rounds per (8, 128) tile of
    sponge instances, then the per-draw radix reduction
    (value = sum_c chunk_c 2^(32Lc) mod p, one mont_mul per chunk) in
    registers. Replaces squeeze -> transpose -> words_to_elements ->
    reduce_chunks, which cost ~3x the permutation itself in HBM traffic
    (measured 7.5 ms vs 2.1 ms for a 210K-block stream).

    Stream convention identical to words_to_elements for word-aligned
    draws: draw i consumes words [i%epb * W : ...] of block i//epb.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from mpyc_tpu.ops import limb
    from mpyc_tpu.ops import keccak as kk

    assert l_bytes % 4 == 0
    ctx = prime_field_ctx(p)
    L = ctx.L
    W = l_bytes // 4
    nc = -(-W // L)
    epb = kk.RATE // l_bytes
    radix = [limb.int_to_limbs((pow(2, 32 * L * c, p) * ctx.R2) % p, L)
             for c in range(nc)]
    R = 8
    TILE = R * 128
    rc = kk._RC_ARR

    def kernel(state_ref, base_ref, out_ref):
        g = pl.program_id(0)
        ctr0 = (base_ref[0] + jnp.uint32(g * TILE)
                + jax.lax.broadcasted_iota(jnp.uint32, (R, 128), 0)
                * jnp.uint32(128)
                + jax.lax.broadcasted_iota(jnp.uint32, (R, 128), 1))
        hi = [jnp.full((R, 128), state_ref[0, k2]) for k2 in range(25)]
        lo = [jnp.full((R, 128), state_ref[1, k2]) for k2 in range(25)]
        lo[ctr_lane] = lo[ctr_lane] ^ ctr0
        for rnd in range(24):
            hi, lo = kk._keccak_round(hi, lo, jnp.uint32(int(rc[rnd, 0])),
                                      jnp.uint32(int(rc[rnd, 1])))
        words = []
        for i in range(kk.RATE // 8):
            words.append(lo[i])
            words.append(hi[i])
        zero = jnp.zeros((R, 128), jnp.uint32)

        def const(v):
            return [jnp.uint32(int(x)) for x in v]

        for j in range(epb):
            acc = None
            for c in range(nc):
                chunk = [words[j * W + c * L + q] if c * L + q < W else zero
                         for q in range(L)]
                term = limb.mont_mul(chunk, const(radix[c]),
                                     ctx.p_limbs, ctx.n0inv, unroll=True)
                acc = term if acc is None else \
                    limb.add_mod(acc, term, ctx.p_limbs)
            for q in range(L):
                out_ref[0, j, q] = acc[q]

    def run(state_words, base, grid):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((grid, epb, L, R, 128),
                                           jnp.uint32),
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((1, epb, L, R, 128),
                                   lambda i: (i, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(state_words, base)
        # draw index = block * epb + slot, block = g*TILE + r*128 + lane
        out = out.transpose(0, 3, 4, 1, 2)
        return out.reshape(grid * TILE * epb, L)

    return run, epb, TILE


def squeeze_mont(state_words, n_draws: int, l_bytes: int, p: int,
                 ctr_lane: int = 19, base: int = 0):
    """(n_draws, L) Montgomery-form uniform GF(p) draws from the
    counter-mode SHAKE stream (fused Pallas squeeze+reduce on TPU; XLA
    squeeze + words_to_elements + reduce_chunks elsewhere). Counter space
    consumed: blocks_needed(n_draws, l_bytes) from ``base``."""
    ctx = prime_field_ctx(p)
    n_blocks = max(blocks_needed(n_draws, l_bytes), 1)
    if keccak._pallas_available() and n_blocks >= 1024:
        run, epb, TILE = _squeeze_mont_kernel(p, l_bytes, ctr_lane)
        grid = -(-n_blocks // TILE)
        out = run(state_words, jnp.asarray([base], jnp.uint32), grid)
        return out[:n_draws]
    n_pad = max(8, 1 << (n_blocks - 1).bit_length())
    blocks = keccak._squeeze_ctr(state_words, n_pad, ctr_lane, base)
    blocks = blocks[:n_blocks]
    wide = words_to_elements(blocks, n_draws, l_bytes, ctx.L)
    return ctx.reduce_chunks(wide.shape[-2])(wide)


def blocks_needed(n: int, l: int) -> int:
    if l > keccak.RATE:
        return n * -(-l // keccak.RATE)

    k = keccak.RATE // l
    return -(-n // k)


_POOL_BLOCKS = 512  # pooled refill size (one vectorized host permutation)


class KeccakRNG:
    """Counter-mode SHAKE128 generator with a session key and call nonce.

    Small draws are served from a pooled refill: one vectorized Keccak-f
    batch of ``_POOL_BLOCKS`` counter-separated blocks is generated per
    nonce and sliced out across calls, amortizing the permutation cost
    (~0.8 ms per host batch) down to microseconds per protocol round.
    Every handed-out block is still a distinct (key, nonce, counter)
    single-block sponge instance — the PRF security argument is unchanged.

    Not thread-safe: the pool offset and nonce updates are not atomic.
    The runtime is single-threaded asyncio; concurrent draws from worker
    threads would need external locking.
    """

    def __init__(self, key: bytes | None = None):
        self.key = key if key is not None else secrets.token_bytes(32)
        self._nonce = 0
        self._pool = None
        self._pool_off = 0
        self._byte_pool = None
        self._byte_off = 0

    def _next_prefix(self) -> bytes:
        n = self._nonce
        self._nonce += 1
        return self.key + n.to_bytes(8, 'little')

    def _blocks(self, prefix: bytes, n_blocks: int):
        return keccak.shake128_ctr_blocks(prefix, n_blocks)

    def _draw_blocks(self, n_blocks: int):
        """n_blocks fresh 168-byte blocks, pooled when the draw is small."""
        if n_blocks > 64:
            return self._blocks(self._next_prefix(), n_blocks)
        pool = self._pool
        if pool is None or self._pool_off + n_blocks > pool.shape[0]:
            pool = self._blocks(self._next_prefix(), _POOL_BLOCKS)
            if not isinstance(pool, np.ndarray):
                pool = np.asarray(pool)
            self._pool = pool
            self._pool_off = 0
        off = self._pool_off
        self._pool_off = off + n_blocks
        # copy: a view would alias pool memory (an in-place write by a
        # caller would corrupt later draws, and a held slice would pin the
        # whole ~86KB pool)
        return pool[off:off + n_blocks].copy()

    def field_uniform(self, field, shape):
        """Uniform random field.array of given shape (prime or GF(2^d))."""
        if field.characteristic == 2:
            d = (field.order - 1).bit_length()
            bits = self.randbits_uint32(shape, d)
            return field.array.from_data(bits)
        p = field.modulus
        ctx = prime_field_ctx(p)
        n = _prod(shape)
        l = (p - 1).bit_length() + 7 >> 3
        if p & (p - 1):
            l += _WIDEN_BYTES
        blocks = self._draw_blocks(max(blocks_needed(n, l), 1))
        wide = words_to_elements(blocks, n, l, ctx.L)
        mont = ctx.reduce_chunks(wide.shape[-2])(wide)
        return field.array.from_data(
            mont.reshape(tuple(shape) + mont.shape[-1:]))

    def _draw_host_bytes(self, nbytes: int):
        """nbytes of SHAKE stream as a host uint8 array (pooled refills:
        one vectorized Keccak batch per ~86KB, byte extraction is a
        slice — the per-draw words_to_elements pass disappears from the
        scalar protocol plane's hot path)."""
        pool = self._byte_pool
        if pool is None or self._byte_off + nbytes > pool.size:
            blocks = self._blocks(self._next_prefix(), _POOL_BLOCKS)
            if not isinstance(blocks, np.ndarray):
                blocks = np.asarray(blocks)
            self._byte_pool = pool = np.frombuffer(
                blocks.astype('<u4').tobytes(), dtype=np.uint8)
            self._byte_off = 0
        off = self._byte_off
        self._byte_off = off + nbytes
        return pool[off:off + nbytes]

    def field_uniform_mont_ints(self, ctx, n: int):
        """n uniform GF(p) values as Montgomery-domain Python ints.

        Host-int twin of field_uniform for tiny protocol draws (Shamir
        coefficients are party-private randomness, so the byte layout need
        not match the batched path): widened little-endian chunks from the
        pooled SHAKE stream, reduced mod p, lifted by R.
        """
        p, R = ctx.p, ctx.R
        l = ((p - 1).bit_length() + 7 >> 3) + _WIDEN_BYTES
        cap = max(_POOL_BLOCKS * keccak.RATE // (2 * l), 1)  # per pool refill
        vals = np.empty(n, dtype=object)
        j0 = 0
        while j0 < n:
            k = min(n - j0, cap)
            raw = self._draw_host_bytes(k * l).tobytes()
            for j in range(k):
                vals[j0 + j] = int.from_bytes(raw[j * l:(j + 1) * l],
                                              'little')
            j0 += k
        return vals % p * R % p

    def randbits_uint32(self, shape, k: int):
        """Uniform k-bit values (k <= 32) as uint32 array."""
        assert 0 < k <= 32
        n = _prod(shape)
        l = (k + 7) // 8
        if 0 < n * l <= _POOL_BLOCKS * keccak.RATE // 4:
            b = self._draw_host_bytes(n * l).reshape(n, l)
            vals = np.zeros(n, np.uint32)
            for j in range(l):
                vals |= b[:, j].astype(np.uint32) << np.uint32(8 * j)
        else:
            blocks = self._draw_blocks(max(blocks_needed(n, l), 1))
            vals = words_to_elements(blocks, n, l, 1)[:, 0, 0]
        mask = np.uint32((1 << k) - 1) if k < 32 else np.uint32(0xFFFFFFFF)
        return (vals & mask).reshape(shape)

    def uniform_below_pow2_wide(self, shape, k: int, L: int):
        """Uniform k-bit values as (..., L) limb arrays (k <= 32*L)."""
        n = _prod(shape)
        l = (k + 7) // 8
        blocks = self._draw_blocks(max(blocks_needed(n, l), 1))
        wide = words_to_elements(blocks, n, l, L)
        assert wide.shape[-2] == 1
        vals = wide[:, 0, :]
        # mask top word bits beyond k
        rem = k % 32
        top = (k - 1) // 32
        if isinstance(vals, np.ndarray):
            vals = np.array(vals, copy=True)
            if rem:
                vals[:, top] &= np.uint32((1 << rem) - 1)
            if top + 1 < L:
                vals[:, top + 1:] = 0
        else:
            if rem:
                m = np.uint32((1 << rem) - 1)
                vals = vals.at[:, top].set(vals[:, top] & m)
            if top + 1 < L:
                vals = vals.at[:, top + 1:].set(0)
        return vals.reshape(tuple(shape) + (L,))


class FastRNG:
    """jax.random-based generator (threefry) — benchmarks only, NOT crypto."""

    def __init__(self, seed: int = 0):
        self._key = jax.random.PRNGKey(seed)

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def field_uniform(self, field, shape):
        p = field.modulus
        ctx = prime_field_ctx(p)
        l = ((p - 1).bit_length() + 7 >> 3) + (_WIDEN_BYTES if p & (p - 1) else 0)
        W = -(-l // 4)
        n_chunks = -(-W // ctx.L)
        n = _prod(shape)
        bits = jax.random.bits(self._next_key(), (n, n_chunks * ctx.L),
                               dtype=jnp.uint32)
        # zero bytes beyond l to mirror the byte-budget of the keccak path
        rem = l % 4
        top_w = l // 4
        if top_w < bits.shape[-1]:
            bits = bits.at[:, top_w + (1 if rem else 0):].set(0)
        if rem:
            bits = bits.at[:, top_w].set(bits[:, top_w] & np.uint32((1 << (8 * rem)) - 1))
        wide = bits.reshape(n, n_chunks, ctx.L)
        mont = ctx.reduce_chunks(n_chunks)(wide)
        return field.array.from_data(
            mont.reshape(tuple(shape) + mont.shape[-1:]))

    def randbits_uint32(self, shape, k: int):
        bits = jax.random.bits(self._next_key(), tuple(shape), dtype=jnp.uint32)
        mask = np.uint32((1 << k) - 1) if k < 32 else np.uint32(0xFFFFFFFF)
        return bits & mask
