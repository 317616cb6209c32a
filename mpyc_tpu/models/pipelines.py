"""Fused, jittable protocol pipelines for benchmarking and mesh execution.

These are the end-to-end compiled counterparts of the eager runtime ops: an
entire protocol round (split -> exchange -> recombine) expressed as one XLA
program over party-stacked Montgomery limb arrays, so the whole m-party
computation runs at device speed-of-light and shards over a mesh (party
axis, batch axis) with XLA-inserted collectives.

Reference baseline: the split/recombine loops of mpyc/thresha.py:23-132 are
the north-star kernels (BASELINE.md).
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp

from mpyc_tpu import finfields, thresha
from mpyc_tpu.utils.lazyjax import flush_on_load as _flush_jax
_flush_jax()  # this module imports jax directly: run deferred registrations
from mpyc_tpu.ops import keccak, limb
from mpyc_tpu.ops import rng as rng_mod
from mpyc_tpu.ops.fieldops import prime_field_ctx


def _lagrange_consts_mont(field, xs, x_r=0):
    """Host Lagrange coefficients encoded as Montgomery limb tuples."""
    ctx = prime_field_ctx(field.modulus)
    vec = thresha._recombination_vector(field, tuple(xs), x_r)
    return [ctx.encode_const(int(c)) for c in vec]


def make_split_recombine(p: int, t: int, m: int):
    """Jittable fn: secrets (n, L) + SHAKE state -> recombined (n, L).

    One full Shamir round per element, with the coefficient randomness
    generated *inside* the compiled step (counter-mode SHAKE128 expansion of
    a 50-word absorbed sponge state), so the measured cost covers RNG +
    split (degree-t Horner at m points) + recombine (Lagrange at 0 from
    t+1 shares) — the same work as the reference's random_split+recombine
    (thresha.py:23-116) including its secrets.randbelow draws.
    """
    field = finfields.GF((p, 2, p - 1)) if p > 2 else finfields.GF(p)
    ctx = prime_field_ctx(p)
    L = ctx.L
    lag = _lagrange_consts_mont(field, range(1, t + 2))
    l_bytes = rng_mod.fused_draw_bytes(p)

    def step(secrets, state_words):
        # secrets: (n, L) Mont; state_words: (2, 25) absorbed SHAKE prefix
        n = secrets.shape[0]
        n_vals = t * n
        n_blocks = max(rng_mod.blocks_needed(n_vals, l_bytes), 1)
        if keccak._pallas_available() and n_blocks >= 1024:
            blocks = keccak._squeeze_ctr_pallas(state_words, n_blocks, 19)
        else:
            n_pad = max(8, 1 << (n_blocks - 1).bit_length())
            blocks = keccak._squeeze_ctr(state_words, n_pad, 19)[:n_blocks]
        wide = rng_mod.words_to_elements(blocks, n_vals, l_bytes, L)
        red = ctx.reduce_chunks(wide.shape[-2])
        coefs = red(wide).reshape(t, n, L)
        # split: share rows for parties 1..m
        rows = []
        for i in range(1, m + 1):
            y = None
            for j in range(t):
                c = coefs[j]
                y = c if y is None else ctx.add(y, c)
                y = ctx.mul(y, jnp.broadcast_to(
                    jnp.asarray(np.array(ctx.encode_const(i), np.uint32)),
                    (n, L)))
            rows.append(ctx.add(y, secrets) if y is not None else secrets)
        shares = jnp.stack(rows, axis=0)            # (m, n, L)
        # recombine from first t+1 shares
        acc = None
        for i in range(t + 1):
            term = ctx.mul(shares[i], jnp.broadcast_to(
                jnp.asarray(np.array(lag[i], np.uint32)), (n, L)))
            acc = term if acc is None else ctx.add(acc, term)
        return acc

    return jax.jit(step)


def make_reshare_step(p: int, t: int, m: int, fuse_mul: bool = False):
    """Single-program GRR98 degree-reduction round on party-stacked shares.

    step(shares, state_words, ctr) -> (out, ctr')
      shares: (m, ..., L) uint32 Montgomery, degree-2t shares
      state_words: (2, 25) absorbed SHAKE128 prefix (key || 8-byte zero
        nonce slot), device-resident
      ctr: (2,) uint32 device-resident call counter (lo, hi)

    With fuse_mul=True the signature becomes step(a, b, state_words, ctr)
    and the degree-2t product shares are computed IN the kernel
    (s_i = a_i * b_i), so a whole secure multiplication
    (reference runtime.py:1060-1094) is one device program — the separate
    elementwise product pass (one extra HBM read+write plus an
    XLA-emulated u32 Montgomery multiply, measured ~21 ms per 1M-element
    round) disappears into the VMEM-resident round.

    The whole round — per-call nonce injection into the sponge, the
    counter-mode Keccak-f[1600] coefficient stream, wide reduction into
    Montgomery form, Lagrange aggregation, and Horner re-evaluation at
    x = 1..m — is ONE XLA program: zero eager primitives and zero
    host<->device transfers per call.  This is the compiled twin of the
    runtime reshare (reference hot path /root/reference/mpyc/runtime.py:603-689
    built on thresha.py:47-132), replacing the eager per-primitive dispatch
    that dominated protocol rounds (measured: 471 eager dispatches and
    ~4 s per 1M-element round through the TPU tunnel).

    Protocol algebra: the output for receiver j is
      out_j = sum_{i<=2t} lag_i * poly_i(x_j),
      poly_i(x) = (sum_k c_{i,k} x^{t-k}) + s_i  (sender i's re-split).
    By linearity this equals Horner(C, x_j) + S with
      C_k = sum_i lag_i c_{i,k}   and   S = sum_i lag_i s_i.
    The c_{i,k} are iid uniform and every lag_i is nonzero, so each C_k is
    itself uniform and independent — the stream draws C_k DIRECTLY
    (t values per element instead of t*(2t+1)), which cuts the Keccak
    stream and the per-coefficient Lagrange multiplies by 2t+1 while
    leaving the joint output distribution identical to exchanging all
    m x m re-split rows.  The per-call nonce lands in lane 4
    (bytes 32..39 of the absorbed block, the zeroed nonce slot), the
    per-instance counter in lane 19 (inside _squeeze_ctr*), so every block
    across calls/fields is a distinct single-block sponge input.
    """
    field = finfields.GF((p, 2, p - 1)) if p > 2 else finfields.GF(p)
    ctx = prime_field_ctx(p)
    L = ctx.L
    n_send = 2 * t + 1
    assert n_send <= m, 'GRR98 needs 2t+1 <= m'
    lag = _lagrange_consts_mont(field, range(1, n_send + 1))
    xs_mont = [ctx.encode_const(i) for i in range(1, m + 1)]
    l_bytes = rng_mod.fused_draw_bytes(p)
    W = l_bytes // 4                # uint32 words per coefficient value
    nc = -(-W // L)                 # Montgomery chunks per coefficient
    wpe = t * nc * L                # sponge words consumed per element
    S_epb = (keccak.RATE // 4) // wpe if wpe else 0   # elements per sponge

    def cl(v):
        return [jnp.uint32(int(x)) for x in v]

    def step_xla(flat, st, n, flat_b=None):
        if flat_b is not None:
            flat = limb.stack(limb.mont_mul(
                limb.unstack(flat, L), limb.unstack(flat_b, L),
                ctx.p_limbs, ctx.n0inv))
        n_vals = t * n
        coefs = rng_mod.squeeze_mont(st, n_vals, l_bytes, p)
        coefs = coefs.reshape(t, n, L)
        S = None
        for i in range(n_send):
            term = limb.mont_mul(limb.unstack(flat[i], L), cl(lag[i]),
                                 ctx.p_limbs, ctx.n0inv)
            S = term if S is None else limb.add_mod(S, term, ctx.p_limbs)
        C = [limb.unstack(coefs[k], L) for k in range(t)]
        rows = []
        for j in range(m):
            y = None
            for k in range(t):
                y = C[k] if y is None else limb.add_mod(y, C[k], ctx.p_limbs)
                y = limb.mont_mul(y, cl(xs_mont[j]), ctx.p_limbs, ctx.n0inv)
            rows.append(limb.stack(limb.add_mod(y, S, ctx.p_limbs)))
        return jnp.stack(rows, axis=0)

    # -- whole-round Pallas kernel (VMEM-resident sponge + field math) ------
    # chunk c of a coefficient contributes v_c * 2^(32 L c) in Montgomery
    # form via ONE mont_mul with K_c = 2^(32Lc) * R^2 (the aggregated
    # coefficients C_k are drawn directly — see the docstring).
    radix = [limb.int_to_limbs((pow(2, 32 * L * c, p) * ctx.R2) % p, L)
             for c in range(nc)]
    R2T = 8                         # sublanes per sponge tile

    def make_pallas(S):
        rc = keccak._RC_ARR

        def kernel(state_ref, ctr_ref, sec_ref, *rest):
            if fuse_mul:
                b_ref, out_ref = rest
            else:
                out_ref, = rest
            g = pl.program_id(0)
            base = (jnp.uint32(g * (R2T * 128))
                    + jax.lax.broadcasted_iota(jnp.uint32, (R2T, 128), 0)
                    * jnp.uint32(128)
                    + jax.lax.broadcasted_iota(jnp.uint32, (R2T, 128), 1))
            hi = [jnp.full((R2T, 128), state_ref[0, k]) for k in range(25)]
            lo = [jnp.full((R2T, 128), state_ref[1, k]) for k in range(25)]
            lo[4] = lo[4] ^ ctr_ref[0]      # per-call nonce (lane 4)
            hi[4] = hi[4] ^ ctr_ref[1]
            lo[19] = lo[19] ^ base          # per-instance counter (lane 19)
            for rnd in range(24):
                hi, lo = keccak._keccak_round(
                    hi, lo, jnp.uint32(int(rc[rnd, 0])),
                    jnp.uint32(int(rc[rnd, 1])))
            words = []
            for i in range(keccak.RATE // 8):
                words.append(lo[i])
                words.append(hi[i])

            def const(v):
                return [jnp.uint32(int(x)) for x in v]

            for e in range(S):
                C = []
                for k in range(t):
                    acc = None
                    off = (e * t + k) * nc * L
                    for c in range(nc):
                        chunk = [words[off + c * L + q] for q in range(L)]
                        term = limb.mont_mul(chunk, const(radix[c]),
                                             ctx.p_limbs, ctx.n0inv,
                                             unroll=True)
                        acc = term if acc is None else \
                            limb.add_mod(acc, term, ctx.p_limbs)
                    C.append(acc)
                Sagg = None
                for i in range(n_send):
                    s_i = [sec_ref[0, i, e, q] for q in range(L)]
                    if fuse_mul:
                        b_i = [b_ref[0, i, e, q] for q in range(L)]
                        s_i = limb.mont_mul(s_i, b_i, ctx.p_limbs,
                                            ctx.n0inv, unroll=True)
                    term = limb.mont_mul(s_i, const(lag[i]),
                                         ctx.p_limbs, ctx.n0inv,
                                         unroll=True)
                    Sagg = term if Sagg is None else \
                        limb.add_mod(Sagg, term, ctx.p_limbs)
                for j in range(m):
                    y = None
                    for k in range(t):
                        y = C[k] if y is None else \
                            limb.add_mod(y, C[k], ctx.p_limbs)
                        y = limb.mont_mul(y, const(xs_mont[j]),
                                          ctx.p_limbs, ctx.n0inv,
                                          unroll=True)
                    o = limb.add_mod(y, Sagg, ctx.p_limbs) \
                        if y is not None else Sagg
                    for q in range(L):
                        out_ref[0, j, e, q] = o[q]

        def run(state_words, ctr, *tiles):
            G = tiles[0].shape[0]
            tile_spec = pl.BlockSpec((1, m, S, L, R2T, 128),
                                     lambda i: (i, 0, 0, 0, 0, 0),
                                     memory_space=pltpu.VMEM)
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(
                    (G, m, S, L, R2T, 128), jnp.uint32),
                grid=(G,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ] + [tile_spec] * len(tiles),
                out_specs=tile_spec,
            )(state_words, ctr, *tiles)
        return run

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    pallas_run = make_pallas(S_epb) if S_epb >= 1 else None

    def _tileize(flat, G, n, n_pad):
        if n_pad != n:
            flat = jnp.concatenate(
                [flat, jnp.zeros((m, n_pad - n, L), jnp.uint32)], axis=1)
        tiles = flat.reshape(m, G, S_epb, R2T, 128, L)
        return jnp.transpose(tiles, (1, 0, 2, 5, 3, 4))

    def _step(shares, state_words, ctr, shares_b=None):
        orig_shape = shares.shape
        n = 1
        for s in orig_shape[1:-1]:
            n *= int(s)
        flat = shares.reshape(m, n, L)
        flat_b = shares_b.reshape(m, n, L) if shares_b is not None else None
        tile_n = S_epb * R2T * 128
        if pallas_run is not None and keccak._pallas_available() and \
                n >= tile_n:
            # whole round in one Pallas program: sponge squeeze, reduction,
            # Lagrange aggregation and Horner re-evaluation never leave
            # VMEM/registers; HBM traffic = one read + one write of shares.
            G = -(-n // tile_n)
            n_pad = G * tile_n
            tiles = [_tileize(flat, G, n, n_pad)]
            if flat_b is not None:
                tiles.append(_tileize(flat_b, G, n, n_pad))
            out = pallas_run(state_words, ctr, *tiles)
            out = jnp.transpose(out, (1, 0, 2, 4, 5, 3))
            out = out.reshape(m, n_pad, L)[:, :n]
        else:
            st = state_words.at[1, 4].set(state_words[1, 4] ^ ctr[0])
            st = st.at[0, 4].set(st[0, 4] ^ ctr[1])
            out = step_xla(flat, st, n, flat_b)
        out = out.reshape(orig_shape)
        lo = ctr[0] + jnp.uint32(1)
        hi = ctr[1] + jnp.where(lo == 0, jnp.uint32(1), jnp.uint32(0))
        return out, jnp.stack([lo, hi])

    if fuse_mul:
        def step(a, b, state_words, ctr):
            return _step(a, state_words, ctr, shares_b=b)
    else:
        def step(shares, state_words, ctr):
            return _step(shares, state_words, ctr)

    return jax.jit(step)


def make_secure_matmul_step(p: int, t: int, m: int):
    """Jittable co-located secure matmul round: C = A @ B with resharing.

    Inputs (party-stacked Montgomery limbs):
      a_sh: (m, B, K, L)  — each party's share of A (B x K)
      b_sh: (m, K, N, L)  — each party's share of B (K x N)
      coef_wide: (t, m, B, N, n_chunks, L) — resharing coefficient randomness

    Per party: local matmul (degree-2t product shares), then GRR98 degree
    reduction: every party splits its product share, rows are exchanged
    (an axis transpose — a collective when the party axis is sharded), and
    each party recombines the first 2t+1 contributions.

    Output: (m, B, N, L) degree-t shares of A @ B.
    """
    field = finfields.GF((p, 2, p - 1))
    ctx = prime_field_ctx(p)
    L = ctx.L
    lag = _lagrange_consts_mont(field, range(1, 2 * t + 2))

    def step(a_sh, b_sh, coef_wide):
        mm, B, K, _ = a_sh.shape
        N = b_sh.shape[2]
        c = ctx.matmul(a_sh, b_sh)               # (m, B, N, L), degree 2t
        # reduce coefficient randomness into the field
        red = ctx.reduce_chunks(coef_wide.shape[-2])
        coefs = red(coef_wide.reshape((-1,) + coef_wide.shape[-2:]))
        coefs = coefs.reshape((t, m, B, N, L))
        # each party splits its product share: rows for receivers 1..m
        rows = []
        for i in range(1, m + 1):
            y = None
            for j in range(t):
                cj = coefs[j]
                y = cj if y is None else ctx.add(y, cj)
                y = ctx.mul(y, jnp.broadcast_to(
                    jnp.asarray(np.array(ctx.encode_const(i), np.uint32)),
                    y.shape))
            rows.append(ctx.add(y, c) if y is not None else c)
        resplit = jnp.stack(rows, axis=0)        # (m_recv, m_send, B, N, L)
        # recombine over senders 0..2t (exchange = the axis-1 gather)
        acc = None
        for i in range(2 * t + 1):
            term = ctx.mul(resplit[:, i], jnp.broadcast_to(
                jnp.asarray(np.array(lag[i], np.uint32)),
                resplit.shape[0:1] + resplit.shape[2:]))
            acc = term if acc is None else ctx.add(acc, term)
        return acc                               # (m, B, N, L)

    return step


def coef_randomness(rng, p: int, shape):
    """Uniform wide randomness for the pipelines: (*shape, n_chunks, L)."""
    ctx = prime_field_ctx(p)
    l = rng_mod.fused_draw_bytes(p)
    W = l // 4
    n_chunks = -(-W // ctx.L)
    n = int(np.prod(shape, dtype=np.int64))
    blocks = rng._blocks(rng._next_prefix(),
                         max(rng_mod.blocks_needed(n, l), 1))
    wide = rng_mod.words_to_elements(blocks, n, l, ctx.L)
    return wide.reshape(tuple(shape) + (n_chunks, ctx.L))


def make_split_recombine_fused(p: int, t: int, m: int, R: int = 8):
    """Single-Pallas-kernel Shamir round: RNG + split + recombine fused.

    TPU-first layout: one SHAKE128 sponge instance per (sublane, lane) cell
    of an (R, 128) tile; each instance's 168-byte rate block supplies the
    degree-t coefficient randomness for `epb` elements (fused-stream
    convention: word-aligned byte_length(p-1) + 8 draws, see
    rng.fused_draw_bytes). The whole round — Keccak-f[1600] squeeze, wide
    reduction into Montgomery form, Horner share evaluation at x = 1..m,
    and Lagrange recombination at 0 — runs in VMEM/registers, so HBM
    traffic is exactly one read of the secrets and one write of the result.

    Returns (step, layout) where step maps
      secrets (grid, epb, L, R, 128) uint32 Montgomery -> same-shape
      recombined output; layout = (grid_elems, epb) for host-side packing.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    field = finfields.GF((p, 2, p - 1)) if p > 2 else finfields.GF(p)
    ctx = prime_field_ctx(p)
    L = ctx.L
    l_bytes = rng_mod.fused_draw_bytes(p)
    W = l_bytes // 4                # words per coefficient value
    nc = -(-W // L)                 # chunks per coefficient
    vals_per_block = (keccak.RATE // 4) // (nc * L)
    epb = vals_per_block // t       # elements per sponge instance
    assert epb >= 1, 'field too wide for single-block coefficients'
    lag = [ctx.encode_const(int(c))
           for c in thresha._recombination_vector(field, tuple(range(1, t + 2)),
                                                  0)]
    xs_mont = [ctx.encode_const(i) for i in range(1, m + 1)]
    # radix constants: chunk_c * 2^(32 L c) * R mod p via one Montgomery mul
    radix = [limb.int_to_limbs(((1 << (32 * L * c)) * ctx.R * ctx.R) % p, L)
             for c in range(nc)]
    rc = keccak._RC_ARR

    def kernel(state_ref, sec_ref, out_ref):
        g = pl.program_id(0)
        base = (jnp.uint32(g * (R * 128))
                + jax.lax.broadcasted_iota(jnp.uint32, (R, 128), 0)
                * jnp.uint32(128)
                + jax.lax.broadcasted_iota(jnp.uint32, (R, 128), 1))
        hi = [jnp.full((R, 128), state_ref[0, k]) for k in range(25)]
        lo = [jnp.full((R, 128), state_ref[1, k]) for k in range(25)]
        lo[19] = lo[19] ^ base
        for rnd in range(24):
            hi, lo = keccak._keccak_round(hi, lo, jnp.uint32(int(rc[rnd, 0])),
                                          jnp.uint32(int(rc[rnd, 1])))
        # rate words in byte order: W[2i] = lo[i], W[2i+1] = hi[i]
        words = []
        for i in range(keccak.RATE // 8):
            words.append(lo[i])
            words.append(hi[i])

        def const(v):
            return [jnp.uint32(int(x)) for x in v]

        for e in range(epb):
            # degree-t coefficients for this element slot
            coefs = []
            for j in range(t):
                off = (e * t + j) * nc * L
                acc = None
                for c in range(nc):
                    chunk = [words[off + c * L + i] for i in range(L)]
                    term = limb.mont_mul(chunk, const(radix[c]),
                                         ctx.p_limbs, ctx.n0inv,
                                         unroll=True)
                    acc = term if acc is None else \
                        limb.add_mod(acc, term, ctx.p_limbs)
                coefs.append(acc)
            s = [sec_ref[0, e, i] for i in range(L)]
            # split at x = 1..m (Horner), keep only shares 1..t+1 (the ones
            # recombination consumes; all m are materialized for parity of
            # cost with the reference's m-row split)
            shares = []
            for i in range(m):
                y = None
                for j in range(t):
                    y = coefs[j] if y is None else \
                        limb.add_mod(y, coefs[j], ctx.p_limbs)
                    y = limb.mont_mul(y, const(xs_mont[i]),
                                      ctx.p_limbs, ctx.n0inv, unroll=True)
                shares.append(limb.add_mod(y, s, ctx.p_limbs))
            # recombine from shares at x = 1..t+1
            acc = None
            for i in range(t + 1):
                term = limb.mont_mul(shares[i], const(lag[i]),
                                     ctx.p_limbs, ctx.n0inv, unroll=True)
                acc = term if acc is None else \
                    limb.add_mod(acc, term, ctx.p_limbs)
            for i in range(L):
                out_ref[0, e, i] = acc[i]

    def step(secrets, state_words):
        grid = secrets.shape[0]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((grid, epb, L, R, 128),
                                           jnp.uint32),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, epb, L, R, 128), lambda i: (i, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, epb, L, R, 128),
                                   lambda i: (i, 0, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(state_words, secrets)

    return jax.jit(step), (R * 128, epb)


def _tree_mults(w: int) -> int:
    """Secure mults consumed by a log-depth product tree of width w."""
    total = 0
    while w > 1:
        h = w // 2
        total += h
        w = h + (w % 2)
    return total


def make_sgn_step(p: int, t: int, m: int, l: int, k: int = 30,
                  LT: bool = False, EQ: bool = False, f: int = 0):
    """Whole Toft-style secure comparison as ONE compiled device program.

    step(a_sh, state_words, ctr) -> (out_sh, ctr')
      a_sh: (m, n, L) uint32 Montgomery degree-t shares of the inputs
      state_words/ctr: fused SHAKE state + device-resident call counter
      out_sh: (m, n, L) degree-t shares of sgn(a) (or the a<0 / a==0 bit),
      already shifted by 2^f for fixed-point types.

    Fuses the entire protocol of the eager np_sgn (runtime.py np_sgn,
    reference runtime.py:3622-3693): masked-open comparison with l random
    bits, public bit algebra, log-depth secure product trees with in-kernel
    GRR98 degree reductions, and a blinded public zero test — zero eager
    primitives and zero host<->device transfers per call.

    Co-located-plane delta (documented, like the fused reshare's
    coefficient stream): the per-party r^2-open random-bit subprotocol
    (runtime.py np_random_bits) is replaced by an in-kernel dealer split of
    counter-mode SHAKE stream bits — on this plane one process plays every
    party, so the observable share/output distribution is unchanged while
    the l-per-element public square roots disappear.  The blinding factor
    for the zero test is drawn uniformly and its (probability ~1/p) zero
    replaced by one.

    Constraints: prime field, 2t+1 <= m, l + k + 2 <= bitlen(p) (any limb
    count: SecInt(64)/SecFxp(64:32) fields included).
    """
    assert not (LT and EQ)
    sgn_mode = not LT and not EQ
    field = finfields.GF((p, 2, p - 1)) if p > 2 else finfields.GF(p)
    ctx = prime_field_ctx(p)
    L = ctx.L
    P, N0 = ctx.p_limbs, ctx.n0inv
    n_send = 2 * t + 1
    assert n_send <= m, 'GRR98 needs 2t+1 <= m'
    assert l + k + 2 <= p.bit_length(), 'masked open needs l+k+2 bits'
    lb = l + (0 if EQ else 1)           # random bits per element (+sign)
    l_bytes = rng_mod.fused_draw_bytes(p)

    lag_t = _lagrange_consts_mont(field, range(1, t + 2))       # open deg t
    lag_2t = _lagrange_consts_mont(field, range(1, n_send + 1))  # deg 2t
    xs_mont = [ctx.encode_const(i) for i in range(1, m + 1)]
    one_m = ctx.one_mont
    two_m = ctx.encode_const(2)
    three_m = ctx.encode_const(3)
    r2_m = ctx.r2_limbs                  # mont encoder (x -> x*R)
    pow2_m = [ctx.encode_const(pow(2, j, p)) for j in range(max(l, 1) + 1)]
    inv2l_m = ctx.encode_const(pow(pow(2, l, p), -1, p))
    pow2l1_m = ctx.encode_const(pow(2, max(l - 1, 0), p))
    powf_m = ctx.encode_const(pow(2, f, p)) if f else None

    def cl(v):
        return [jnp.uint32(int(x)) for x in v]

    def ADD(a, b):
        return limb.stack(limb.add_mod(limb.unstack(a, L),
                                       limb.unstack(b, L), P))

    def SUB(a, b):
        return limb.stack(limb.sub_mod(limb.unstack(a, L),
                                       limb.unstack(b, L), P))

    def MUL(a, b):
        return limb.stack(limb.mont_mul(limb.unstack(a, L),
                                        limb.unstack(b, L), P, N0))

    def MULC(a, c):
        return limb.stack(limb.mont_mul(limb.unstack(a, L), cl(c), P, N0))

    def ADDC(a, c):
        return limb.stack(limb.add_mod(limb.unstack(a, L), cl(c), P))

    def CSUB(c, a):  # public const minus share (valid on every row)
        return limb.stack(limb.sub_mod(cl(c), limb.unstack(a, L), P))

    # per-element word budget (bit draws + bounded r_divl draw)
    wb = -(-lb // 32)
    wk = -(-k // 32)
    wpe = wb + wk

    # ---- whole-protocol Pallas kernel ------------------------------------
    # One (8, 128) tile = 1024 elements; per element the kernel squeezes
    # its own BPE counter-mode sponge blocks and runs the ENTIRE comparison
    # (bit split, masked open, bit algebra, product trees with GRR98
    # degree reductions, blinded zero test) in registers/VMEM.  HBM traffic
    # = one read of the input shares + one write of the output shares; the
    # randomness stream never exists in memory at all.
    W = l_bytes // 4
    nc = -(-W // L)
    D = t * lb + t                       # bit-split + r_divl coefficients
    if not EQ:
        D += t * _tree_mults(l + 1) + 1 + t      # tree + blind + its coefs
    if not LT:
        D += t * _tree_mults(l)
    if sgn_mode:
        D += t                                   # final reshare
    wpe_words = wb + wk + D * W
    BPE = -(-wpe_words // 42)            # sponge blocks per element
    radix = [limb.int_to_limbs((pow(2, 32 * L * c, p) * ctx.R2) % p, L)
             for c in range(nc)]

    def _build_pallas():
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        R2T = 8
        TILE = R2T * 128
        rc = keccak._RC_ARR

        def MM(a, b):
            return limb.mont_mul(a, b, P, N0, unroll=L <= 4)

        def kernel(state_ref, ctr_ref, a_ref, out_ref):
            g = pl.program_id(0)
            eidx = (jnp.uint32(g * TILE)
                    + jax.lax.broadcasted_iota(jnp.uint32, (R2T, 128), 0)
                    * jnp.uint32(128)
                    + jax.lax.broadcasted_iota(jnp.uint32, (R2T, 128), 1))
            words = []
            for b in range(BPE):
                hi = [jnp.full((R2T, 128), state_ref[0, q])
                      for q in range(25)]
                lo = [jnp.full((R2T, 128), state_ref[1, q])
                      for q in range(25)]
                lo[4] = lo[4] ^ ctr_ref[0]      # per-call nonce
                hi[4] = hi[4] ^ ctr_ref[1]
                lo[19] = lo[19] ^ (eidx * jnp.uint32(BPE) + jnp.uint32(b))
                for rnd in range(24):
                    hi, lo = keccak._keccak_round(
                        hi, lo, jnp.uint32(int(rc[rnd, 0])),
                        jnp.uint32(int(rc[rnd, 1])))
                for i in range(keccak.RATE // 8):
                    words.append(lo[i])
                    words.append(hi[i])
            zero = jnp.zeros((R2T, 128), jnp.uint32)
            bitw = words[:wb]
            kw = words[wb:wb + wk]
            cur = [wb + wk]

            def draw():                 # one uniform field value (L limbs)
                off = cur[0]
                cur[0] = off + W
                acc = None
                for c in range(nc):
                    chunk = [words[off + c * L + q] if c * L + q < W
                             else zero for q in range(L)]
                    term = MM(chunk, cl(radix[c]))
                    acc = term if acc is None else limb.add_mod(acc, term, P)
                return acc

            def sel_const(bit, cv):     # {0,1} array -> const or 0 (limbs)
                return [jnp.where(bit != 0, jnp.uint32(int(cv[q])), zero)
                        for q in range(L)]

            def vMULC(a, c):
                return MM(a, cl(c))

            # rows = per-party shares: list of m limb-lists
            def rsplit(v, coefs):
                rows = []
                for i in range(m):
                    y = None
                    for kk in range(t):
                        y = coefs[kk] if y is None else \
                            limb.add_mod(y, coefs[kk], P)
                        y = vMULC(y, xs_mont[i])
                    rows.append(limb.add_mod(y, v, P) if y is not None
                                else v)
                return rows

            def ropen(x, lag):
                acc = None
                for i, lg in enumerate(lag):
                    term = vMULC(x[i], lg)
                    acc = term if acc is None else limb.add_mod(acc, term, P)
                return acc

            def rreshare(x):            # deg 2t -> deg t, direct C draws
                S = None
                for i in range(n_send):
                    term = vMULC(x[i], lag_2t[i])
                    S = term if S is None else limb.add_mod(S, term, P)
                C = [draw() for _ in range(t)]
                rows = []
                for j in range(m):
                    y = None
                    for kk in range(t):
                        y = C[kk] if y is None else \
                            limb.add_mod(y, C[kk], P)
                        y = vMULC(y, xs_mont[j])
                    rows.append(limb.add_mod(y, S, P) if y is not None
                                else S)
                return rows

            def rmul(x, y):             # degree-2t local product
                return [MM(x[i], y[i]) for i in range(m)]

            def prod_tree(vals):        # list of share-rows -> one
                while len(vals) > 1:
                    h = len(vals) // 2
                    nxt = [rreshare(rmul(vals[i], vals[h + i]))
                           for i in range(h)]
                    if len(vals) % 2:
                        nxt.append(vals[2 * h])
                    vals = nxt
                return vals[0]

            # ---- random bits (dealer split of stream bits) ----
            rb = []
            for j in range(lb):
                bit = (bitw[j // 32] >> jnp.uint32(j % 32)) & jnp.uint32(1)
                bmont = sel_const(bit, one_m)
                rb.append(rsplit(bmont, [draw() for _ in range(t)]))

            # ---- r_divl < 2^k ----
            k_limbs = []
            for q in range(L):
                if q < wk:
                    wcol = kw[q]
                    rem = k - 32 * q
                    if 0 < rem < 32:
                        wcol = wcol & jnp.uint32((1 << rem) - 1)
                    elif rem <= 0:
                        wcol = zero
                    k_limbs.append(wcol)
                else:
                    k_limbs.append(zero)
            r_divl = MM(k_limbs, cl(r2_m))
            r_divl_sh = rsplit(r_divl, [draw() for _ in range(t)])

            # ---- mask and open: c = a + 2^l + r_modl + 2^l r_divl ----
            r_modl = None
            for j in range(l):
                term = [vMULC(rb[j][i], pow2_m[j]) for i in range(m)]
                r_modl = term if r_modl is None else \
                    [limb.add_mod(r_modl[i], term[i], P) for i in range(m)]
            a_rows = [[a_ref[0, i, q] for q in range(L)] for i in range(m)]
            a_r = [limb.add_mod(limb.add_mod(a_rows[i], r_modl[i], P),
                                cl(pow2_m[l]), P) for i in range(m)]
            c_in = [limb.add_mod(a_r[i], vMULC(r_divl_sh[i], pow2_m[l]), P)
                    for i in range(m)]
            c_mont = ropen(c_in, lag_t)
            c_std = MM(c_mont, cl((1,) + (0,) * (L - 1)))
            cm_limbs = []
            for q in range(L):
                rem = l - 32 * q
                col = c_std[q]
                if rem <= 0:
                    col = zero
                elif rem < 32:
                    col = col & jnp.uint32((1 << rem) - 1)
                cm_limbs.append(col)
            c_masked = MM(cm_limbs, cl(r2_m))
            z = [limb.sub_mod(c_masked, a_r[i], P) for i in range(m)]

            # ---- public bits of c mod 2^l; xor = c_bits XOR rb ----
            xor = []
            for j in range(l):
                cbit = (c_std[j // 32] >> jnp.uint32(j % 32)) & jnp.uint32(1)
                cb_m = sel_const(cbit, one_m)
                cb2_m = sel_const(cbit, two_m)
                xor.append([limb.add_mod(
                    limb.sub_mod(rb[j][i], MM(rb[j][i], cb2_m), P),
                    cb_m, P) for i in range(m)])

            if not EQ:
                s_sign = [limb.sub_mod(
                    limb.add_mod(rb[l][i], rb[l][i], P), cl(one_m), P)
                    for i in range(m)]
                # inclusive prefix sums of xor along the bit axis
                incl = [xor[0]]
                for j in range(1, l):
                    incl.append([limb.add_mod(incl[-1][i], xor[j][i], P)
                                 for i in range(m)])
                total = incl[l - 1]
                E = []
                for j in range(l):
                    suffix = [limb.sub_mod(total[i], incl[j][i], P)
                              for i in range(m)]
                    cbit = (c_std[j // 32] >> jnp.uint32(j % 32)) \
                        & jnp.uint32(1)
                    cb_m = sel_const(cbit, one_m)
                    E.append([limb.add_mod(limb.add_mod(
                        s_sign[i], limb.sub_mod(rb[j][i], cb_m, P), P),
                        vMULC(suffix[i], three_m), P) for i in range(m)])
                e_last = [limb.add_mod(
                    limb.sub_mod(s_sign[i], cl(one_m), P),
                    vMULC(total[i], three_m), P) for i in range(m)]
                E.append(e_last)
                prod_e = prod_tree(E)
                blind = draw()
                bz = limb.iszero_ll(blind)
                blind = [jnp.where(bz, jnp.uint32(int(one_m[q])), blind[q])
                         for q in range(L)]
                pb = rmul(prod_e, rsplit(blind, [draw() for _ in range(t)]))
                pb_open = ropen(pb, lag_2t)
                gz = limb.iszero_ll(pb_open)
                g2 = [jnp.where(gz, jnp.uint32(int(two_m[q])), zero)
                      for q in range(L)]
                h = [limb.add_mod(
                    limb.sub_mod(s_sign[i], MM(s_sign[i], g2), P),
                    cl(three_m), P) for i in range(m)]
                z = [vMULC(limb.add_mod(z[i], vMULC(h[i], pow2l1_m), P),
                           inv2l_m) for i in range(m)]

            if not LT:
                ones_minus = [[limb.sub_mod(cl(one_m), xor[j][i], P)
                               for i in range(m)] for j in range(l)]
                h_all = prod_tree(ones_minus)
                if EQ:
                    z = h_all
                else:
                    u = [limb.sub_mod(h_all[i], cl(one_m), P)
                         for i in range(m)]
                    v = [limb.sub_mod(limb.add_mod(z[i], z[i], P),
                                      cl(one_m), P) for i in range(m)]
                    z = rreshare(rmul(u, v))

            if powf_m is not None:
                z = [vMULC(z[i], powf_m) for i in range(m)]
            for i in range(m):
                for q in range(L):
                    out_ref[0, i, q] = z[i][q]

        def run(a_tiles, state_words, ctr):
            G = a_tiles.shape[0]
            tile_spec = pl.BlockSpec((1, m, L, R2T, 128),
                                     lambda i: (i, 0, 0, 0, 0),
                                     memory_space=pltpu.VMEM)
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((G, m, L, R2T, 128),
                                               jnp.uint32),
                grid=(G,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                          pl.BlockSpec(memory_space=pltpu.SMEM),
                          tile_spec],
                out_specs=tile_spec,
            )(state_words, ctr, a_tiles)
        return run

    _pallas_run = [None]

    def step(a_sh, state_words, ctr):
        n = a_sh.shape[1]
        if keccak._pallas_available() and n >= 1024 and n % 1024 == 0:
            if _pallas_run[0] is None:
                _pallas_run[0] = _build_pallas()
            G = n // 1024
            tiles = a_sh.reshape(m, G, 8, 128, L).transpose(1, 0, 4, 2, 3)
            out = _pallas_run[0](tiles, state_words, ctr)
            out = out.transpose(1, 0, 3, 4, 2).reshape(m, n, L)
            lo2 = ctr[0] + jnp.uint32(1)
            hi2 = ctr[1] + jnp.where(lo2 == 0, jnp.uint32(1), jnp.uint32(0))
            return out, jnp.stack([lo2, hi2])
        # static stream budget (counter space partitioned per draw)
        n_words = n * wpe
        blocksA = max(-(-n_words // 42), 1)
        W_total = t * lb * n + t * n
        if not EQ:
            W_total += (1 + t) * n                      # blind + its coefs
            W_total += t * n * _tree_mults(l + 1)
        if not LT:
            W_total += t * n * _tree_mults(l)
        if sgn_mode:
            W_total += t * n                            # final reshare
        blocksB = max(rng_mod.blocks_needed(W_total, l_bytes), 1)

        st = state_words.at[1, 4].set(state_words[1, 4] ^ ctr[0])
        st = st.at[0, 4].set(st[0, 4] ^ ctr[1])

        # ---- streams (fused Pallas squeeze+reduce: the sponge words and
        # the radix reduction never leave VMEM) ----
        if keccak._pallas_available() and blocksA >= 1024:
            wordsA = keccak._squeeze_ctr_pallas(st, blocksA, 19, 0)
        else:
            wordsA = keccak._squeeze_ctr(st, blocksA, 19, 0)
        wordsA = wordsA.reshape(-1)[:n_words].reshape(n, wpe)
        wpool = rng_mod.squeeze_mont(st, W_total, l_bytes, p,
                                     base=blocksA)      # (W_total, L) mont
        cursor = [0]

        def draw(shape):
            cnt = 1
            for s in shape:
                cnt *= s
            c0 = cursor[0]
            cursor[0] = c0 + cnt
            return wpool[c0:c0 + cnt].reshape(shape + (L,))

        # ---- dealer split: values (..., L) + coefs (t, ..., L) -> (m, ...)
        def split(v, coefs):
            rows = []
            for i in range(m):
                y = None
                for kk in range(t):
                    y = coefs[kk] if y is None else ADD(y, coefs[kk])
                    y = MULC(y, xs_mont[i])
                rows.append(ADD(y, v) if y is not None else v)
            return jnp.stack(rows, axis=0)

        def open_deg(x, lag):           # (m, ..., L) -> (..., L) public
            acc = None
            for i, lg in enumerate(lag):
                term = MULC(x[i], lg)
                acc = term if acc is None else ADD(acc, term)
            return acc

        def reshare(x):                 # (m, ..., L) deg 2t -> deg t
            # aggregated re-split coefficients C_k = sum_i lag_i c_{i,k}
            # are iid uniform (all lag_i nonzero) — drawn directly, see
            # make_reshare_step's docstring for the distribution argument
            inner = x.shape[1:-1]
            coefs = draw((t,) + inner)
            S = None
            for i in range(n_send):
                term = MULC(x[i], lag_2t[i])
                S = term if S is None else ADD(S, term)
            C = [coefs[kk] for kk in range(t)]
            rows = []
            for j in range(m):
                y = None
                for kk in range(t):
                    y = C[kk] if y is None else ADD(y, C[kk])
                    y = MULC(y, xs_mont[j])
                rows.append(ADD(y, S) if y is not None else S)
            return jnp.stack(rows, axis=0)

        def prod_tree(x):               # (m, n, w, L) -> (m, n, L)
            while x.shape[2] > 1:
                w = x.shape[2]
                h = w // 2
                y = MUL(x[:, :, :h], x[:, :, h:2 * h])
                y = reshare(y)
                if w % 2:
                    y = jnp.concatenate([y, x[:, :, 2 * h:]], axis=2)
                x = y
            return x[:, :, 0]

        # ---- random bits (dealer split of stream bits) ----
        bit_words = wordsA[:, :wb]                       # (n, wb)
        bits = []
        for j in range(lb):
            bits.append((bit_words[:, j // 32] >> jnp.uint32(j % 32))
                        & jnp.uint32(1))
        bits = jnp.stack(bits, axis=1)                   # (n, lb) in {0,1}
        bits_mont = MULC(
            jnp.concatenate([bits[..., None],
                             jnp.zeros((n, lb, L - 1), jnp.uint32)]
                            if L > 1 else [bits[..., None]], axis=-1), r2_m)
        rb = split(bits_mont, draw((t, n, lb)))          # (m, n, lb, L)

        # ---- r_divl (uniform < 2^k, power-of-2 bound: exact) ----
        kw = wordsA[:, wb:wb + wk]                       # (n, wk)
        k_limbs = []
        for q in range(L):
            if q < wk:
                wcol = kw[:, q]
                rem = k - 32 * q
                if 0 < rem < 32:
                    wcol = wcol & jnp.uint32((1 << rem) - 1)
                elif rem <= 0:
                    wcol = jnp.zeros_like(wcol)
                k_limbs.append(wcol)
            else:
                k_limbs.append(jnp.zeros((n,), jnp.uint32))
        r_divl = MULC(jnp.stack(k_limbs, axis=-1), r2_m)  # (n, L) mont
        r_divl_sh = split(r_divl, draw((t, n)))           # (m, n, L)

        # ---- mask and open:  c = a + 2^l + r_modl + 2^l r_divl ----
        r_modl = None                                     # (m, n, L)
        for j in range(l):
            term = MULC(rb[:, :, j], pow2_m[j])
            r_modl = term if r_modl is None else ADD(r_modl, term)
        a_r = ADDC(ADD(a_sh, r_modl), pow2_m[l])          # 2^l mont == enc(2^l)
        c_in = ADD(a_r, MULC(r_divl_sh, pow2_m[l]))
        c_mont = open_deg(c_in, lag_t)                    # (n, L) public
        c_std = MULC(c_mont, (1,) + (0,) * (L - 1))       # standard form
        # c mod 2^l as masked standard limbs -> Montgomery
        cm_limbs = []
        for q in range(L):
            rem = l - 32 * q
            col = c_std[:, q]
            if rem <= 0:
                col = jnp.zeros_like(col)
            elif rem < 32:
                col = col & jnp.uint32((1 << rem) - 1)
            cm_limbs.append(col)
        c_masked = MULC(jnp.stack(cm_limbs, axis=-1), r2_m)  # (n, L) mont
        z = CSUB((0,) * L, a_r)                           # -a_r on all rows
        z = ADD(z, jnp.broadcast_to(c_masked, (m, n, L)))

        # ---- public bits of c mod 2^l, xor = c_bits XOR rb ----
        cb = []
        for j in range(l):
            cb.append((c_std[:, j // 32] >> jnp.uint32(j % 32))
                      & jnp.uint32(1))
        cb = jnp.stack(cb, axis=1)                        # (n, l) public
        cb_m = jnp.stack([cb * jnp.uint32(int(one_m[q])) for q in range(L)],
                         axis=-1)                         # (n, l, L) mont
        cb2_m = jnp.stack([cb * jnp.uint32(int(two_m[q])) for q in range(L)],
                          axis=-1)
        rbl = rb[:, :, :l]                                # (m, n, l, L)
        two_cb_rb = MUL(rbl, jnp.broadcast_to(cb2_m, (m, n, l, L)))
        xor = ADD(SUB(rbl, two_cb_rb),
                  jnp.broadcast_to(cb_m, (m, n, l, L)))

        if not EQ:
            s_sign = SUB(ADD(rb[:, :, l], rb[:, :, l]), jnp.broadcast_to(
                jnp.asarray(np.array(one_m, np.uint32)), (m, n, L)))
            # cumulative sums of xor along the bit axis (suffix trick)
            def _scan_add(a, b):
                return ADD(a, b)
            incl = jax.lax.associative_scan(_scan_add, xor, axis=2)
            total = incl[:, :, l - 1]                     # (m, n, L)
            suffix = SUB(total[:, :, None], incl)         # (m, n, l, L)
            e_bits = ADD(ADD(s_sign[:, :, None],
                             SUB(rbl, jnp.broadcast_to(cb_m, (m, n, l, L)))),
                         MULC(suffix, three_m))
            e_last = ADD(SUB(s_sign, jnp.broadcast_to(
                jnp.asarray(np.array(one_m, np.uint32)), (m, n, L))),
                MULC(total, three_m))
            E = jnp.concatenate([e_bits, e_last[:, :, None]], axis=2)
            prod_e = prod_tree(E)                         # (m, n, L)
            # blinded public zero test
            blind = draw((n,))
            bz = limb.iszero_ll(limb.unstack(blind, L))
            blind = jnp.where(bz[..., None],
                              jnp.asarray(np.array(one_m, np.uint32)), blind)
            pb = MUL(prod_e, split(blind, draw((t, n))))  # deg 2t
            pb_open = open_deg(pb, lag_2t)                # (n, L) public
            g = limb.iszero_ll(limb.unstack(pb_open, L))  # (n,) bool
            g2_m = jnp.stack(
                [jnp.where(g, jnp.uint32(int(two_m[q])), jnp.uint32(0))
                 for q in range(L)], axis=-1)             # (n, L): 2g mont
            h = ADDC(SUB(s_sign, MUL(s_sign, jnp.broadcast_to(
                g2_m, (m, n, L)))), three_m)
            z = MULC(ADD(z, MULC(h, pow2l1_m)), inv2l_m)

        if not LT:
            ones_minus = CSUB(one_m, xor)                 # (m, n, l, L)
            h_all = prod_tree(ones_minus)
            if EQ:
                z = h_all
            else:
                u = SUB(h_all, jnp.broadcast_to(
                    jnp.asarray(np.array(one_m, np.uint32)), (m, n, L)))
                v = SUB(ADD(z, z), jnp.broadcast_to(
                    jnp.asarray(np.array(one_m, np.uint32)), (m, n, L)))
                z = reshare(MUL(u, v))

        if powf_m is not None:
            z = MULC(z, powf_m)

        lo = ctr[0] + jnp.uint32(1)
        hi = ctr[1] + jnp.where(lo == 0, jnp.uint32(1), jnp.uint32(0))
        return z, jnp.stack([lo, hi])

    return jax.jit(step)


def make_reshare2_step(modulus: int, t: int, m: int, fuse_mul: bool = False):
    """Single-program GRR98 round over GF(2^d) (packed uint32 elements).

    step(shares, state_words, ctr) -> (out, ctr') with shares (m, ...) 
    uint32 field elements; fuse_mul=True takes (a, b, state, ctr) and
    computes the degree-2t product s_i = a_i (clmul) b_i in the kernel.

    The char-2 twin of make_reshare_step: counter-mode SHAKE d-bit
    coefficient draws (byte-granular, the PRF bits_uint32 convention),
    carry-less Horner re-evaluation at the party points 1..m, and
    Lagrange aggregation with constant-unrolled clmuls (only the set bits
    of each static constant emit XORs). This is the round that batched
    np_aes / sha3 bottom out in on the co-located plane (reference
    demos/np_aes.py S-box inversions; mpyc/thresha.py:23-132).
    """
    from mpyc_tpu import gfpx
    from mpyc_tpu.ops.binary import binary_field_ctx

    field = finfields.GF(gfpx.GFpX(2)(modulus))
    bctx = binary_field_ctx(modulus)
    d = bctx.d
    n_send = 2 * t + 1
    assert n_send <= m, 'GRR98 needs 2t+1 <= m'
    lag = [int(c) for c in thresha._recombination_vector(
        field, tuple(range(1, n_send + 1)), 0)]
    l_bytes = (d + 7) // 8
    mask = np.uint32((1 << d) - 1) if d < 32 else np.uint32(0xFFFFFFFF)

    def cmul(c: int, b):
        """Constant carry-less multiply + reduction, unrolled on c's bits."""
        lo = jnp.zeros_like(b)
        hi = jnp.zeros_like(b)
        for i in range(d):
            if (c >> i) & 1:
                lo = lo ^ (b << i if i else b)
                if i > 0 and d > 32 - i:
                    hi = hi ^ (b >> (32 - i))
        res = lo & mask
        for j in range(d - 1):
            k = d + j
            bit_k = ((lo >> k) & 1) if k < 32 else ((hi >> (k - 32)) & 1)
            res = res ^ jnp.where(bit_k != 0, jnp.asarray(bctx._red[j]),
                                  jnp.zeros_like(b))
        return res

    def step(shares, state_words, ctr, shares_b=None):
        orig_shape = shares.shape
        n = 1
        for s in orig_shape[1:]:
            n *= int(s)
        flat = shares.reshape(m, n)
        if shares_b is not None:
            flat = bctx._clmul_reduce(flat, shares_b.reshape(m, n))
        n_vals = t * n_send * n
        n_blocks = max(rng_mod.blocks_needed(n_vals, l_bytes), 1)
        st = state_words.at[1, 4].set(state_words[1, 4] ^ ctr[0])
        st = st.at[0, 4].set(st[0, 4] ^ ctr[1])
        if keccak._pallas_available() and n_blocks >= 1024:
            blocks = keccak._squeeze_ctr_pallas(st, n_blocks, 19)
        else:
            n_pad = max(8, 1 << (n_blocks - 1).bit_length())
            blocks = keccak._squeeze_ctr(st, n_pad, 19)[:n_blocks]
        coefs = rng_mod.words_to_elements(blocks, n_vals, l_bytes, 1)
        coefs = (coefs[:, 0, 0] & mask).reshape(t, n_send, n)
        S = None
        for i in range(n_send):
            term = cmul(lag[i], flat[i])
            S = term if S is None else S ^ term
        C = []
        for k in range(t):
            acc = None
            for i in range(n_send):
                term = cmul(lag[i], coefs[k, i])
                acc = term if acc is None else acc ^ term
            C.append(acc)
        rows = []
        for j in range(m):
            y = None
            for k in range(t):
                y = C[k] if y is None else y ^ C[k]
                y = cmul(j + 1, y)
            rows.append((y ^ S) if y is not None else S)
        out = jnp.stack(rows, axis=0).reshape(orig_shape)
        lo = ctr[0] + jnp.uint32(1)
        hi = ctr[1] + jnp.where(lo == 0, jnp.uint32(1), jnp.uint32(0))
        return out, jnp.stack([lo, hi])

    if fuse_mul:
        def stepm(a, b, state_words, ctr):
            return step(a, state_words, ctr, shares_b=b)
        return jax.jit(stepm)
    return jax.jit(step)
