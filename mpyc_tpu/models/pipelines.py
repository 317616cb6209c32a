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

import functools

import numpy as np
import jax
import jax.numpy as jnp

from mpyc_tpu import finfields, thresha
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
    l_bytes = ((p - 1).bit_length() + 7 >> 3) + rng_mod._WIDEN_BYTES

    def step(secrets, state_words):
        # secrets: (n, L) Mont; state_words: (2, 25) absorbed SHAKE prefix
        n = secrets.shape[0]
        n_vals = t * n
        n_blocks = max(rng_mod.blocks_needed(n_vals, l_bytes), 1)
        if keccak._pallas_available() and n_blocks >= 1024:
            blocks = keccak._squeeze_ctr_pallas(state_words, n_blocks)
        else:
            n_pad = max(8, 1 << (n_blocks - 1).bit_length())
            blocks = keccak._squeeze_ctr(state_words, n_pad)[:n_blocks]
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
    l = ((p - 1).bit_length() + 7 >> 3) + rng_mod._WIDEN_BYTES
    W = -(-l // 4)
    n_chunks = -(-W // ctx.L)
    n = int(np.prod(shape, dtype=np.int64))
    blocks = rng._blocks(rng._next_prefix(),
                         max(rng_mod.blocks_needed(n, l), 1))
    wide = rng_mod.words_to_elements(blocks, n, l, ctx.L)
    return wide.reshape(tuple(shape) + (n_chunks, ctx.L))
