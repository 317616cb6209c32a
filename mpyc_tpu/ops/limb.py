"""Multi-limb (uint32) modular arithmetic kernels for TPU.

This module replaces the reference's GMP bignum layer (see
/root/reference/mpyc/gmpy.py and finfields.py): instead of arbitrary-precision
Python ints, field elements are fixed-width little-endian arrays of uint32
limbs, shape ``(..., L)``, so that all arithmetic vectorizes on the TPU VPU
and batches over arbitrary leading dimensions.

Core primitives:
  * ``mul32`` — 32x32 -> 64-bit multiply synthesized from 16-bit halves
    (TPU has no native 64-bit scalar path; everything stays in uint32 lanes).
  * carry/borrow chains for multi-limb add/sub.
  * Montgomery multiplication (CIOS), exponentiation, inversion.
  * reduction of wide (K-limb) values mod p via precomputed radix powers
    (used to reduce PRF output streams into field elements).

All functions are pure and jit-friendly: limb counts and moduli are static
Python values baked into the trace; data is uint32 jax arrays.

Internally limbs are handled as Python lists of ``(...)``-shaped arrays
(unrolled at trace time); XLA fuses the resulting elementwise graphs.
"""

from __future__ import annotations


import numpy as np
from mpyc_tpu.utils.lazyjax import jnp, lax

U32 = np.uint32
_MASK16 = np.uint32(0xFFFF)


# ---------------------------------------------------------------------------
# host-side conversions
# ---------------------------------------------------------------------------

def int_to_limbs(x: int, L: int) -> np.ndarray:
    """Little-endian uint32 limb vector of nonnegative int x (host-side)."""
    assert x >= 0 and x < (1 << (32 * L)), (x, L)
    return np.array([(x >> (32 * i)) & 0xFFFFFFFF for i in range(L)],
                    dtype=np.uint32)


def limbs_to_int(v) -> int:
    """Python int from a little-endian uint32 limb vector (host-side)."""
    v = np.asarray(v)
    return sum(int(v[i]) << (32 * i) for i in range(v.shape[-1]))


def ints_to_limbs(xs, L: int) -> np.ndarray:
    """Vector/array of nonneg ints (object ndarray or list) -> (..., L) uint32.

    Vectorized object arithmetic for every L: L C-level passes over the
    array instead of a per-element Python loop (the loop dominated scalar
    protocol latency for L >= 3 fields, e.g. SecFxp24's 87-bit prime).
    """
    arr = np.asarray(xs, dtype=object)
    if L == 1:
        return arr.astype(np.uint32).reshape(arr.shape + (1,))
    limbs = []
    cur = arr
    for i in range(L):
        limbs.append((cur & 0xFFFFFFFF).astype(np.uint32))
        if i < L - 1:
            cur = cur >> 32
    return np.stack(limbs, axis=-1)


def limbs_to_ints(v) -> np.ndarray:
    """(..., L) uint32 -> object ndarray of ints (host-side).

    Also accepts the jax-free plane's object representation (..., 1)
    of Python ints (fieldops._mont_out), where decoding is a view."""
    v = np.asarray(v)
    if v.dtype == object:
        return v[..., 0]
    L = v.shape[-1]
    if L == 1:
        return v[..., 0].astype(object)
    acc = v[..., L - 1].astype(object)
    for i in range(L - 2, -1, -1):
        acc = (acc << 32) | v[..., i].astype(object)
    return np.asarray(acc, dtype=object)


# ---------------------------------------------------------------------------
# limb packing helpers (device)
# ---------------------------------------------------------------------------

def unstack(x, L: int):
    """(..., L) array -> list of L (...)-shaped arrays."""
    return [lax.index_in_dim(x, i, axis=x.ndim - 1, keepdims=False)
            for i in range(L)]


def stack(limbs):
    """list of L (...)-shaped arrays -> (..., L)."""
    return jnp.stack(limbs, axis=-1)


def _zeros_like(x):
    return jnp.zeros_like(x)


# ---------------------------------------------------------------------------
# 32-bit scalar primitives (vectorized over array shapes)
# ---------------------------------------------------------------------------

def mul32(a, b):
    """Full 32x32 -> 64-bit product as (lo, hi) uint32 pair.

    Synthesized from 16-bit halves; 4 multiplies + carries. This is the
    TPU-native replacement for GMP's limb multiply.
    """
    a = a.astype(U32)
    b = b.astype(U32)
    al = a & _MASK16
    ah = a >> 16
    bl = b & _MASK16
    bh = b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = lh + hl
    mid_c = (mid < lh).astype(U32)          # overflow of lh+hl adds 2^48
    lo = ll + (mid << 16)
    c1 = (lo < ll).astype(U32)
    hi = hh + (mid >> 16) + (mid_c << 16) + c1
    return lo, hi


def addc2(a, b):
    """(a + b) mod 2^32 and carry-out (uint32 0/1)."""
    s = a + b
    return s, (s < a).astype(U32)


def subb2(a, b):
    """(a - b) mod 2^32 and borrow-out (uint32 0/1)."""
    return a - b, (a < b).astype(U32)


def mac(x, y, acc, carry):
    """x*y + acc + carry as 64-bit (lo, hi); all operands uint32.

    Never overflows 64 bits: (2^32-1)^2 + 2*(2^32-1) < 2^64.
    """
    lo, hi = mul32(x, y)
    lo, c1 = addc2(lo, acc)
    lo, c2 = addc2(lo, carry)
    return lo, hi + c1 + c2


# ---------------------------------------------------------------------------
# multi-limb primitives: limbs as python lists of arrays
# ---------------------------------------------------------------------------

def add_ll(a, b):
    """Multi-limb add: (limbs, carry_out)."""
    out = []
    c = _zeros_like(a[0])
    for i in range(len(a)):
        s, c1 = addc2(a[i], b[i])
        s, c2 = addc2(s, c)
        out.append(s)
        c = c1 | c2
    return out, c


def sub_ll(a, b):
    """Multi-limb sub: (limbs, borrow_out)."""
    out = []
    brw = _zeros_like(a[0])
    for i in range(len(a)):
        d, b1 = subb2(a[i], b[i])
        d, b2 = subb2(d, brw)
        out.append(d)
        brw = b1 | b2
    return out, brw


def geq_ll(a, b):
    """a >= b as bool array."""
    _, brw = sub_ll(a, b)
    return brw == 0


def select_ll(mask, a, b):
    """Per-element select between limb vectors (mask broadcast over limbs)."""
    return [jnp.where(mask, x, y) for x, y in zip(a, b)]


def iszero_ll(a):
    acc = a[0]
    for x in a[1:]:
        acc = acc | x
    return acc == 0


def eq_ll(a, b):
    acc = a[0] ^ b[0]
    for x, y in zip(a[1:], b[1:]):
        acc = acc | (x ^ y)
    return acc == 0


# ---------------------------------------------------------------------------
# modular add/sub/neg (inputs < p, standard or Montgomery form alike)
# ---------------------------------------------------------------------------

def _const_limbs(p_int: int, L: int):
    return [np.uint32((p_int >> (32 * i)) & 0xFFFFFFFF) for i in range(L)]


def add_mod(a, b, p_limbs):
    """(a + b) mod p for a, b < p. p_limbs: list of L uint32 consts."""
    L = len(a)
    p = [jnp.broadcast_to(jnp.asarray(x, U32), a[0].shape) for x in p_limbs]
    s, cout = add_ll(a, b)
    d, brw = sub_ll(s, p)
    use_d = (cout == 1) | (brw == 0)
    return select_ll(use_d, d, s)


def sub_mod(a, b, p_limbs):
    """(a - b) mod p for a, b < p."""
    p = [jnp.broadcast_to(jnp.asarray(x, U32), a[0].shape) for x in p_limbs]
    d, brw = sub_ll(a, b)
    dp, _ = add_ll(d, p)
    return select_ll(brw == 1, dp, d)


def neg_mod(a, p_limbs):
    """(-a) mod p for a < p (0 stays 0)."""
    p = [jnp.broadcast_to(jnp.asarray(x, U32), a[0].shape) for x in p_limbs]
    d, _ = sub_ll(p, a)
    z = iszero_ll(a)
    return select_ll(z, a, d)


# ---------------------------------------------------------------------------
# Montgomery multiplication (CIOS)
# ---------------------------------------------------------------------------

def mont_mul(a, b, p_limbs, n0inv, unroll=False):
    """Montgomery product a*b*R^{-1} mod p, R = 2^(32L); CIOS method.

    a, b: limb lists (values < p). p_limbs: python uint32 consts.
    n0inv: uint32 const, -p^{-1} mod 2^32.
    Result < p.

    For small L the row loop is fully unrolled (XLA fuses the whole chain);
    for larger L the rows run under a fori_loop so trace/compile time stays
    O(L) instead of O(L^2) (XLA-CPU compile chokes on long scalar chains).
    ``unroll=True`` forces the unrolled chain regardless of L (Pallas
    kernels: values stay in registers, no loop-carried stacking).
    """
    L = len(a)
    if L > 2 and not unroll:
        return _mont_mul_loop(a, b, p_limbs, n0inv)
    zero = _zeros_like(a[0])
    n0 = jnp.asarray(n0inv, U32)
    pj = [jnp.asarray(x, U32) for x in p_limbs]
    t = [zero] * (L + 2)
    for i in range(L):
        # multiply-accumulate row: t += a * b[i]
        c = zero
        for j in range(L):
            t[j], c = mac(a[j], b[i], t[j], c)
        t[L], cc = addc2(t[L], c)
        t[L + 1] = t[L + 1] + cc
        # reduction: m = t[0] * n0inv mod 2^32; t = (t + m*p) / 2^32
        m = t[0] * n0
        _, c = mac(m, pj[0], t[0], zero)
        for j in range(1, L):
            t[j - 1], c = mac(m, pj[j], t[j], c)
        t[L - 1], cc = addc2(t[L], c)
        t[L] = t[L + 1] + cc
        t[L + 1] = zero
    # final conditional subtraction; t[L] in {0,1}
    res = t[:L]
    p_b = [jnp.broadcast_to(x, a[0].shape) for x in pj]
    d, brw = sub_ll(res, p_b)
    use_d = (t[L] == 1) | (brw == 0)
    return select_ll(use_d, d, res)


def _mont_mul_loop(a, b, p_limbs, n0inv):
    """CIOS with the outer row loop as lax.fori_loop (trace size O(L))."""
    import jax

    L = len(a)
    zero = _zeros_like(a[0])
    n0 = jnp.asarray(n0inv, U32)
    pj = [jnp.asarray(x, U32) for x in p_limbs]
    b_st = jnp.stack(b, axis=0)                   # (L, ...)
    t0 = jnp.stack([zero] * (L + 2), axis=0)      # (L+2, ...)

    def row(i, t_st):
        bi = b_st[i]
        t = [t_st[j] for j in range(L + 2)]
        c = zero
        for j in range(L):
            t[j], c = mac(a[j], bi, t[j], c)
        t[L], cc = addc2(t[L], c)
        t[L + 1] = t[L + 1] + cc
        m = t[0] * n0
        _, c = mac(m, pj[0], t[0], zero)
        for j in range(1, L):
            t[j - 1], c = mac(m, pj[j], t[j], c)
        t[L - 1], cc = addc2(t[L], c)
        t[L] = t[L + 1] + cc
        t[L + 1] = zero
        return jnp.stack(t, axis=0)

    t_st = jax.lax.fori_loop(0, L, row, t0)
    res = [t_st[j] for j in range(L)]
    p_b = [jnp.broadcast_to(x, a[0].shape) for x in pj]
    d, brw = sub_ll(res, p_b)
    use_d = (t_st[L] == 1) | (brw == 0)
    return select_ll(use_d, d, res)


def mont_sqr(a, p_limbs, n0inv):
    return mont_mul(a, a, p_limbs, n0inv)


def mont_pow_const(a, e: int, p_limbs, n0inv, one_mont_limbs):
    """a^e * R mod p for Montgomery-form a and static nonneg int exponent e.

    Uses a lax.scan over the (static) bit string with multiply-always +
    select, keeping the trace size O(1) in the exponent width.
    one_mont_limbs: R mod p as python uint32 consts.
    """
    L = len(a)
    if e == 0:
        one = [jnp.broadcast_to(jnp.asarray(x, U32), a[0].shape)
               for x in one_mont_limbs]
        return one
    bits = [(e >> i) & 1 for i in range(e.bit_length())][::-1]  # MSB first
    if len(bits) <= 8:
        # short exponents: unroll square-and-multiply exactly
        res = list(a)
        for bit in bits[1:]:
            res = mont_sqr(res, p_limbs, n0inv)
            if bit:
                res = mont_mul(res, a, p_limbs, n0inv)
        return res

    bit_arr = jnp.asarray(np.array(bits[1:], dtype=np.uint32))
    a_st = stack(a)

    def body(res_st, bit):
        res = unstack(res_st, L)
        res = mont_sqr(res, p_limbs, n0inv)
        mul = mont_mul(res, unstack(a_st, L), p_limbs, n0inv)
        res = select_ll(bit == 1, mul, res)
        return stack(res), None

    res_st, _ = lax.scan(body, stack(a), bit_arr)
    return unstack(res_st, L)


def mont_inv(a, p_int: int, p_limbs, n0inv, one_mont_limbs):
    """Montgomery-form inverse via Fermat: a^(p-2) (inverse of 0 is 0)."""
    return mont_pow_const(a, p_int - 2, p_limbs, n0inv, one_mont_limbs)


# ---------------------------------------------------------------------------
# wide reduction: K limbs -> element mod p
# ---------------------------------------------------------------------------

def reduce_wide(chunks, radix_pows_mont, p_limbs, n0inv):
    """Reduce a wide little-endian limb value mod p.

    chunks: list of n_chunk limb-lists, each of length L, little-endian
      groups of 32L bits (value = sum_i chunk_i * 2^(32 L i)). Each chunk is
      an arbitrary L-limb value (may exceed p).
    radix_pows_mont: per chunk i the constant (2^(32 L i) * R^2 mod p) limbs
      so that mont_mul(chunk_i, radix_pows_mont[i]) == chunk_i * 2^(32Li) * R,
      i.e. the result lands directly in Montgomery form.

    Returns Montgomery-form limbs of (value mod p).

    Correctness with chunk_i >= p: CIOS requires inputs < R (always true)
    and output < 2p -> final conditional subtraction still applies since
    a*b/R + p <= (R-1)*p/R + p < 2p when one operand (the constant) is < p.
    """
    acc = None
    for i, ch in enumerate(chunks):
        term = mont_mul(ch, [jnp.asarray(x, U32) for x in radix_pows_mont[i]],
                        p_limbs, n0inv)
        acc = term if acc is None else add_mod(acc, term, p_limbs)
    return acc
