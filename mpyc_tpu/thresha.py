"""Threshold secret sharing: Shamir split/recombine and PRSS, TPU-native.

Capability parity target: /root/reference/mpyc/thresha.py. Two planes:

  * **compat plane** (``random_split``, ``recombine``, ``pseudorandom_share``,
    ``pseudorandom_share_zero``, ``PRF``): host-side, list-of-ints in/out,
    bit-exact with the reference given identical randomness/keys — these are
    the correctness anchors (cf. reference tests/test_thresha.py).
  * **device plane** (``np_*`` variants, ``DevicePRF``): field arrays on the
    TPU; Shamir evaluation is a Horner chain of fused Montgomery kernels,
    recombination a Lagrange-weighted reduction, PRSS a counter-mode SHAKE128
    sponge batch. The counter-mode PRF stream intentionally differs from the
    reference's sequential SHAKE squeeze (which cannot be parallelized); use
    ``PRF`` when reference-stream equality is required.
"""

from __future__ import annotations

import functools
from hashlib import shake_128
from math import prod
import secrets

import numpy as np
from mpyc_tpu.utils.lazyjax import jnp

from mpyc_tpu.ops import keccak, rng as rng_mod
from mpyc_tpu.ops.fieldops import prime_field_ctx

# PRF draws at or below this size take the host-int path (hashlib sponge +
# Python-int reduction); larger draws run the batched device kernels
_HOST_PRF_N = 0 if __import__('os').getenv('MPYC_TPU_NOHOSTOPS') else 256


def _host_prf_n():
    """Effective host-PRF batch cutoff.

    While jax has not been imported (jax-free scalar plane), the host
    path serves EVERY size: the hashlib counter-mode sponge is C-speed
    and a single mid-sized draw would otherwise pull in the whole jax
    import plus per-shape XLA-CPU compiles (measured: one kmsurvival
    division cost 16 s of compiles through this path)."""
    import sys
    if _HOST_PRF_N and 'jax' not in sys.modules:
        return 1 << 30
    return _HOST_PRF_N

__all__ = ['random_split', 'recombine', 'pseudorandom_share',
           'pseudorandom_share_zero', 'np_random_split', 'np_recombine',
           'np_pseudorandom_share', 'np_pseudorandom_share_0', 'PRF',
           'DevicePRF']


# ===========================================================================
# compat plane (host ints; bit-exact vs reference math)
# ===========================================================================

def random_split(field, s, t, m):
    """Shamir-split each secret in list s into m shares with degree-t polys.

    Returns an m-row matrix of int/poly values (row i = party i's shares).
    Same polynomial-evaluation order as the reference (thresha.py:23-44) so
    identical coefficient draws give identical shares.
    """
    p = field.modulus
    order = field.order
    zero = type(p)(0)
    n = len(s)
    shares = [[None] * n for _ in range(m)]
    is_elt = isinstance(s[0], field)
    for h in range(n):
        s_h = s[h].value if is_elt else s[h]
        coefs = [secrets.randbelow(order) for _ in range(t)]
        if t and not isinstance(p, int):
            poly = type(p)
            coefs = [poly(c) for c in coefs]
        for i in range(1, m + 1):
            y = zero
            for c in coefs:
                y = (y + c) * i
            shares[i - 1][h] = (y + s_h) % p
    return shares


@functools.cache
def _recombination_vector(field, xs, x_r):
    """Lagrange coefficients for interpolation point x_r from points xs."""
    xs_v = [field(x).value for x in xs]
    x_rv = field(x_r).value
    vec = []
    for i, x_i in enumerate(xs_v):
        num = field(1)
        den = field(1)
        for j, x_j in enumerate(xs_v):
            if i != j:
                num *= x_rv - x_j
                den *= x_i - x_j
        vec.append((num / den).value)
    return vec


def recombine(field, points, x_rs=0):
    """Recombine shares (lists of values) at x-coordinates x_rs (default 0)."""
    xs, shares = list(zip(*points))
    single = not isinstance(x_rs, list)
    if single:
        x_rs = (x_rs,)
    vectors = [_recombination_vector(field, xs, x_r) for x_r in x_rs]
    n = len(shares[0])
    is_elt = isinstance(shares[0][0], field)
    out = []
    for vec in vectors:
        sums = [0] * n
        for i, row in enumerate(shares):
            c_i = vec[i]
            for h in range(n):
                v = row[h].value if is_elt else row[h]
                sums[h] += v * c_i
        # NB: raw-value inputs return unreduced sums (reference behavior,
        # thresha.py:102-113 — callers reduce downstream)
        out.append([field(v) for v in sums] if is_elt else sums)
    return out[0] if single else out


@functools.cache
def _f_S_i(field, m, i, S):
    """f_S(i+1) where f_S is 1 at 0 and 0 at parties outside S (host int)."""
    points = [(0, [1])] + [(x + 1, [0]) for x in range(m) if x not in S]
    return recombine(field, points, i + 1)[0]


def pseudorandom_share(field, m, i, prfs, uci, n):
    """Party i's PRSS shares of n pseudorandom secrets (host plane)."""
    sums = [0] * n
    for S, prf_S in prfs.items():
        f = _f_S_i(field, m, i, S)
        vals = prf_S(uci, n)
        for h in range(n):
            sums[h] += vals[h] * f
    return [field(v) for v in sums]


def pseudorandom_share_zero(field, m, i, prfs, uci, n):
    """Party i's PRSS shares of n sharings of zero, degree 2t (host plane)."""
    zero = type(field.modulus)(0)
    i1 = i + 1
    sums = [0] * n
    for S, prf_S in prfs.items():
        f = _f_S_i(field, m, i, S)
        d = m - len(S)
        vals = prf_S(uci, n * d)
        for h in range(n):
            y = zero
            for j in range(d):
                y = (y + vals[h * d + j]) * i1
            sums[h] += y * f
    return [field(v) for v in sums]


class PRF:
    """Reference-compatible PRF: shake_128(key + input) chunks mod bound.

    Bit-exact with the reference (thresha.py:220-266): byte_length widened by
    len(key) for non-power-of-2 bounds; little-endian chunks reduced mod
    bound, consumed from one continuous SHAKE stream.
    """

    def __init__(self, key, bound):
        self.key = key
        self.max = bound
        self.byte_length = ((bound - 1).bit_length() + 7) // 8
        if bound & (bound - 1):
            self.byte_length += len(self.key)

    def __call__(self, s, n=None):
        if isinstance(n, tuple):
            shape = n
            n = prod(shape)
        else:
            shape = None
        n_ = 1 if n is None else n
        l = self.byte_length
        if n_ == 0:
            vals = []
        elif l == 0:
            vals = [0] * n_
        else:
            stream = shake_128(self.key + s).digest(n_ * l)
            bound = self.max
            vals = [int.from_bytes(stream[i:i + l], 'little') % bound
                    for i in range(0, n_ * l, l)]
        if shape is not None:
            return np.array(vals, dtype=object).reshape(shape)
        return vals[0] if n is None else vals


# ===========================================================================
# device plane (field arrays)
# ===========================================================================

def np_random_split(field, s, t, m, rng=None):
    """Shamir-split a field array s of shape (...,) into (m, ...) shares.

    TPU-native: coefficients drawn on device (counter-mode SHAKE by default),
    share evaluation is a fused Horner chain over the party axis — the
    reference's Vandermonde object-matmul (thresha.py:47-64) becomes m*t
    Montgomery multiply-adds on the VPU. Arbitrary batch shapes are
    supported (used with a leading party axis for co-located resharing).
    """
    if rng is None:
        rng = _default_rng()
    acls = field.array
    if not isinstance(s, acls):
        s = acls(s)
    if t == 0:
        xp = np if isinstance(s.data, np.ndarray) else jnp
        data = xp.broadcast_to(s.data[None], (m,) + s.data.shape)
        if xp is np:
            data = np.array(data)  # writable, contiguous host copy
        return acls.from_data(data)
    shape = s.shape if s.shape else (1,)
    n = prod(shape)
    if (0 < n <= _host_prf_n() and field.characteristic != 2
            and field.ext_deg == 1 and isinstance(s.data, np.ndarray)
            and hasattr(rng, 'field_uniform_mont_ints')
            and n * t * ((field.modulus.bit_length() + 7 >> 3) + 16)
            <= 65536):
        # host-int fast path: all m Horner rows fused into one int pass
        ctx = prime_field_ctx(field.modulus)
        p = ctx.p
        s_mont = ctx._mont_ints(np.asarray(s.data).reshape((n, -1)))
        coefs = rng.field_uniform_mont_ints(ctx, t * n).reshape(t, n)
        rows = []
        for i in range(1, m + 1):
            y = 0
            for k in range(t):
                y = (y + coefs[k]) * i
            rows.append((y + s_mont) % p)
        mont = ctx._mont_out(np.concatenate(rows), (m, n))
        return acls.from_data(mont.reshape((m,) + tuple(s.shape) + mont.shape[-1:]))
    coefs = rng.field_uniform(field, (t,) + shape)
    rows = []
    for i in range(1, m + 1):
        y = None
        for j in range(t):
            c_j = coefs[j]
            y = c_j if y is None else (y + c_j)
            y = y * i  # Horner step: (y + c_j) * i
        rows.append(y + s)
    datas = [r.data for r in rows]
    xp = np if all(isinstance(d, np.ndarray) for d in datas) else jnp
    return acls.from_data(xp.stack(datas, axis=0))


def np_recombine(field, points, x_rs=0):
    """Recombine field-array shares at x_rs.

    points: list of (x_i, field.array of shape (n,)). Lagrange coefficients
    are host-computed scalars folded into cached constant-multiply kernels.
    """
    xs = tuple(x for x, _ in points)
    shares = [sh for _, sh in points]
    acls = field.array
    shares = [sh if isinstance(sh, acls) else acls(sh) for sh in shares]
    single = not isinstance(x_rs, list)
    if single:
        x_rs = (x_rs,)
    n = prod(shares[0].shape) if shares[0].shape else 1
    if (0 < n <= _host_prf_n() and field.characteristic != 2
            and field.ext_deg == 1
            and all(isinstance(sh.data, np.ndarray) for sh in shares)):
        # host-int fast path: one fused Lagrange dot per evaluation point
        ctx = prime_field_ctx(field.modulus)
        p = ctx.p
        mis = [ctx._mont_ints(np.asarray(sh.data).reshape((n, -1)))
               for sh in shares]
        outs = []
        for x_r in x_rs:
            vec = [int(c) for c in _recombination_vector(field, xs, int(x_r))]
            acc = vec[0] * mis[0]
            for c, mi in zip(vec[1:], mis[1:]):
                acc = acc + c * mi
            mont = ctx._mont_out(acc % p, (n,))
            outs.append(acls.from_data(
                mont.reshape(tuple(shares[0].shape) + mont.shape[-1:])))
        return outs[0] if single else outs
    outs = []
    for x_r in x_rs:
        vec = _recombination_vector(field, xs, int(x_r))
        acc = None
        for c_i, sh in zip(vec, shares):
            term = sh * (c_i if isinstance(c_i, int) else c_i)
            acc = term if acc is None else acc + term
        outs.append(acc)
    return outs[0] if single else outs


class DevicePRF:
    """Counter-mode SHAKE128 PRF producing field arrays on device.

    Agreeing parties evaluating DevicePRF with the same key and input get
    identical outputs (determinism preserved); the byte->value mapping
    mirrors PRF but the stream is counter-parallel, so outputs differ from
    the sequential reference stream by construction.
    """

    def __init__(self, key, bound):
        self.key = key
        self.max = bound
        self.byte_length = ((bound - 1).bit_length() + 7) // 8
        self.is_pow2 = not (bound & (bound - 1))
        if not self.is_pow2:
            self.byte_length += rng_mod._WIDEN_BYTES

    def host_integers(self, s: bytes, shape):
        """PRF output as plain integers mod bound (host object array).

        Used when the *same* integer values must embed into several fields
        at once (type conversion masks, runtime.py _convert): the device
        pipeline reduces directly into one field, so a field-independent
        integer stream is needed instead.  Deterministic across parties.
        """
        n = prod(shape) if shape else 1
        l = self.byte_length
        if n == 0 or l == 0:
            vals = [0] * n
        else:
            stream = shake_128(self.key + s).digest(n * l)
            bound = self.max
            vals = [int.from_bytes(stream[i:i + l], 'little') % bound
                    for i in range(0, n * l, l)]
        return np.array(vals, dtype=object).reshape(shape)

    def field_array(self, field, s: bytes, shape):
        """PRF output embedded into a prime field as a field.array.

        Valid when bound == field.modulus (values uniform mod p) or bound is
        a power of two (the same k-bit integers embed consistently into any
        field, reduced mod p when k exceeds the field width — used by type
        conversion and bounded randomness, reference runtime.py:749-761).
        """
        if field.characteristic == 2:
            # GF(2^d): d-bit PRF values are field elements directly
            assert self.is_pow2 and self.max <= field.order
            k = (self.max - 1).bit_length()
            return field.array.from_data(self.bits_uint32(s, tuple(shape), k))
        if field.ext_deg > 1:
            # odd-char extension field: ints below the order embed as
            # base-p digit polynomials (reference thresha.py:232-266)
            assert self.max == field.order or self.is_pow2
            return field.array(self.host_integers(s, tuple(shape)))
        assert self.max == field.modulus or self.is_pow2
        ctx = prime_field_ctx(field.modulus)
        n = prod(shape) if shape else 1
        l = max(self.byte_length, 1)
        if 0 < n <= _host_prf_n() and l <= keccak.RATE:
            hf = _native_hf(field)
            if hf is not None:
                # native C fold of the counter-block stream
                vals = _native_prf_vals(hf, self, s, n)
                return field.array.from_data(
                    _native_rep(hf, vals, tuple(shape)))
            # Small protocol draws: C-speed sponge + Python-int reduction,
            # Montgomery int views seeded so downstream host-plane ops
            # never decode limbs. Bit-identical with the device reduction.
            mont = ctx._mont_out(self._host_mont_vals(ctx, s, n, l), (n,))
            return field.array.from_data(
                mont.reshape(tuple(shape) + mont.shape[-1:]))
        blocks = keccak.shake128_ctr_blocks(
            self.key + s, max(rng_mod.blocks_needed(n, l), 1))
        wide = rng_mod.words_to_elements(blocks, n, l, ctx.L)
        if self.is_pow2 and self.max > 1:
            k = (self.max - 1).bit_length()
            wide = _mask_bits(wide, k)
        elif self.max == 1:
            wide = jnp.zeros_like(wide)
        mont = ctx.reduce_chunks(wide.shape[-2])(wide)
        return field.array.from_data(
            mont.reshape(tuple(shape) + mont.shape[-1:]))

    def _host_mont_vals(self, ctx, s: bytes, n: int, l: int):
        """PRF values as a list of Montgomery-domain Python ints.

        The host-int twin of the device reduction: l little-endian stream
        bytes per value (block tails discarded, matching
        rng.words_to_elements), bound-masked, reduced mod p, lifted by R.
        """
        blocks = np.asarray(keccak.shake128_ctr_blocks(
            self.key + s, max(rng_mod.blocks_needed(n, l), 1)))
        raw = blocks.astype('<u4').tobytes()
        k_per, p, R = keccak.RATE // l, ctx.p, ctx.R
        if self.is_pow2 and self.max > 1:
            mask = (1 << (self.max - 1).bit_length()) - 1
        elif self.max == 1:
            mask = 0
        else:
            mask = -1
        vals = np.empty(n, dtype=object)
        for j in range(n):
            b_idx, e_idx = divmod(j, k_per)
            off = b_idx * keccak.RATE + e_idx * l
            v = int.from_bytes(raw[off:off + l], 'little')
            if mask >= 0:
                v &= mask
            vals[j] = v
        return vals % p * R % p

    def bits_uint32(self, s: bytes, shape, k=None):
        """PRF output as raw k-bit uint32 values (power-of-2 bounds, k<=32)."""
        assert self.is_pow2
        k = k if k is not None else (self.max - 1).bit_length()
        assert k <= 32
        n = prod(shape) if shape else 1
        l = max(self.byte_length, 1)
        blocks = keccak.shake128_ctr_blocks(
            self.key + s, max(rng_mod.blocks_needed(n, l), 1))
        vals = rng_mod.words_to_elements(blocks, n, l, 1)[:, 0, 0]
        mask = np.uint32((1 << k) - 1) if k < 32 else np.uint32(0xFFFFFFFF)
        return (vals & mask).reshape(shape)


def _mask_bits(wide, k: int):
    """Mask (..., n_chunks, L) wide values down to their low k bits."""
    nc, L = wide.shape[-2], wide.shape[-1]
    flat = wide.reshape(wide.shape[:-2] + (nc * L,))
    w, rem = k // 32, k % 32
    total = nc * L
    cols = []
    for i in range(total):
        if i < w:
            cols.append(flat[..., i])
        elif i == w and rem:
            cols.append(flat[..., i] & np.uint32((1 << rem) - 1))
        else:
            cols.append(jnp.zeros_like(flat[..., i]))
    return jnp.stack(cols, axis=-1).reshape(wide.shape)


def _native_hf(field):
    """Native host-field facade for a prime field, or None."""
    if field.characteristic == 2 or field.ext_deg != 1 or \
            field.modulus.bit_length() > 512:
        return None
    from mpyc_tpu.ops import hostfield
    return hostfield.host_ctx(prime_field_ctx(field.modulus))


def _native_rep(hf, flat, shape):
    """Native flat mont array -> host field data in the plane's rep."""
    import sys
    n = prod(shape) if shape else 1
    if 'jax' not in sys.modules and n < 4096:
        return hf.obj_rep(flat, shape)
    return hf.limb_rep(flat, shape)


def _prf_mask_bits(prf):
    """mask_bits argument of the native PRF fold for a PRF's bound."""
    if not getattr(prf, 'is_pow2', False):
        return -1
    if prf.max == 1:
        return 0
    return (prf.max - 1).bit_length()


def _native_prf_vals(hf, prf, uci: bytes, count: int):
    """PRF values as native mont residues (the _host_mont_vals stream
    convention, folded at C speed)."""
    l = max(prf.byte_length, 1)
    blocks = np.asarray(keccak.shake128_ctr_blocks(
        prf.key + uci, max(rng_mod.blocks_needed(count, l), 1)))
    raw = np.frombuffer(blocks.astype('<u4').tobytes(), np.uint8)
    return hf.prf_fold(raw, count, l, keccak.RATE, _prf_mask_bits(prf))


def np_pseudorandom_share(field, m, i, prfs, uci: bytes, n):
    """Party i's PRSS shares of n pseudorandom secrets, on device."""
    if (0 < n <= _host_prf_n() and field.characteristic != 2
            and field.ext_deg == 1):
        hf = _native_hf(field)
        if hf is not None and all(max(prf.byte_length, 1) <= keccak.RATE
                                  for prf in prfs.values()):
            # native path: C-kernel PRF fold + weighted accumulate
            acc = None
            for S, prf_S in prfs.items():
                f = int(_f_S_i(field, m, i, S))
                term = hf.mulc_int(_native_prf_vals(hf, prf_S, uci, n), f)
                acc = term if acc is None else hf.add(acc, term)
            return field.array.from_data(_native_rep(hf, acc, (n,)))
        # host-int fast path: one fused weighted sum over all key subsets
        # (scalar coefficients keep the Montgomery domain), one encode
        ctx = prime_field_ctx(field.modulus)
        p = ctx.p
        acc = 0
        for S, prf_S in prfs.items():
            f = int(_f_S_i(field, m, i, S))
            l = max(prf_S.byte_length, 1)
            if l > keccak.RATE:
                break
            acc = acc + f * prf_S._host_mont_vals(ctx, uci, n, l)
        else:
            if not isinstance(acc, np.ndarray):
                acc = np.full(n, acc, dtype=object)
            mont = ctx._mont_out(acc % p, (n,))
            return field.array.from_data(mont)
    acc = None
    for S, prf_S in prfs.items():
        f = _f_S_i(field, m, i, S)
        vals = prf_S.field_array(field, uci, (n,))
        term = vals * f
        acc = term if acc is None else acc + term
    return acc


def np_pseudorandom_share_host(field, m, i, prfs, uci: bytes, n):
    """Party i's PRSS shares of n pseudorandom secrets, embedding a
    field-independent host integer stream (same integers land in every
    field — required by cross-field conversion masks)."""
    acc = None
    for S, prf_S in prfs.items():
        f = _f_S_i(field, m, i, S)
        vals = field.array(prf_S.host_integers(uci, (n,)))
        term = vals * f
        acc = term if acc is None else acc + term
    return acc


def np_pseudorandom_share_0(field, m, i, prfs, uci: bytes, n):
    """Party i's PRSS shares of n zero-sharings (degree 2t), on device."""
    i1 = i + 1
    if (0 < n <= _host_prf_n() and field.characteristic != 2
            and field.ext_deg == 1):
        hf = _native_hf(field)
        if hf is not None and all(max(prf.byte_length, 1) <= keccak.RATE
                                  for prf in prfs.values()):
            # native path: C-kernel PRF fold + per-subset Horner in i+1
            acc = None
            st = hf.stride
            for S, prf_S in prfs.items():
                f = int(_f_S_i(field, m, i, S))
                d = m - len(S)
                if d == 0:      # m == 1, t == 0: zero-sharing is 0
                    continue
                vals = _native_prf_vals(hf, prf_S, uci, n * d)
                cols = vals.reshape(n, d * st)
                y = np.ascontiguousarray(cols[:, :st]).reshape(-1)
                for k in range(1, d):
                    vk = np.ascontiguousarray(
                        cols[:, k * st:(k + 1) * st]).reshape(-1)
                    y = hf.add(hf.mulc_int(y, i1), vk)
                y = hf.mulc_int(y, i1 * f)
                acc = y if acc is None else hf.add(acc, y)
            if acc is None:
                acc = np.zeros(n * st,
                               np.uint64 if st == 1 else np.uint32)
            return field.array.from_data(_native_rep(hf, acc, (n,)))
        ctx = prime_field_ctx(field.modulus)
        p = ctx.p
        acc = 0
        for S, prf_S in prfs.items():
            f = int(_f_S_i(field, m, i, S))
            d = m - len(S)
            if d == 0:  # m == 1, t == 0: zero-sharing is identically zero
                continue
            l = max(prf_S.byte_length, 1)
            if l > keccak.RATE:
                break
            vals = prf_S._host_mont_vals(ctx, uci, n * d, l).reshape(n, d)
            y = 0
            for k in range(d):
                y = (y + vals[:, k]) * i1
            acc = acc + f * y
        else:
            if not isinstance(acc, np.ndarray):
                acc = np.full(n, acc, dtype=object)
            mont = ctx._mont_out(acc % p, (n,))
            return field.array.from_data(mont)
    acc = None
    for S, prf_S in prfs.items():
        f = int(_f_S_i(field, m, i, S))
        d = m - len(S)
        if d == 0:  # m == 1, t == 0: zero-sharing is identically zero
            term = field.array(np.zeros(n, dtype=object))
        else:
            vals = prf_S.field_array(field, uci, (n, d))
            y = None
            for j in range(d):
                v = vals[:, j]
                y = v if y is None else (y + v)
                y = y * i1
            term = y * f
        acc = term if acc is None else acc + term
    return acc


@functools.cache
def _default_rng():
    return rng_mod.KeccakRNG()
