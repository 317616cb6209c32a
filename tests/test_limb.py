"""Bit-exact tests of the uint32 limb kernels against Python big ints."""
import random

import functools

import numpy as np
import jax
import jax.numpy as jnp

from mpyc_tpu.ops import limb


@functools.cache
def _jitted(name, L, extra=()):
    """Jit-compiled stacked-array wrappers so tests avoid eager dispatch."""
    if name == 'add_ll':
        def f(a, b):
            s, c = limb.add_ll(limb.unstack(a, L), limb.unstack(b, L))
            return limb.stack(s), c
    elif name == 'sub_ll':
        def f(a, b):
            d, br = limb.sub_ll(limb.unstack(a, L), limb.unstack(b, L))
            return limb.stack(d), br
    elif name == 'add_mod':
        def f(a, b):
            return limb.stack(limb.add_mod(limb.unstack(a, L),
                                           limb.unstack(b, L), extra))
    elif name == 'sub_mod':
        def f(a, b):
            return limb.stack(limb.sub_mod(limb.unstack(a, L),
                                           limb.unstack(b, L), extra))
    elif name == 'neg_mod':
        def f(a):
            return limb.stack(limb.neg_mod(limb.unstack(a, L), extra))
    elif name == 'mont_mul':
        p_limbs, n0inv = extra
        def f(a, b):
            return limb.stack(limb.mont_mul(limb.unstack(a, L),
                                            limb.unstack(b, L),
                                            p_limbs, n0inv))
    elif name.startswith('mont_pow_'):
        p_limbs, n0inv, one_mont, e = extra
        def f(a):
            return limb.stack(limb.mont_pow_const(limb.unstack(a, L), e,
                                                  p_limbs, n0inv, one_mont))
    elif name == 'mont_inv':
        p, p_limbs, n0inv, one_mont = extra
        def f(a):
            return limb.stack(limb.mont_inv(limb.unstack(a, L), p,
                                            p_limbs, n0inv, one_mont))
    return jax.jit(f)


RNG = random.Random(20260816)


def _rand_ints(n, bits):
    return [RNG.randrange(1 << bits) for _ in range(n)]


def test_mul32_exhaustive_edges():
    vals = [0, 1, 2, 3, 0xFFFF, 0x10000, 0x12345678, 0xFFFFFFFE, 0xFFFFFFFF]
    a = jnp.asarray(np.array([x for x in vals for _ in vals], np.uint32))
    b = jnp.asarray(np.array([y for _ in vals for y in vals], np.uint32))
    lo, hi = limb.mul32(a, b)
    lo, hi = np.asarray(lo), np.asarray(hi)
    k = 0
    for x in vals:
        for y in vals:
            prod = x * y
            assert int(lo[k]) == prod & 0xFFFFFFFF
            assert int(hi[k]) == prod >> 32
            k += 1


def test_mul32_random():
    n = 4096
    xs = _rand_ints(n, 32)
    ys = _rand_ints(n, 32)
    lo, hi = limb.mul32(jnp.asarray(np.array(xs, np.uint32)),
                        jnp.asarray(np.array(ys, np.uint32)))
    lo, hi = np.asarray(lo), np.asarray(hi)
    for i in range(n):
        prod = xs[i] * ys[i]
        assert int(lo[i]) == prod & 0xFFFFFFFF and int(hi[i]) == prod >> 32


def test_add_sub_ll():
    for L in (1, 2, 3, 8):
        n = 256
        xs = _rand_ints(n, 32 * L)
        ys = _rand_ints(n, 32 * L)
        a = jnp.asarray(limb.ints_to_limbs(xs, L))
        b = jnp.asarray(limb.ints_to_limbs(ys, L))
        s, cout = _jitted('add_ll', L)(a, b)
        d, brw = _jitted('sub_ll', L)(a, b)
        s_int = limb.limbs_to_ints(np.asarray(s))
        d_int = limb.limbs_to_ints(np.asarray(d))
        for i in range(n):
            tot = xs[i] + ys[i]
            assert int(s_int[i]) == tot % (1 << (32 * L))
            assert int(np.asarray(cout)[i]) == tot >> (32 * L)
            dif = xs[i] - ys[i]
            assert int(d_int[i]) == dif % (1 << (32 * L))
            assert int(np.asarray(brw)[i]) == (1 if dif < 0 else 0)


PRIMES = {
    1: 2**31 - 1,
    2: (1 << 64) - 59,            # 64-bit prime
    3: (1 << 89) - 1,             # Mersenne 89
    8: 2**255 - 19,               # curve25519 prime
}


def _mont_consts(p, L):
    R = 1 << (32 * L)
    n0inv = (-pow(p, -1, 1 << 32)) % (1 << 32)
    p_limbs = [np.uint32((p >> (32 * i)) & 0xFFFFFFFF) for i in range(L)]
    return R, np.uint32(n0inv), p_limbs


def test_mod_add_sub_neg():
    for L, p in PRIMES.items():
        _, _, p_limbs = _mont_consts(p, L)
        n = 128
        xs = [RNG.randrange(p) for _ in range(n)] + [0, 1, p - 1, 0]
        ys = [RNG.randrange(p) for _ in range(n)] + [0, p - 1, p - 1, 1]
        a = jnp.asarray(limb.ints_to_limbs(xs, L))
        b = jnp.asarray(limb.ints_to_limbs(ys, L))
        pl = tuple(p_limbs)
        s = limb.limbs_to_ints(np.asarray(_jitted('add_mod', L, pl)(a, b)))
        d = limb.limbs_to_ints(np.asarray(_jitted('sub_mod', L, pl)(a, b)))
        ng = limb.limbs_to_ints(np.asarray(_jitted('neg_mod', L, pl)(a)))
        for i in range(len(xs)):
            assert int(s[i]) == (xs[i] + ys[i]) % p
            assert int(d[i]) == (xs[i] - ys[i]) % p
            assert int(ng[i]) == (-xs[i]) % p


def test_mont_mul_pow_inv():
    for L, p in PRIMES.items():
        R, n0inv, p_limbs = _mont_consts(p, L)
        one_mont = [np.uint32(((R % p) >> (32 * i)) & 0xFFFFFFFF)
                    for i in range(L)]
        n = 64
        xs = [RNG.randrange(p) for _ in range(n)] + [0, 1, p - 1]
        ys = [RNG.randrange(p) for _ in range(n)] + [p - 1, 1, p - 1]
        # encode to Montgomery form on host
        ax = [(x * R) % p for x in xs]
        ay = [(y * R) % p for y in ys]
        a = jnp.asarray(limb.ints_to_limbs(ax, L))
        b = jnp.asarray(limb.ints_to_limbs(ay, L))
        pl = tuple(p_limbs)
        one_t = tuple(one_mont)
        prod = limb.limbs_to_ints(
            np.asarray(_jitted('mont_mul', L, (pl, n0inv))(a, b)))
        for i in range(len(xs)):
            assert int(prod[i]) == (xs[i] * ys[i] * R) % p, (L, i)
        # pow: a^e (montgomery in/out), static exponent
        for e in (0, 1, 3, 17, (p - 1) // 2):
            pw = limb.limbs_to_ints(np.asarray(
                _jitted(f'mont_pow_{e}', L, (pl, n0inv, one_t, e))(a)))
            for i in range(len(xs)):
                assert int(pw[i]) == (pow(xs[i], e, p) * R) % p, (L, e, i)
        # inverse
        inv = limb.limbs_to_ints(np.asarray(
            _jitted('mont_inv', L, (p, pl, n0inv, one_t))(a)))
        for i in range(len(xs)):
            if xs[i] == 0:
                assert int(inv[i]) == 0
            else:
                assert int(inv[i]) == (pow(xs[i], -1, p) * R) % p


def test_reduce_wide():
    for L, p in PRIMES.items():
        R, n0inv, p_limbs = _mont_consts(p, L)
        n_chunks = 3
        n = 64
        vals = [RNG.randrange(1 << (32 * L * n_chunks)) for _ in range(n)]
        chunks = []
        radix = []
        for c in range(n_chunks):
            chunk_ints = [(v >> (32 * L * c)) & ((1 << (32 * L)) - 1)
                          for v in vals]
            chunks.append(limb.unstack(
                jnp.asarray(limb.ints_to_limbs(chunk_ints, L)), L))
            const = (pow(2, 32 * L * c, p) * R * R) % p
            radix.append([np.uint32((const >> (32 * i)) & 0xFFFFFFFF)
                          for i in range(L)])
        red = limb.limbs_to_ints(np.asarray(limb.stack(
            limb.reduce_wide(chunks, radix, p_limbs, n0inv))))
        for i in range(n):
            # result is in Montgomery form
            assert int(red[i]) == (vals[i] % p) * R % p


def test_matmul_mxu_exact():
    # MXU nibble-plane modular matmul (K >= 32 path) vs object math
    import numpy as np
    from mpyc_tpu import finfields
    rng = np.random.default_rng(7)
    for p in [finfields.find_prime_root(64)[0], (1 << 127) - 1]:
        F = finfields.GF(p)
        for (M, K, N) in [(5, 64, 7), (3, 100, 3), (2, 257, 2)]:
            a = rng.integers(0, 1 << 62, (M, K)).astype(object) % p
            b = rng.integers(0, 1 << 62, (K, N)).astype(object) % p
            C = (F.array(a) @ F.array(b))._decode()
            assert (C == (a @ b) % p).all(), (p, M, K, N)
