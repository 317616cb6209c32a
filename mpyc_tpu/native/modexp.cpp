// Batched Montgomery modular exponentiation for the host protocol plane.
//
// The scalar/per-party plane has no GMP in this environment; CPython's
// pow(x, e, p) costs ~27 us per 87-bit exponentiation and dominates
// np_random_bits (one inverse square root per bit) and unit_vector/mod
// across the demo suite.  This kernel does the same work in ~1-2 us per
// element: 64-bit-limb CIOS Montgomery multiplication with __int128
// accumulators, shared single-exponent square-and-multiply over a batch.
//
// Layout: values are little-endian u64 limb vectors, L limbs (L <= 8,
// i.e. p < 2^512); exponent is its own limb vector.  All values < p.
//
// Build: g++ -O2 -shared -fPIC -std=c++17 -o libmpyc_tpu_modexp.so modexp.cpp
// (done on demand by mpyc_tpu/ops/native_modexp.py, like the transport).

#include <cstdint>
#include <cstring>

namespace {

constexpr int MAXL = 8;

typedef unsigned __int128 u128;

struct Ctx {
    int L;
    uint64_t p[MAXL];
    uint64_t n0inv;       // -p^{-1} mod 2^64
    uint64_t r2[MAXL];    // R^2 mod p, R = 2^(64 L)
    uint64_t one[MAXL];   // R mod p (Montgomery 1)
};

inline int cmp_ge(const uint64_t* a, const uint64_t* b, int L) {
    for (int i = L - 1; i >= 0; --i) {
        if (a[i] != b[i]) return a[i] > b[i];
    }
    return 1;  // equal counts as >=
}

inline void sub_p(uint64_t* a, const uint64_t* p, int L) {
    unsigned char borrow = 0;
    for (int i = 0; i < L; ++i) {
        u128 d = (u128)a[i] - p[i] - borrow;
        a[i] = (uint64_t)d;
        borrow = (d >> 64) ? 1 : 0;   // wrapped
    }
}

// a <- a*2 mod p
inline void dbl_mod(uint64_t* a, const uint64_t* p, int L) {
    uint64_t carry = 0;
    for (int i = 0; i < L; ++i) {
        uint64_t hi = a[i] >> 63;
        a[i] = (a[i] << 1) | carry;
        carry = hi;
    }
    if (carry || cmp_ge(a, p, L)) sub_p(a, p, L);
}

// CIOS Montgomery multiply: out = a * b * R^-1 mod p
inline void mont_mul(uint64_t* out, const uint64_t* a, const uint64_t* b,
                     const Ctx& c) {
    const int L = c.L;
    uint64_t t[MAXL + 2];
    std::memset(t, 0, sizeof(uint64_t) * (L + 2));
    for (int i = 0; i < L; ++i) {
        // t += a[i] * b
        u128 carry = 0;
        for (int j = 0; j < L; ++j) {
            u128 cur = (u128)a[i] * b[j] + t[j] + (uint64_t)carry;
            t[j] = (uint64_t)cur;
            carry = cur >> 64;
        }
        u128 cur = (u128)t[L] + (uint64_t)carry;
        t[L] = (uint64_t)cur;
        t[L + 1] = (uint64_t)(cur >> 64);
        // m = t[0] * n0inv mod 2^64;  t += m * p;  t >>= 64
        uint64_t m = t[0] * c.n0inv;
        carry = ((u128)m * c.p[0] + t[0]) >> 64;
        for (int j = 1; j < L; ++j) {
            u128 cur2 = (u128)m * c.p[j] + t[j] + (uint64_t)carry;
            t[j - 1] = (uint64_t)cur2;
            carry = cur2 >> 64;
        }
        u128 cur3 = (u128)t[L] + (uint64_t)carry;
        t[L - 1] = (uint64_t)cur3;
        t[L] = t[L + 1] + (uint64_t)(cur3 >> 64);
        t[L + 1] = 0;
    }
    if (t[L] || cmp_ge(t, c.p, L)) sub_p(t, c.p, L);
    std::memcpy(out, t, sizeof(uint64_t) * L);
}

void ctx_init(Ctx& c, const uint64_t* p, int L) {
    c.L = L;
    std::memcpy(c.p, p, sizeof(uint64_t) * L);
    // n0inv = -p[0]^-1 mod 2^64 (Newton iteration)
    uint64_t inv = p[0];              // p odd: 3-bit correct start
    for (int i = 0; i < 6; ++i) inv *= 2 - p[0] * inv;
    c.n0inv = ~inv + 1;               // negate
    // one = R mod p via 64L doublings of 1; r2 = 2^(128L) mod p
    uint64_t acc[MAXL];
    std::memset(acc, 0, sizeof(acc));
    acc[0] = 1;
    for (int i = 0; i < 64 * L; ++i) dbl_mod(acc, p, L);
    std::memcpy(c.one, acc, sizeof(uint64_t) * L);
    for (int i = 0; i < 64 * L; ++i) dbl_mod(acc, p, L);
    std::memcpy(c.r2, acc, sizeof(uint64_t) * L);
}

}  // namespace

extern "C" {

// xs, out: n * L u64 (little-endian limb vectors, values < p)
// e: Le u64 limbs (e > 0); p: L u64 limbs, odd, L <= 8
// mont_io != 0: inputs/outputs are already in Montgomery form.
// Returns 0 on success.
int bm_powmod(const uint64_t* xs, long long n, int L,
              const uint64_t* e, int Le,
              const uint64_t* p, uint64_t* out, int mont_io) {
    if (L < 1 || L > MAXL || !(p[0] & 1)) return -1;
    Ctx c;
    ctx_init(c, p, L);
    // exponent bits, MSB first (skip leading zero limbs)
    int top = Le - 1;
    while (top > 0 && e[top] == 0) --top;
    if (top == 0 && e[0] == 0) return -2;  // e == 0 unsupported
    int msb = 63;
    while (msb > 0 && !((e[top] >> msb) & 1)) --msb;

    for (long long i = 0; i < n; ++i) {
        const uint64_t* x = xs + i * L;
        uint64_t xm[MAXL], acc[MAXL];
        if (mont_io) {
            std::memcpy(xm, x, sizeof(uint64_t) * L);
        } else {
            mont_mul(xm, x, c.r2, c);     // to Montgomery form
        }
        std::memcpy(acc, xm, sizeof(uint64_t) * L);
        int started = 1;
        for (int limb = top; limb >= 0; --limb) {
            for (int bit = (limb == top ? msb - 1 : 63); bit >= 0; --bit) {
                (void)started;
                mont_mul(acc, acc, acc, c);
                if ((e[limb] >> bit) & 1) mont_mul(acc, acc, xm, c);
            }
        }
        if (mont_io) {
            std::memcpy(out + i * L, acc, sizeof(uint64_t) * L);
        } else {
            uint64_t onev[MAXL];
            std::memset(onev, 0, sizeof(onev));
            onev[0] = 1;
            mont_mul(out + i * L, acc, onev, c);  // from Montgomery form
        }
    }
    return 0;
}

}  // extern "C"
