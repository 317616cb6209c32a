// Batched host-plane GF(p) kernels for p < 2^64 (Montgomery arithmetic).
//
// The per-party deployment plane (3+ mutually-distrusting processes
// exchanging shares over TCP, reference mpyc/runtime.py:5156-5193) cannot
// use the TPU co-located kernels: each party holds only its own share
// vector and the round structure is (local kernel -> wire -> local
// kernel).  The reference's local kernels are GMP bignum loops; ours are
// these C batch kernels over uint64 Montgomery residues — the host-side
// twin of ops/limb.py's uint32-limb device kernels (same Montgomery
// radix R = 2^(32*L), so values interop with the (...,L) uint32 limb
// representation by memory view).
//
// All kernels are single-threaded by design: localhost deployments run m
// party processes on one host, so the cores are already busy m-way.
//
// Conventions:
//   l32 in {1, 2}: number of 32-bit limbs of p;  R = 2^(32*l32).
//   n0: -p^-1 mod R (low 64 bits; for l32 == 1 only low 32 bits used).
//   Montgomery residue of x is x*R mod p, stored in one uint64.
//   Wire format: plain (non-Montgomery) values, little-endian, bl bytes
//   each (matches finfields to_bytes / the reference's asyncoro framing
//   payloads, reference finfields.py:91-102).

#include <cstdint>
#include <cstring>

typedef uint64_t u64;
typedef unsigned __int128 u128;

static inline u64 redc(u128 t, u64 p, u64 n0, int l32) {
    if (l32 == 1) {
        // R = 2^32: one 32-bit REDC step
        uint32_t m = (uint32_t)t * (uint32_t)n0;
        u128 s = t + (u128)m * p;
        u64 r = (u64)(s >> 32);
        return r >= p ? r - p : r;
    }
    // R = 2^64
    u64 tlo = (u64)t, thi = (u64)(t >> 64);
    u64 m = tlo * n0;
    u128 mp = (u128)m * p;
    u64 carry = ((u128)tlo + (u64)mp) >> 64;
    u128 r = (u128)thi + (u64)(mp >> 64) + carry;
    return r >= p ? (u64)(r - p) : (u64)r;
}

static inline u64 mont_mul(u64 a, u64 b, u64 p, u64 n0, int l32) {
    return redc((u128)a * b, p, n0, l32);
}

static inline u64 add_mod(u64 a, u64 b, u64 p) {
    // a, b < p < 2^64; a + b may wrap u64
    u128 s = (u128)a + b;
    return s >= p ? (u64)(s - p) : (u64)s;
}

static inline u64 sub_mod(u64 a, u64 b, u64 p) {
    return a >= b ? a - b : a + (p - b);
}

extern "C" {

int hf_mul(const u64* a, const u64* b, u64* out, long long n,
           u64 p, u64 n0, int l32) {
    for (long long i = 0; i < n; i++)
        out[i] = mont_mul(a[i], b[i], p, n0, l32);
    return 0;
}

int hf_add(const u64* a, const u64* b, u64* out, long long n, u64 p) {
    for (long long i = 0; i < n; i++) out[i] = add_mod(a[i], b[i], p);
    return 0;
}

int hf_sub(const u64* a, const u64* b, u64* out, long long n, u64 p) {
    for (long long i = 0; i < n; i++) out[i] = sub_mod(a[i], b[i], p);
    return 0;
}

int hf_neg(const u64* a, u64* out, long long n, u64 p) {
    for (long long i = 0; i < n; i++) out[i] = a[i] ? p - a[i] : 0;
    return 0;
}

// out[i] = a[i] * c (c a Montgomery residue)
int hf_mulc(const u64* a, u64 c, u64* out, long long n,
            u64 p, u64 n0, int l32) {
    for (long long i = 0; i < n; i++)
        out[i] = mont_mul(a[i], c, p, n0, l32);
    return 0;
}

// Shamir split, all m party rows fused (reference thresha.py:23-44):
// rows[(i-1)*n + h] = Horner_{k}(coefs[k*n+h]; x=i) + sec[h], i = 1..m.
// imont[i-1] = Montgomery residue of (i).  t >= 1.
int hf_split(const u64* sec, const u64* coefs, const u64* imont,
             u64* rows, long long n, int t, int m,
             u64 p, u64 n0, int l32) {
    for (int i = 0; i < m; i++) {
        u64 im = imont[i];
        u64* row = rows + (long long)i * n;
        for (long long h = 0; h < n; h++) {
            u64 y = coefs[h];
            for (int k = 1; k < t; k++)
                y = add_mod(mont_mul(y, im, p, n0, l32),
                            coefs[(long long)k * n + h], p);
            row[h] = add_mod(mont_mul(y, im, p, n0, l32), sec[h], p);
        }
    }
    return 0;
}

// Montgomery residues -> wire bytes (plain values, LE, bl bytes each).
int hf_to_wire(const u64* a, unsigned char* out, long long n, int bl,
               u64 p, u64 n0, int l32) {
    for (long long i = 0; i < n; i++) {
        u64 v = redc((u128)a[i], p, n0, l32);  // mont -> plain
        unsigned char* o = out + (long long)i * bl;
        if (bl == 8) {
            memcpy(o, &v, 8);  // little-endian host
        } else {
            for (int j = 0; j < bl; j++) o[j] = (unsigned char)(v >> (8 * j));
        }
    }
    return 0;
}

// Wire bytes -> Montgomery residues (r2 = R^2 mod p).
int hf_from_wire(const unsigned char* in, u64* out, long long n, int bl,
                 u64 p, u64 n0, u64 r2, int l32) {
    for (long long i = 0; i < n; i++) {
        const unsigned char* s = in + (long long)i * bl;
        u64 v = 0;
        if (bl == 8) {
            memcpy(&v, s, 8);
        } else {
            for (int j = bl - 1; j >= 0; j--) v = (v << 8) | s[j];
        }
        if (v >= p) v %= p;  // defensive: wire values should be < p
        out[i] = mont_mul(v, r2, p, n0, l32);
    }
    return 0;
}

// acc[i] += row[i] * c  (row, c, acc all Montgomery residues)
int hf_axpy(u64* acc, const u64* row, u64 c, long long n,
            u64 p, u64 n0, int l32) {
    for (long long i = 0; i < n; i++)
        acc[i] = add_mod(acc[i], mont_mul(row[i], c, p, n0, l32), p);
    return 0;
}

// acc[i] += wire_row[i] * c, reading the row straight off the wire:
// cr2 = c * R^2 mod p, so montmul(plain, cr2) = mont(plain * c) — the
// from-wire conversion is free.
int hf_axpy_wire(u64* acc, const unsigned char* in, u64 cr2, long long n,
                 int bl, u64 p, u64 n0, int l32) {
    for (long long i = 0; i < n; i++) {
        const unsigned char* s = in + (long long)i * bl;
        u64 v = 0;
        if (bl == 8) {
            memcpy(&v, s, 8);
        } else {
            for (int j = bl - 1; j >= 0; j--) v = (v << 8) | s[j];
        }
        if (v >= p) v %= p;
        acc[i] = add_mod(acc[i], mont_mul(v, cr2, p, n0, l32), p);
    }
    return 0;
}

// SHAKE stream -> uniform Montgomery residues: l little-endian bytes per
// value (l <= 16; l >= bytes(p) + 8 keeps statistical distance < 2^-64),
// reduced mod p, lifted into the Montgomery domain via r2.
int hf_stream_mont(const unsigned char* stream, u64* out, long long n,
                   int l, u64 p, u64 n0, u64 r2, int l32) {
    if (l > 16) return 1;
    for (long long i = 0; i < n; i++) {
        const unsigned char* s = stream + (long long)i * l;
        u128 v = 0;
        for (int j = l - 1; j >= 0; j--) v = (v << 8) | s[j];
        u64 r = (u64)(v % p);
        out[i] = mont_mul(r, r2, p, n0, l32);
    }
    return 0;
}

// ---------------------------------------------------------------------------
// ChaCha20 keystream (RFC 8439 block function, counter mode).  Used for
// party-private randomness (Shamir coefficients): any CSPRNG works there —
// the cross-party-deterministic PRSS streams stay on SHAKE128 (Keccak
// kernels / hashlib).  Scalar C runs ~1.5 GB/s, ~4x hashlib's SHAKE.
// ---------------------------------------------------------------------------

static inline uint32_t rotl32(uint32_t x, int c) {
    return (x << c) | (x >> (32 - c));
}

#define QR(a, b, c, d)                                        \
    a += b; d ^= a; d = rotl32(d, 16);                        \
    c += d; b ^= c; b = rotl32(b, 12);                        \
    a += b; d ^= a; d = rotl32(d, 8);                         \
    c += d; b ^= c; b = rotl32(b, 7);

static void chacha20_block(const uint32_t key[8], uint32_t counter,
                           const uint32_t nonce[3], unsigned char out[64]) {
    uint32_t s[16] = {
        0x61707865u, 0x3320646eu, 0x79622d32u, 0x6b206574u,
        key[0], key[1], key[2], key[3], key[4], key[5], key[6], key[7],
        counter, nonce[0], nonce[1], nonce[2]};
    uint32_t x[16];
    memcpy(x, s, sizeof(x));
    for (int i = 0; i < 10; i++) {
        QR(x[0], x[4], x[8], x[12]) QR(x[1], x[5], x[9], x[13])
        QR(x[2], x[6], x[10], x[14]) QR(x[3], x[7], x[11], x[15])
        QR(x[0], x[5], x[10], x[15]) QR(x[1], x[6], x[11], x[12])
        QR(x[2], x[7], x[8], x[13]) QR(x[3], x[4], x[9], x[14])
    }
    for (int i = 0; i < 16; i++) {
        uint32_t v = x[i] + s[i];
        memcpy(out + 4 * i, &v, 4);
    }
}

// Lane-parallel block batch: W independent counter blocks computed in
// parallel over plain arrays — gcc auto-vectorizes the quarter-round
// loops (AVX2: 8 lanes per op), ~4x the scalar block function.
#define LANES 8

#define QRV(a, b, c, d)                                                  \
    for (int w = 0; w < LANES; w++) { a[w] += b[w]; d[w] ^= a[w];        \
        d[w] = rotl32(d[w], 16); }                                       \
    for (int w = 0; w < LANES; w++) { c[w] += d[w]; b[w] ^= c[w];        \
        b[w] = rotl32(b[w], 12); }                                       \
    for (int w = 0; w < LANES; w++) { a[w] += b[w]; d[w] ^= a[w];        \
        d[w] = rotl32(d[w], 8); }                                        \
    for (int w = 0; w < LANES; w++) { c[w] += d[w]; b[w] ^= c[w];        \
        b[w] = rotl32(b[w], 7); }

static void chacha20_blocks8(const uint32_t key[8], uint32_t counter0,
                             const uint32_t nonce[3],
                             unsigned char out[64 * LANES]) {
    uint32_t s[16];
    s[0] = 0x61707865u; s[1] = 0x3320646eu;
    s[2] = 0x79622d32u; s[3] = 0x6b206574u;
    for (int i = 0; i < 8; i++) s[4 + i] = key[i];
    s[12] = counter0;
    s[13] = nonce[0]; s[14] = nonce[1]; s[15] = nonce[2];
    uint32_t x[16][LANES];
    for (int i = 0; i < 16; i++)
        for (int w = 0; w < LANES; w++)
            x[i][w] = (i == 12) ? counter0 + (uint32_t)w : s[i];
    for (int r = 0; r < 10; r++) {
        QRV(x[0], x[4], x[8], x[12]) QRV(x[1], x[5], x[9], x[13])
        QRV(x[2], x[6], x[10], x[14]) QRV(x[3], x[7], x[11], x[15])
        QRV(x[0], x[5], x[10], x[15]) QRV(x[1], x[6], x[11], x[12])
        QRV(x[2], x[7], x[8], x[13]) QRV(x[3], x[4], x[9], x[14])
    }
    for (int w = 0; w < LANES; w++)
        for (int i = 0; i < 16; i++) {
            uint32_t v = x[i][w] + ((i == 12) ? counter0 + (uint32_t)w
                                              : s[i]);
            memcpy(out + 64 * w + 4 * i, &v, 4);
        }
}

extern "C" int hf_chacha_stream(const unsigned char key[32],
                                const unsigned char nonce12[12],
                                unsigned char* out, long long nbytes) {
    uint32_t k[8], nc[3];
    memcpy(k, key, 32);
    memcpy(nc, nonce12, 12);
    uint32_t ctr = 0;
    long long off = 0;
    while (off + 64 * LANES <= nbytes) {
        chacha20_blocks8(k, ctr, nc, out + off);
        ctr += LANES;
        off += 64 * LANES;
    }
    while (off + 64 <= nbytes) {
        chacha20_block(k, ctr++, nc, out + off);
        off += 64;
    }
    if (off < nbytes) {
        unsigned char blk[64];
        chacha20_block(k, ctr, nc, blk);
        memcpy(out + off, blk, nbytes - off);
    }
    return 0;
}

// Stream bytes -> field residues mont(v), division-free: each element
// consumes l = k * 4 * l32 bytes interpreted as k little-endian R-radix
// digits d_i, and mont(v) = sum_i d_i * R^(i+1) = sum_i montmul(d_i,
// rpow[i]) with rpow[i] = R^(i+2) mod p precomputed by the caller.
// montmul's precondition holds (d_i < R, rpow[i] < p => t < p*R), so
// each digit costs one montmul + one modular add.  Bias of v mod p is
// <= p / 2^(8l): k = 2 at l32 = 2 and k = 3 at l32 = 1 keep it < 2^-64.
extern "C" int hf_stream_uniform(const unsigned char* stream, u64* out,
                                 long long n, int l, u64 p, u64 n0,
                                 const u64* rpow, int l32) {
    int dig = 4 * l32;           // digit width in bytes
    if (l % dig != 0 || l > 24) return 1;
    int k = l / dig;
    for (long long i = 0; i < n; i++) {
        const unsigned char* s = stream + (long long)i * l;
        u64 acc = 0;
        for (int d = 0; d < k; d++) {
            u64 digit = 0;
            memcpy(&digit, s + d * dig, dig);  // LE load of 4 or 8 bytes
            acc = add_mod(acc, mont_mul(digit, rpow[d], p, n0, l32), p);
        }
        out[i] = acc;
    }
    return 0;
}

// Montgomery residues -> plain values (ints in [0, p)).
int hf_to_plain(const u64* a, u64* out, long long n,
                u64 p, u64 n0, int l32) {
    for (long long i = 0; i < n; i++)
        out[i] = redc((u128)a[i], p, n0, l32);
    return 0;
}

// Plain values (< 2^64, any) -> Montgomery residues.
int hf_from_plain(const u64* a, u64* out, long long n,
                  u64 p, u64 n0, u64 r2, int l32) {
    for (long long i = 0; i < n; i++) {
        u64 v = a[i];
        if (v >= p) v %= p;
        out[i] = mont_mul(v, r2, p, n0, l32);
    }
    return 0;
}

}  // extern "C"
