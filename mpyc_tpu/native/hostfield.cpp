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

// ---------------------------------------------------------------------------
// Fused protocol rounds: one library call per reshare half, so the
// Python-side per-round overhead (ctypes argument marshaling, small
// ndarray churn) stays O(1) instead of O(#kernels).  The send half draws
// the ChaCha coefficient stream, Horner-splits, and writes peer rows as
// wire bytes in a single pass; the receive half folds own row + wire
// rows into the Lagrange combination in one pass.
// ---------------------------------------------------------------------------

#include <cstdlib>

extern "C" int hf_reshare_send(
        const u64* sec, long long n, int t, int m, int pid,
        const unsigned char* key32, const unsigned char* nonce12,
        const u64* imont,        // mont(i) for i = 1..m
        const u64* rpow,         // R-powers for the stream fold (kdig)
        int ldig, int kdig,      // stream bytes per coef, digits per coef
        int bl,                  // wire bytes per value
        u64* own_row,            // (n,) mont: this party's row
        unsigned char* wire,     // (m, n, bl): peer rows as plain bytes
        u64 p, u64 n0, int l32) {
    long long nc = (long long)t * n;
    unsigned char* stream =
        (unsigned char*)malloc((size_t)(nc * ldig > 0 ? nc * ldig : 1));
    u64* coefs = (u64*)malloc((size_t)(nc > 0 ? nc * 8 : 8));
    if (!stream || !coefs) { free(stream); free(coefs); return 2; }
    hf_chacha_stream(key32, nonce12, stream, nc * ldig);
    int rc = hf_stream_uniform(stream, coefs, nc, ldig, p, n0, rpow, l32);
    free(stream);
    if (rc) { free(coefs); return rc; }
    for (int i = 0; i < m; i++) {
        u64 im = imont[i];
        unsigned char* wrow = wire + (long long)i * n * bl;
        for (long long h = 0; h < n; h++) {
            u64 y = coefs[h];
            for (int k = 1; k < t; k++)
                y = add_mod(mont_mul(y, im, p, n0, l32),
                            coefs[(long long)k * n + h], p);
            y = add_mod(mont_mul(y, im, p, n0, l32), sec[h], p);
            if (i == pid) {
                own_row[h] = y;
            } else {
                u64 v = redc((u128)y, p, n0, l32);  // plain wire value
                unsigned char* o = wrow + h * bl;
                if (bl == 8) memcpy(o, &v, 8);
                else for (int j = 0; j < bl; j++)
                    o[j] = (unsigned char)(v >> (8 * j));
            }
        }
    }
    free(coefs);
    return 0;
}

extern "C" int hf_recombine_rows(
        const u64* own_row,      // may be NULL
        u64 own_cmont,           // mont(lagrange c) for own row
        const unsigned char* const* wires,  // nw wire rows (plain bytes)
        const u64* wire_cr2,     // c_j * R^2 mod p per wire row
        int nw, u64* out, long long n, int bl,
        u64 p, u64 n0, int l32) {
    if (own_row) {
        for (long long h = 0; h < n; h++)
            out[h] = mont_mul(own_row[h], own_cmont, p, n0, l32);
    } else {
        memset(out, 0, (size_t)n * 8);
    }
    for (int w = 0; w < nw; w++) {
        const unsigned char* in = wires[w];
        u64 cr2 = wire_cr2[w];
        for (long long h = 0; h < n; h++) {
            const unsigned char* s = in + h * bl;
            u64 v = 0;
            if (bl == 8) memcpy(&v, s, 8);
            else for (int j = bl - 1; j >= 0; j--) v = (v << 8) | s[j];
            if (v >= p) v %= p;
            out[h] = add_mod(out[h], mont_mul(v, cr2, p, n0, l32), p);
        }
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

// ---------------------------------------------------------------------------
// Keccak-f[1600] counter-mode squeeze: the host twin of the batched
// SHAKE128 block kernels (ops/keccak.py shake128_ctr_blocks).  Takes the
// pre-absorbed single-block state, XORs the instance counter into one
// lane, permutes, and emits the 168-byte rate block — bit-exact with
// hashlib's shake_128(prefix || pad || ctr).
// ---------------------------------------------------------------------------

namespace {

const uint64_t KC_RC[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

inline uint64_t rotl64(uint64_t x, int c) {
    return c ? (x << c) | (x >> (64 - c)) : x;
}

void keccak_f(uint64_t a[25]) {
    static const int RHO[25] = {0, 1, 62, 28, 27, 36, 44, 6, 55, 20,
                                3, 10, 43, 25, 39, 41, 45, 15, 21, 8,
                                18, 2, 61, 56, 14};
    for (int rnd = 0; rnd < 24; rnd++) {
        uint64_t c[5], d[5];
        for (int x = 0; x < 5; x++)
            c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
        for (int x = 0; x < 5; x++)
            d[x] = c[(x + 4) % 5] ^ rotl64(c[(x + 1) % 5], 1);
        for (int y = 0; y < 25; y += 5)
            for (int x = 0; x < 5; x++)
                a[y + x] ^= d[x];
        uint64_t b[25];
        for (int y = 0; y < 5; y++)
            for (int x = 0; x < 5; x++) {
                // pi: b[y, 2x+3y] = rot(a[x, y])
                int src = 5 * y + x;
                int dst = 5 * ((2 * x + 3 * y) % 5) + y;
                b[dst] = rotl64(a[src], RHO[src]);
            }
        for (int y = 0; y < 25; y += 5) {
            uint64_t t0 = b[y], t1 = b[y + 1];
            for (int x = 0; x < 5; x++) {
                uint64_t bx1 = (x < 4) ? b[y + x + 1] : t0;
                uint64_t bx2 = (x < 3) ? b[y + x + 2] : (x == 3 ? t0 : t1);
                a[y + x] = b[y + x] ^ ((~bx1) & bx2);
            }
        }
        a[0] ^= KC_RC[rnd];
    }
}

}  // namespace

extern "C" int hf_keccak_ctr(const uint64_t* lanes25, int ctr_lane,
                             long long n, uint32_t* out /* n * 42 */) {
    for (long long j = 0; j < n; j++) {
        uint64_t a[25];
        memcpy(a, lanes25, 200);
        a[ctr_lane] ^= (uint64_t)j;
        keccak_f(a);
        memcpy(out + j * 42, a, 168);
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Generic-width kernels: L 32-bit limbs per value (L up to 16 = 512-bit
// fields), R = 2^(32L) — the SAME Montgomery radix as the uint32-limb
// device representation, so values interoperate by memory layout.  CIOS
// Montgomery multiplication with 32-bit words (Koc et al.).  These serve
// fields beyond 64 bits (SecFxp 68/80-bit, SecInt(64) 96-bit, curve and
// multilateration fields); L <= 2 keeps the faster u64 kernels above.
// ---------------------------------------------------------------------------

#define HFG_MAXL 16

namespace {

struct GCtx {
    const uint32_t* p;
    uint32_t n0;
    int L;
};

inline void g_mont_mul(const GCtx& g, const uint32_t* a, const uint32_t* b,
                       uint32_t* out) {
    int L = g.L;
    const uint32_t* p = g.p;
    uint32_t t[HFG_MAXL + 2];
    memset(t, 0, (size_t)(L + 2) * 4);
    for (int i = 0; i < L; i++) {
        uint64_t ai = a[i], c = 0;
        for (int j = 0; j < L; j++) {
            uint64_t s = (uint64_t)t[j] + ai * b[j] + c;
            t[j] = (uint32_t)s;
            c = s >> 32;
        }
        uint64_t s = (uint64_t)t[L] + c;
        t[L] = (uint32_t)s;
        t[L + 1] = (uint32_t)(s >> 32);
        uint64_t mlo = (uint32_t)(t[0] * g.n0);
        c = ((uint64_t)t[0] + mlo * p[0]) >> 32;
        for (int j = 1; j < L; j++) {
            uint64_t s2 = (uint64_t)t[j] + mlo * p[j] + c;
            t[j - 1] = (uint32_t)s2;
            c = s2 >> 32;
        }
        s = (uint64_t)t[L] + c;
        t[L - 1] = (uint32_t)s;
        t[L] = t[L + 1] + (uint32_t)(s >> 32);
        t[L + 1] = 0;
    }
    // conditional subtract: t[0..L] (t[L] in {0,1}) vs p
    bool ge = t[L] != 0;
    if (!ge) {
        ge = true;
        for (int j = L - 1; j >= 0; j--) {
            if (t[j] != p[j]) { ge = t[j] > p[j]; break; }
        }
    }
    if (ge) {
        uint64_t borrow = 0;
        for (int j = 0; j < L; j++) {
            uint64_t d = (uint64_t)t[j] - p[j] - borrow;
            out[j] = (uint32_t)d;
            borrow = (d >> 32) & 1;
        }
    } else {
        memcpy(out, t, (size_t)L * 4);
    }
}

inline void g_add_mod(const GCtx& g, const uint32_t* a, const uint32_t* b,
                      uint32_t* out) {
    int L = g.L;
    const uint32_t* p = g.p;
    uint64_t c = 0;
    uint32_t t[HFG_MAXL];
    for (int j = 0; j < L; j++) {
        uint64_t s = (uint64_t)a[j] + b[j] + c;
        t[j] = (uint32_t)s;
        c = s >> 32;
    }
    bool ge = c != 0;
    if (!ge) {
        ge = true;
        for (int j = L - 1; j >= 0; j--) {
            if (t[j] != p[j]) { ge = t[j] > p[j]; break; }
        }
    }
    if (ge) {
        uint64_t borrow = 0;
        for (int j = 0; j < L; j++) {
            uint64_t d = (uint64_t)t[j] - p[j] - borrow;
            out[j] = (uint32_t)d;
            borrow = (d >> 32) & 1;
        }
    } else {
        memcpy(out, t, (size_t)L * 4);
    }
}

inline void g_sub_mod(const GCtx& g, const uint32_t* a, const uint32_t* b,
                      uint32_t* out) {
    int L = g.L;
    const uint32_t* p = g.p;
    uint64_t borrow = 0;
    uint32_t t[HFG_MAXL];
    for (int j = 0; j < L; j++) {
        uint64_t d = (uint64_t)a[j] - b[j] - borrow;
        t[j] = (uint32_t)d;
        borrow = (d >> 32) & 1;
    }
    if (borrow) {
        uint64_t c = 0;
        for (int j = 0; j < L; j++) {
            uint64_t s = (uint64_t)t[j] + p[j] + c;
            out[j] = (uint32_t)s;
            c = s >> 32;
        }
    } else {
        memcpy(out, t, (size_t)L * 4);
    }
}

inline bool g_is_zero(const uint32_t* a, int L) {
    for (int j = 0; j < L; j++)
        if (a[j]) return false;
    return true;
}

// plain value (< p) from a Montgomery residue: montmul by 1
inline void g_to_plain(const GCtx& g, const uint32_t* a, uint32_t* out) {
    uint32_t one[HFG_MAXL] = {1};
    g_mont_mul(g, a, one, out);
}

inline void g_store_wire(const uint32_t* v, unsigned char* o, int bl) {
    int full = bl / 4;
    memcpy(o, v, (size_t)full * 4);
    for (int j = full * 4; j < bl; j++)
        o[j] = (unsigned char)(v[j / 4] >> (8 * (j % 4)));
}

inline void g_load_wire(const unsigned char* s, uint32_t* v, int bl, int L) {
    memset(v, 0, (size_t)L * 4);
    int full = bl / 4;
    memcpy(v, s, (size_t)full * 4);
    for (int j = full * 4; j < bl; j++)
        v[j / 4] |= (uint32_t)s[j] << (8 * (j % 4));
}

}  // namespace

extern "C" {

int hfg_mul(const uint32_t* a, const uint32_t* b, uint32_t* out,
            long long n, const uint32_t* p, uint32_t n0, int L) {
    if (L > HFG_MAXL) return 1;
    GCtx g{p, n0, L};
    for (long long i = 0; i < n; i++)
        g_mont_mul(g, a + i * L, b + i * L, out + i * L);
    return 0;
}

int hfg_add(const uint32_t* a, const uint32_t* b, uint32_t* out,
            long long n, const uint32_t* p, uint32_t n0, int L) {
    if (L > HFG_MAXL) return 1;
    GCtx g{p, n0, L};
    for (long long i = 0; i < n; i++)
        g_add_mod(g, a + i * L, b + i * L, out + i * L);
    return 0;
}

int hfg_sub(const uint32_t* a, const uint32_t* b, uint32_t* out,
            long long n, const uint32_t* p, uint32_t n0, int L) {
    if (L > HFG_MAXL) return 1;
    GCtx g{p, n0, L};
    for (long long i = 0; i < n; i++)
        g_sub_mod(g, a + i * L, b + i * L, out + i * L);
    return 0;
}

int hfg_neg(const uint32_t* a, uint32_t* out, long long n,
            const uint32_t* p, uint32_t n0, int L) {
    if (L > HFG_MAXL) return 1;
    GCtx g{p, n0, L};
    uint32_t zero[HFG_MAXL] = {0};
    for (long long i = 0; i < n; i++) {
        if (g_is_zero(a + i * L, L))
            memset(out + i * L, 0, (size_t)L * 4);
        else
            g_sub_mod(g, zero, a + i * L, out + i * L);
    }
    return 0;
}

int hfg_mulc(const uint32_t* a, const uint32_t* c, uint32_t* out,
             long long n, const uint32_t* p, uint32_t n0, int L) {
    if (L > HFG_MAXL) return 1;
    GCtx g{p, n0, L};
    for (long long i = 0; i < n; i++)
        g_mont_mul(g, a + i * L, c, out + i * L);
    return 0;
}

int hfg_to_wire(const uint32_t* a, unsigned char* out, long long n, int bl,
                const uint32_t* p, uint32_t n0, int L) {
    if (L > HFG_MAXL) return 1;
    GCtx g{p, n0, L};
    uint32_t v[HFG_MAXL];
    for (long long i = 0; i < n; i++) {
        g_to_plain(g, a + i * L, v);
        g_store_wire(v, out + (long long)i * bl, bl);
    }
    return 0;
}

int hfg_from_wire(const unsigned char* in, uint32_t* out, long long n,
                  int bl, const uint32_t* p, uint32_t n0,
                  const uint32_t* r2, int L) {
    if (L > HFG_MAXL) return 1;
    GCtx g{p, n0, L};
    uint32_t v[HFG_MAXL];
    for (long long i = 0; i < n; i++) {
        g_load_wire(in + (long long)i * bl, v, bl, L);
        g_mont_mul(g, v, r2, out + i * L);
    }
    return 0;
}

// Stream fold: l bytes per element as l/4 32-bit digits d_w; out =
// mont(sum_w d_w 2^(32w)) = sum_w montmul(d_w, rpow2[w]) with
// rpow2[w] = 2^(32w) * R^2 mod p (L limbs each).  Bias < 2^-64 when
// l >= bytes(p) + 8.
int hfg_stream_uniform(const unsigned char* stream, uint32_t* out,
                       long long n, int l, const uint32_t* p, uint32_t n0,
                       const uint32_t* rpow2, int L) {
    if (L > HFG_MAXL || l % 4 != 0) return 1;
    GCtx g{p, n0, L};
    int k = l / 4;
    uint32_t d[HFG_MAXL] = {0};
    uint32_t term[HFG_MAXL];
    for (long long i = 0; i < n; i++) {
        const unsigned char* s = stream + (long long)i * l;
        uint32_t* o = out + i * L;
        memset(o, 0, (size_t)L * 4);
        for (int w = 0; w < k; w++) {
            memcpy(d, s + 4 * w, 4);
            g_mont_mul(g, d, rpow2 + (size_t)w * L, term);
            g_add_mod(g, o, term, o);
        }
    }
    return 0;
}

// SHAKE counter-block PRF fold: the host-plane PRSS convention
// (thresha.DevicePRF._host_mont_vals) reads l-byte little-endian chunks
// from RATE-byte blocks (block tails discarded: chunk j lives at offset
// (j / kper) * rate + (j %% kper) * l, kper = rate / l), optionally
// masks to mask_bits, reduces mod p and lifts to Montgomery.  This
// kernel reproduces those values exactly, division-free (digit fold
// against rpow2[w] = 2^(32w) * R^2 mod p, ceil(l/4) digits).
int hfg_prf_fold(const unsigned char* stream, uint32_t* out, long long n,
                 int l, int rate, int mask_bits,
                 const uint32_t* p, uint32_t n0, const uint32_t* rpow2,
                 int L) {
    if (L > HFG_MAXL || l <= 0 || rate < l) return 1;
    GCtx g{p, n0, L};
    int kper = rate / l;
    int k = (l + 3) / 4;
    uint32_t d[HFG_MAXL + 8] = {0};
    uint32_t term[HFG_MAXL];
    for (long long j = 0; j < n; j++) {
        const unsigned char* s =
            stream + (j / kper) * (long long)rate + (j % kper) * l;
        uint32_t* o = out + j * L;
        memset(o, 0, (size_t)L * 4);
        for (int w = 0; w < k; w++) {
            uint32_t digit = 0;
            int nb = l - 4 * w < 4 ? l - 4 * w : 4;
            memcpy(&digit, s + 4 * w, (size_t)nb);
            if (mask_bits >= 0) {
                int lo = 32 * w;
                if (mask_bits <= lo) digit = 0;
                else if (mask_bits - lo < 32)
                    digit &= (1u << (mask_bits - lo)) - 1u;
            }
            if (digit) {
                d[0] = digit;
                g_mont_mul(g, d, rpow2 + (size_t)w * L, term);
                g_add_mod(g, o, term, o);
            }
        }
    }
    return 0;
}

// Fused Toft-comparison bit algebra (reference runtime.py:3622-3693,
// the between-rounds local work of np_sgn): from the opened mask
// c (mont), the secret random bits rb (mont, {0,1}) and the sign bit
// s (mont, {-1,+1}), produce in ONE pass
//   E[i][j]   = s_i + rb_ij - c_ij + 3 * sum_{j'>j} xor_ij'   (j < l)
//   E[i][l]   = s_i - 1 + 3 * sum_j xor_ij
//   X1[i][j]  = 1 - xor_ij                (for the EQ/h_all product)
//   cl[i]     = mont(c_i mod 2^l)
// where xor_ij = c_ij XOR rb_ij is selected (no multiplies: c bits are
// public).  want_e / want_x1 gate the outputs (pass NULL when unused).
int hfg_sgn_prepare(const uint32_t* c, const uint32_t* rb,
                    const uint32_t* s, long long n, int l,
                    uint32_t* E, uint32_t* X1, uint32_t* cl,
                    const uint32_t* one_mont, const uint32_t* r2,
                    const uint32_t* p, uint32_t n0, int L) {
    if (L > HFG_MAXL || l > 64) return 1;
    GCtx g{p, n0, L};
    uint32_t v[HFG_MAXL], xo[64][HFG_MAXL], suf[HFG_MAXL], t[HFG_MAXL];
    for (long long i = 0; i < n; i++) {
        // public value of the mask, low l bits
        g_to_plain(g, c + i * L, v);
        uint64_t bits = (uint64_t)v[0] | ((uint64_t)(L > 1 ? v[1] : 0) << 32);
        if (cl) {
            uint64_t lowmask = l >= 64 ? ~0ull : ((1ull << l) - 1);
            uint64_t m_ = bits & lowmask;
            uint32_t pl[HFG_MAXL];
            memset(pl, 0, (size_t)L * 4);
            pl[0] = (uint32_t)m_;
            if (L > 1) pl[1] = (uint32_t)(m_ >> 32);
            g_mont_mul(g, pl, r2, cl + i * L);
        }
        // xor_ij = c_ij ? 1 - rb_ij : rb_ij
        for (int j = 0; j < l; j++) {
            const uint32_t* rbij = rb + (i * l + j) * L;
            if ((bits >> j) & 1)
                g_sub_mod(g, one_mont, rbij, xo[j]);
            else
                memcpy(xo[j], rbij, (size_t)L * 4);
        }
        if (X1) {
            for (int j = 0; j < l; j++)
                g_sub_mod(g, one_mont, xo[j], X1 + (i * l + j) * L);
        }
        if (E) {
            // suffix sums from the top, emit E[j] = s + rb_j - c_j + 3*suf
            memset(suf, 0, (size_t)L * 4);
            // E[l] = s - 1 + 3 * total  (total = sum of all xor)
            uint32_t total[HFG_MAXL];
            memset(total, 0, (size_t)L * 4);
            for (int j = 0; j < l; j++)
                g_add_mod(g, total, xo[j], total);
            g_add_mod(g, total, total, t);          // 2*total
            g_add_mod(g, t, total, t);              // 3*total
            uint32_t* el = E + (i * (l + 1) + l) * L;
            g_sub_mod(g, s + i * L, one_mont, el);
            g_add_mod(g, el, t, el);
            for (int j = l - 1; j >= 0; j--) {
                uint32_t* e = E + (i * (l + 1) + j) * L;
                g_add_mod(g, suf, suf, t);          // 2*suf
                g_add_mod(g, t, suf, t);            // 3*suf
                g_add_mod(g, s + i * L, rb + (i * l + j) * L, e);
                if ((bits >> j) & 1)
                    g_sub_mod(g, e, one_mont, e);
                g_add_mod(g, e, t, e);
                g_add_mod(g, suf, xo[j], suf);      // suffix for j-1
            }
        }
    }
    return 0;
}

// Fused GRR98 send half, generic width (cf. hf_reshare_send).
int hfg_reshare_send(
        const uint32_t* sec, long long n, int t, int m, int pid,
        const unsigned char* key32, const unsigned char* nonce12,
        const uint32_t* imont,   // (m, L): mont(i) for i = 1..m
        const uint32_t* rpow2,   // (l/4, L): stream fold constants
        int ldig, int bl,
        uint32_t* own_row,       // (n, L)
        unsigned char* wire,     // (m, n, bl)
        const uint32_t* p, uint32_t n0, int L) {
    if (L > HFG_MAXL || ldig % 4 != 0) return 1;
    GCtx g{p, n0, L};
    long long nc = (long long)t * n;
    unsigned char* stream =
        (unsigned char*)malloc((size_t)(nc * ldig > 0 ? nc * ldig : 1));
    uint32_t* coefs = (uint32_t*)malloc(
        (size_t)(nc > 0 ? nc * L * 4 : 4));
    if (!stream || !coefs) { free(stream); free(coefs); return 2; }
    hf_chacha_stream(key32, nonce12, stream, nc * ldig);
    int rc = hfg_stream_uniform(stream, coefs, nc, ldig, p, n0, rpow2, L);
    free(stream);
    if (rc) { free(coefs); return rc; }
    uint32_t y[HFG_MAXL], v[HFG_MAXL];
    for (int i = 0; i < m; i++) {
        const uint32_t* im = imont + (size_t)i * L;
        unsigned char* wrow = wire + (long long)i * n * bl;
        for (long long h = 0; h < n; h++) {
            memcpy(y, coefs + h * L, (size_t)L * 4);
            for (int k = 1; k < t; k++) {
                g_mont_mul(g, y, im, y);
                g_add_mod(g, y, coefs + ((long long)k * n + h) * L, y);
            }
            g_mont_mul(g, y, im, y);
            g_add_mod(g, y, sec + h * L, y);
            if (i == pid) {
                memcpy(own_row + h * L, y, (size_t)L * 4);
            } else {
                g_to_plain(g, y, v);
                g_store_wire(v, wrow + h * bl, bl);
            }
        }
    }
    free(coefs);
    return 0;
}

// Fused Lagrange recombination, generic width (cf. hf_recombine_rows).
int hfg_recombine_rows(
        const uint32_t* own_row,          // (n, L) or NULL
        const uint32_t* own_cmont,        // (L,)
        const unsigned char* const* wires,
        const uint32_t* wire_cr2,         // (nw, L): c_j * R^2 mod p
        int nw, uint32_t* out, long long n, int bl,
        const uint32_t* p, uint32_t n0, int L) {
    if (L > HFG_MAXL) return 1;
    GCtx g{p, n0, L};
    if (own_row) {
        for (long long h = 0; h < n; h++)
            g_mont_mul(g, own_row + h * L, own_cmont, out + h * L);
    } else {
        memset(out, 0, (size_t)n * L * 4);
    }
    uint32_t v[HFG_MAXL], term[HFG_MAXL];
    for (int w = 0; w < nw; w++) {
        const unsigned char* in = wires[w];
        const uint32_t* cr2 = wire_cr2 + (size_t)w * L;
        for (long long h = 0; h < n; h++) {
            g_load_wire(in + (long long)h * bl, v, bl, L);
            g_mont_mul(g, v, cr2, term);
            g_add_mod(g, out + h * L, term, out + h * L);
        }
    }
    return 0;
}

}  // extern "C"
