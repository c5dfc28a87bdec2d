// Native host kernels for the TPU-native PSI framework.
//
// The reference implementation's host-side heavy lifting lives in C++
// (OpenFHE / libscapi); the TPU build keeps device compute in XLA/Pallas but
// uses this small C++ runtime for host paths that Python handles poorly:
//
//  1. negacyclic NTT mod an arbitrary <=63-bit modulus with __int128
//     arithmetic -- the packed-encoding transform for the 33/41/49-bit
//     plaintext moduli (BatchedFHEPSIClient.cpp:22-42's bitSize 32/40/48),
//     where numpy has no exact 64x64->128 multiply.
//  2. sequential random-evict cuckoo insertion (reference
//     CuckooHashTable.cpp:78-113 semantics) with tabulation hashing --
//     an alternative backend to the batched numpy insertion, and the
//     parity baseline for its failure-rate envelope.
//
// Built as a plain C shared library (ctypes); no pybind11 dependency.

#include <cstdint>
#include <cstring>
#include <vector>

typedef unsigned __int128 u128;

extern "C" {

static inline uint64_t mulmod_u64(uint64_t a, uint64_t b, uint64_t m) {
    return (uint64_t)(((u128)a * b) % m);
}

static uint64_t powmod_u64(uint64_t base, uint64_t exp, uint64_t m) {
    uint64_t r = 1 % m;
    base %= m;
    while (exp) {
        if (exp & 1) r = mulmod_u64(r, base, m);
        base = mulmod_u64(base, base, m);
        exp >>= 1;
    }
    return r;
}

// Negacyclic NTT (CT, natural -> bit-reversed) / iNTT (GS) mod t.
// data: batch x n row-major uint64, in-place. psi: primitive 2n-th root.
// Matches ops/refmodel.py's algorithm bit-exactly.
int ntt_mod_t(uint64_t* data, int64_t batch, int64_t n, uint64_t t,
              uint64_t psi, int inverse) {
    if (n <= 0 || (n & (n - 1)) != 0) return -1;
    int logn = 0;
    while ((1LL << logn) < n) logn++;

    std::vector<uint64_t> tw(n);
    uint64_t root = inverse ? powmod_u64(psi, t - 2, t) : psi;  // psi^-1 via Fermat
    // tw[i] = root^bitrev(i)
    for (int64_t i = 0; i < n; i++) {
        int64_t rev = 0;
        for (int b = 0; b < logn; b++) rev |= ((i >> b) & 1LL) << (logn - 1 - b);
        tw[i] = powmod_u64(root, (uint64_t)rev, t);
    }

    for (int64_t bi = 0; bi < batch; bi++) {
        uint64_t* x = data + bi * n;
        if (!inverse) {
            int64_t m = 1, len = n;
            while (m < n) {
                len >>= 1;
                for (int64_t g = 0; g < m; g++) {
                    uint64_t s = tw[m + g];
                    uint64_t* base = x + g * 2 * len;
                    for (int64_t j = 0; j < len; j++) {
                        uint64_t u = base[j];
                        uint64_t v = mulmod_u64(base[j + len], s, t);
                        base[j] = u + v >= t ? u + v - t : u + v;
                        base[j + len] = u >= v ? u - v : u + t - v;
                    }
                }
                m <<= 1;
            }
        } else {
            int64_t m = n, len = 1;
            while (m > 1) {
                int64_t h = m >> 1;
                for (int64_t g = 0; g < h; g++) {
                    uint64_t s = tw[h + g];
                    uint64_t* base = x + g * 2 * len;
                    for (int64_t j = 0; j < len; j++) {
                        uint64_t u = base[j];
                        uint64_t v = base[j + len];
                        uint64_t sum = u + v >= t ? u + v - t : u + v;
                        uint64_t diff = u >= v ? u - v : u + t - v;
                        base[j] = sum;
                        base[j + len] = mulmod_u64(diff, s, t);
                    }
                }
                len <<= 1;
                m = h;
            }
            uint64_t ninv = powmod_u64((uint64_t)n % t, t - 2, t);
            for (int64_t j = 0; j < n; j++) x[j] = mulmod_u64(x[j], ninv, t);
        }
    }
    return 0;
}

// ---------------------------------------------------------------------------
// Sequential cuckoo insertion (reference semantics).
// ---------------------------------------------------------------------------

struct XorShift {
    uint64_t s;
    uint64_t next() {
        s ^= s << 13;
        s ^= s >> 7;
        s ^= s << 17;
        return s;
    }
};

static inline uint64_t tab_hash(const uint64_t* table, int hf, uint64_t lo,
                                uint64_t hi) {
    // table layout: (nHf, 16, 256); hash = xor of byte-indexed lookups
    uint64_t res = 0;
    const uint64_t* T = table + (int64_t)hf * 16 * 256;
    for (int i = 0; i < 8; i++) res ^= T[i * 256 + ((lo >> (8 * i)) & 0xFF)];
    for (int i = 0; i < 8; i++) res ^= T[(8 + i) * 256 + ((hi >> (8 * i)) & 0xFF)];
    return res;
}

// items: (n, 2) uint64 [lo, hi]; table out: (n_tables, max_pp, size, 2);
// stash out: (stash_size, 2). Returns number of unplaced items (0 = ok).
int64_t cuckoo_insert_seq(const uint64_t* items, int64_t n_items,
                          const uint64_t* hash_table, int starting_hash_id,
                          int n_hf, int64_t size, int64_t max_pp,
                          int multi_table, int64_t stash_size, uint64_t seed,
                          uint64_t* out_table, uint64_t* out_stash) {
    int n_tables = multi_table ? n_hf : 1;
    std::memset(out_table, 0, sizeof(uint64_t) * n_tables * max_pp * size * 2);
    std::memset(out_stash, 0, sizeof(uint64_t) * stash_size * 2);
    XorShift rng{seed | 1};

    auto slot = [&](int t, int64_t d, int64_t pos) -> uint64_t* {
        return out_table + (((int64_t)t * max_pp + d) * size + pos) * 2;
    };

    int64_t failures = 0;
    for (int64_t it = 0; it < n_items; it++) {
        uint64_t lo = items[it * 2], hi = items[it * 2 + 1];
        // lookUp skip (reference CuckooHashTable.cpp:78)
        bool present = false;
        for (int h = 0; h < n_hf && !present; h++) {
            int t = multi_table ? h : 0;
            int64_t pos =
                (int64_t)(tab_hash(hash_table, starting_hash_id + h, lo, hi) %
                          (uint64_t)size);
            for (int64_t d = 0; d < max_pp; d++) {
                uint64_t* s = slot(t, d, pos);
                if (s[0] == lo && s[1] == hi) { present = true; break; }
                if (s[0] == 0 && s[1] == 0) break;
            }
        }
        if (present) continue;

        bool placed = false;
        for (int run = 0; run < 1000 && !placed; run++) {
            for (int h = 0; h < n_hf && !placed; h++) {
                int t = multi_table ? h : 0;
                int64_t pos =
                    (int64_t)(tab_hash(hash_table, starting_hash_id + h, lo, hi) %
                              (uint64_t)size);
                for (int64_t d = 0; d < max_pp; d++) {
                    uint64_t* s = slot(t, d, pos);
                    if (s[0] == 0 && s[1] == 0) {
                        s[0] = lo; s[1] = hi;
                        placed = true;
                        break;
                    }
                }
                if (!placed) {
                    int64_t d = (int64_t)(rng.next() % (uint64_t)max_pp);
                    uint64_t* s = slot(t, d, pos);
                    uint64_t tl = s[0], th = s[1];
                    s[0] = lo; s[1] = hi;
                    lo = tl; hi = th;
                }
            }
        }
        if (!placed) {
            bool stashed = false;
            for (int64_t si = 0; si < stash_size; si++) {
                if (out_stash[si * 2] == 0 && out_stash[si * 2 + 1] == 0) {
                    out_stash[si * 2] = lo;
                    out_stash[si * 2 + 1] = hi;
                    stashed = true;
                    break;
                }
            }
            if (!stashed) failures++;
        }
    }
    return failures;
}

// ---------------------------------------------------------------------------
// Exact RNS phase -> message mod t (big-t decrypt path; __int128 CRT).
//
// Replaces the Python object-array fallback for t >= 2^33 (reference 40/48-bit
// plaintext moduli, /root/reference/src/Client/FHE/SimpleFHEPSIClient.cpp:29-49).
// phase: (rows, L, n) uint64 RNS residues (each < q_i < 2^31), row-major.
// out: (rows, n) uint64 messages in [0, t). Returns the max fractional
// rounding distance (in 2^-64 units scaled to [0, 0.5]) for noise estimates.
//
// BGV: x = sum_i y_i*(q/q_i) - k*q, y_i = [phase_i * (q/q_i)^-1]_{q_i},
//      k = round(sum_i y_i/q_i);      m = [x]_t.
// BFV: m = [round(t*x/q)]_t = [sum_i y_i*c_i + round(sum_i y_i*f_i)]_t with
//      t/q_i = c_i + f_i (integer + fraction).
// Fractions accumulate in 2^64 fixed point: per-term truncation error is
// <= y_i * 2^-64 <= 2^-33, far below the rounding margin the noise budget
// already guarantees.

double phase_to_mt(const uint64_t* phase, int64_t rows, int64_t L, int64_t n,
                   const uint64_t* q_primes, const uint64_t* inv_qhat,
                   const uint64_t* int_coef, const uint64_t* frac_fp,
                   uint64_t sub_coef, uint64_t t, int bfv, uint64_t* out) {
    // inv_qhat[i] = (q/q_i)^-1 mod q_i
    // BGV: int_coef[i] = (q/q_i) mod t, frac_fp[i] = floor(2^64 / q_i),
    //      sub_coef = q mod t (multiplied by the rounded k and subtracted).
    // BFV: int_coef[i] = floor(t / q_i), frac_fp[i] = floor(((t mod q_i)<<64)/q_i),
    //      sub_coef unused (0).
    uint64_t max_dist = 0;
    for (int64_t r = 0; r < rows; r++) {
        for (int64_t j = 0; j < n; j++) {
            u128 acc_int = 0;   // mod-t accumulation
            u128 acc_fp = 0;    // 2^64 fixed-point fraction accumulation
            for (int64_t i = 0; i < L; i++) {
                uint64_t ph = phase[(r * L + i) * n + j];
                uint64_t y = (uint64_t)(((u128)ph * inv_qhat[i]) % q_primes[i]);
                acc_int = (acc_int + (u128)y * int_coef[i]) % t;
                acc_fp += (u128)y * frac_fp[i];
            }
            uint64_t k = (uint64_t)((acc_fp + ((u128)1 << 63)) >> 64);
            uint64_t frac = (uint64_t)acc_fp;  // low 64 bits
            uint64_t dist = frac > ((uint64_t)1 << 63) ? ~frac + 1 : frac;
            if (dist > max_dist) max_dist = dist;
            uint64_t m;
            if (bfv) {
                m = (uint64_t)((acc_int + k) % t);
            } else {
                uint64_t sub = (uint64_t)(((u128)(k % t) * (sub_coef % t)) % t);
                uint64_t s = (uint64_t)acc_int;
                m = s >= sub ? s - sub : (uint64_t)(s + t - sub);
            }
            out[r * n + j] = m;
        }
    }
    return (double)max_dist / 18446744073709551616.0;  // / 2^64
}

}  // extern "C"
