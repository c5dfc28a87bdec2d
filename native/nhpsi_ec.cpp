// Native prime-field EC backend for the ElGamal track.
//
// Replaces the pure-Python hot path of crypto/ec.py (itself the TPU-build
// replacement for libscapi's OpenSSLDlogECFp, reference
// /root/reference/src/Common/Crypto/AddHomElGamalEnc.cpp:545-637): the
// Parameters1.txt ElGamal rows execute millions of scalar multiplications,
// which is host work by design (SURVEY 2.2) but unusably slow as Python
// bigint arithmetic.  This file provides batch entry points so one ctypes
// call amortizes over many group operations:
//
//   ec_mul_batch2        k_i * B_i (or a shared base with one shared window)
//   ec_multi_mul_batch2  groups of simultaneous multi-exponentiations
//   ec_sum_batch2        groups of point sums (Precomp online accumulation)
//   ec_decompress_batch2 SEC1 wire decompression (p = 3 mod 4)
//
// Field: templated NLx64-limb Montgomery -- NL = 4 (P-192/224/256), 6
// (P-384), 9 (P-521); reference curve dispatch parity:
// /root/reference/src/Server/ElGamal/ElGamalPSIServer.hpp:32-46.  Curve
// ops: Jacobian double/add, width-5 wNAF single mul, width-4 interleaved
// wNAF multi-exp -- the same algorithms as the Python EcGroup, so affine
// results are identical point-for-point.
//
// Affine outputs are normalized with ONE field inversion per BATCH
// (Montgomery's simultaneous-inversion trick) instead of one Fermat modexp
// per point -- the r4 profile showed store_affine's ~NL*64 squarings per
// output dominating small-k batches.
//
// Points on the wire: affine (x, y) as 2*NL uint64 little-endian limbs plus
// a separate infinity flag byte. Scalars: NL uint64 limbs, already reduced
// mod the group order by the caller.

#include <cstdint>
#include <cstring>

typedef uint64_t u64;
typedef unsigned __int128 u128;

template <int NL>
struct Fp {
    u64 p[NL];
    u64 n0;            // -p^-1 mod 2^64
    u64 r2[NL];        // 2^(128*NL) mod p
    u64 mont_one[NL];  // 2^(64*NL) mod p
    u64 a_mont[NL];    // curve a in Montgomery form
};

template <int NL>
static bool geqN(const u64* a, const u64* b) {
    for (int i = NL - 1; i >= 0; i--)
        if (a[i] != b[i]) return a[i] > b[i];
    return true;
}

template <int NL>
static void subN(u64* r, const u64* a, const u64* b) {  // no borrow out
    u128 borrow = 0;
    for (int i = 0; i < NL; i++) {
        u128 cur = (u128)a[i] - b[i] - (u64)borrow;
        r[i] = (u64)cur;
        borrow = (cur >> 64) ? 1 : 0;
    }
}

template <int NL>
static void add_mod(const Fp<NL>* f, const u64* a, const u64* b, u64* r) {
    u64 t[NL];
    u128 carry = 0;
    for (int i = 0; i < NL; i++) {
        u128 cur = (u128)a[i] + b[i] + (u64)carry;
        t[i] = (u64)cur;
        carry = cur >> 64;
    }
    if (carry || geqN<NL>(t, f->p)) subN<NL>(r, t, f->p);
    else memcpy(r, t, 8 * NL);
}

template <int NL>
static void sub_mod(const Fp<NL>* f, const u64* a, const u64* b, u64* r) {
    u64 t[NL];
    u128 borrow = 0;
    for (int i = 0; i < NL; i++) {
        u128 cur = (u128)a[i] - b[i] - (u64)borrow;
        t[i] = (u64)cur;
        borrow = (cur >> 64) ? 1 : 0;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < NL; i++) {
            u128 cur = (u128)t[i] + f->p[i] + (u64)carry;
            r[i] = (u64)cur;
            carry = cur >> 64;
        }
    } else memcpy(r, t, 8 * NL);
}

template <int NL>
static void mont_mul(const Fp<NL>* f, const u64* a, const u64* b, u64* out) {
    u64 t[2 * NL];
    memset(t, 0, sizeof(t));
    for (int i = 0; i < NL; i++) {
        u64 carry = 0;
        for (int j = 0; j < NL; j++) {
            u128 cur = (u128)a[i] * b[j] + t[i + j] + carry;
            t[i + j] = (u64)cur;
            carry = (u64)(cur >> 64);
        }
        t[i + NL] = carry;
    }
    u64 extra = 0;
    for (int i = 0; i < NL; i++) {
        u64 m = t[i] * f->n0;
        u64 carry = 0;
        for (int j = 0; j < NL; j++) {
            u128 cur = (u128)m * f->p[j] + t[i + j] + carry;
            t[i + j] = (u64)cur;
            carry = (u64)(cur >> 64);
        }
        for (int j = i + NL; j < 2 * NL && carry; j++) {
            u128 cur = (u128)t[j] + carry;
            t[j] = (u64)cur;
            carry = (u64)(cur >> 64);
        }
        extra += carry;  // carry out of t[2NL-1]
    }
    u64 r[NL];
    for (int i = 0; i < NL; i++) r[i] = t[i + NL];
    if (extra || geqN<NL>(r, f->p)) subN<NL>(out, r, f->p);
    else memcpy(out, r, 8 * NL);
}

template <int NL>
static void mont_sqr(const Fp<NL>* f, const u64* a, u64* out) {
    mont_mul<NL>(f, a, a, out);
}

template <int NL>
static bool is_zeroN(const u64* a) {
    u64 acc = 0;
    for (int i = 0; i < NL; i++) acc |= a[i];
    return acc == 0;
}

// Montgomery-domain power: out = a^e, e given as NLx64 little-endian limbs.
template <int NL>
static void mont_pow(const Fp<NL>* f, const u64* a, const u64* e, u64* out) {
    u64 acc[NL], base[NL];
    memcpy(acc, f->mont_one, 8 * NL);
    memcpy(base, a, 8 * NL);
    for (int limb = 0; limb < NL; limb++) {
        u64 bits = e[limb];
        for (int i = 0; i < 64; i++) {
            if (bits & 1) mont_mul<NL>(f, acc, base, acc);
            mont_sqr<NL>(f, base, base);
            bits >>= 1;
        }
    }
    memcpy(out, acc, 8 * NL);
}

// Montgomery-domain inverse via Fermat (p prime): a^(p-2).
template <int NL>
static void mont_inv(const Fp<NL>* f, const u64* a, u64* out) {
    u64 e[NL];
    u64 two[NL] = {2};
    subN<NL>(e, f->p, two);
    mont_pow<NL>(f, a, e, out);
}

template <int NL>
static void fp_init(Fp<NL>* f, const u64* p, const u64* a_plain) {
    memcpy(f->p, p, 8 * NL);
    u64 inv = p[0];
    for (int i = 0; i < 6; i++) inv *= 2 - p[0] * inv;
    f->n0 = (u64)(0 - inv);
    // mont_one = 2^(64*NL) mod p by repeated doubling of 1
    u64 cur[NL] = {1};
    for (int i = 0; i < 64 * NL; i++) add_mod<NL>(f, cur, cur, cur);
    memcpy(f->mont_one, cur, 8 * NL);
    // r2 = 2^(128*NL) mod p: double 64*NL more times
    for (int i = 0; i < 64 * NL; i++) add_mod<NL>(f, cur, cur, cur);
    memcpy(f->r2, cur, 8 * NL);
    mont_mul<NL>(f, a_plain, f->r2, f->a_mont);
}

template <int NL>
struct JP {
    u64 X[NL], Y[NL], Z[NL];
    int inf;
};

template <int NL>
static void jp_set_inf(JP<NL>* r) { r->inf = 1; }

template <int NL>
static void jac_double(const Fp<NL>* f, const JP<NL>* P, JP<NL>* R) {
    if (P->inf || is_zeroN<NL>(P->Y)) { jp_set_inf<NL>(R); return; }
    u64 XX[NL], YY[NL], YYYY[NL], ZZ[NL], S[NL], M[NL], T[NL], t0[NL], t1[NL];
    mont_sqr<NL>(f, P->X, XX);
    mont_sqr<NL>(f, P->Y, YY);
    mont_sqr<NL>(f, YY, YYYY);
    mont_sqr<NL>(f, P->Z, ZZ);
    // S = 2*((X+YY)^2 - XX - YYYY)
    add_mod<NL>(f, P->X, YY, t0);
    mont_sqr<NL>(f, t0, t0);
    sub_mod<NL>(f, t0, XX, t0);
    sub_mod<NL>(f, t0, YYYY, t0);
    add_mod<NL>(f, t0, t0, S);
    // M = 3*XX + a*ZZ^2
    add_mod<NL>(f, XX, XX, M);
    add_mod<NL>(f, M, XX, M);
    mont_sqr<NL>(f, ZZ, t1);
    mont_mul<NL>(f, t1, f->a_mont, t1);
    add_mod<NL>(f, M, t1, M);
    // T = M^2 - 2*S
    mont_sqr<NL>(f, M, T);
    sub_mod<NL>(f, T, S, T);
    sub_mod<NL>(f, T, S, T);
    // Y3 = M*(S - T) - 8*YYYY
    sub_mod<NL>(f, S, T, t0);
    mont_mul<NL>(f, M, t0, t0);
    add_mod<NL>(f, YYYY, YYYY, t1);
    add_mod<NL>(f, t1, t1, t1);
    add_mod<NL>(f, t1, t1, t1);
    sub_mod<NL>(f, t0, t1, t0);
    // Z3 = (Y+Z)^2 - YY - ZZ
    u64 z3[NL];
    add_mod<NL>(f, P->Y, P->Z, z3);
    mont_sqr<NL>(f, z3, z3);
    sub_mod<NL>(f, z3, YY, z3);
    sub_mod<NL>(f, z3, ZZ, z3);
    memcpy(R->X, T, 8 * NL);
    memcpy(R->Y, t0, 8 * NL);
    memcpy(R->Z, z3, 8 * NL);
    R->inf = 0;
}

template <int NL>
static void jac_add(const Fp<NL>* f, const JP<NL>* P, const JP<NL>* Q, JP<NL>* R) {
    if (P->inf) { *R = *Q; return; }
    if (Q->inf) { *R = *P; return; }
    u64 Z1Z1[NL], Z2Z2[NL], U1[NL], U2[NL], S1[NL], S2[NL];
    mont_sqr<NL>(f, P->Z, Z1Z1);
    mont_sqr<NL>(f, Q->Z, Z2Z2);
    mont_mul<NL>(f, P->X, Z2Z2, U1);
    mont_mul<NL>(f, Q->X, Z1Z1, U2);
    mont_mul<NL>(f, P->Y, Q->Z, S1);
    mont_mul<NL>(f, S1, Z2Z2, S1);
    mont_mul<NL>(f, Q->Y, P->Z, S2);
    mont_mul<NL>(f, S2, Z1Z1, S2);
    if (!memcmp(U1, U2, 8 * NL)) {
        if (memcmp(S1, S2, 8 * NL)) { jp_set_inf<NL>(R); return; }
        jac_double<NL>(f, P, R);
        return;
    }
    u64 H[NL], I[NL], J[NL], r_[NL], V[NL], t0[NL], t1[NL];
    sub_mod<NL>(f, U2, U1, H);
    add_mod<NL>(f, H, H, I);
    mont_sqr<NL>(f, I, I);  // I = 4H^2
    mont_mul<NL>(f, H, I, J);
    sub_mod<NL>(f, S2, S1, r_);
    add_mod<NL>(f, r_, r_, r_);
    mont_mul<NL>(f, U1, I, V);
    // X3 = r^2 - J - 2V
    mont_sqr<NL>(f, r_, t0);
    sub_mod<NL>(f, t0, J, t0);
    sub_mod<NL>(f, t0, V, t0);
    sub_mod<NL>(f, t0, V, t0);
    // Y3 = r*(V - X3) - 2*S1*J
    sub_mod<NL>(f, V, t0, t1);
    mont_mul<NL>(f, r_, t1, t1);
    u64 t2[NL];
    mont_mul<NL>(f, S1, J, t2);
    add_mod<NL>(f, t2, t2, t2);
    sub_mod<NL>(f, t1, t2, t1);
    // Z3 = ((Z1+Z2)^2 - Z1Z1 - Z2Z2) * H
    u64 z3[NL];
    add_mod<NL>(f, P->Z, Q->Z, z3);
    mont_sqr<NL>(f, z3, z3);
    sub_mod<NL>(f, z3, Z1Z1, z3);
    sub_mod<NL>(f, z3, Z2Z2, z3);
    mont_mul<NL>(f, z3, H, z3);
    memcpy(R->X, t0, 8 * NL);
    memcpy(R->Y, t1, 8 * NL);
    memcpy(R->Z, z3, 8 * NL);
    R->inf = 0;
}

template <int NL>
static void jac_neg(const Fp<NL>* f, const JP<NL>* P, JP<NL>* R) {
    *R = *P;
    if (!P->inf) {
        u64 zero[NL] = {0};
        sub_mod<NL>(f, zero, P->Y, R->Y);
    }
}

template <int NL>
static void load_affine(const Fp<NL>* f, const u64* xy, int inf, JP<NL>* R) {
    if (inf) { jp_set_inf<NL>(R); return; }
    mont_mul<NL>(f, xy, f->r2, R->X);
    mont_mul<NL>(f, xy + NL, f->r2, R->Y);
    memcpy(R->Z, f->mont_one, 8 * NL);
    R->inf = 0;
}

// Batch affine normalization: ONE Fermat inversion for the whole array via
// Montgomery's simultaneous-inversion trick (3 extra mults per point).
template <int NL>
static void batch_store_affine(const Fp<NL>* f, JP<NL>* Ps, int64_t n,
                               u64* out_xy, uint8_t* out_inf) {
    u64* pref = new u64[(n + 1) * NL];  // prefix products of active Zs
    int64_t* act = new int64_t[n];
    int64_t na = 0;
    memcpy(pref, f->mont_one, 8 * NL);
    for (int64_t i = 0; i < n; i++) {
        if (Ps[i].inf || is_zeroN<NL>(Ps[i].Z)) {
            out_inf[i] = 1;
            memset(out_xy + 2 * NL * i, 0, 16 * NL);
            continue;
        }
        mont_mul<NL>(f, pref + na * NL, Ps[i].Z, pref + (na + 1) * NL);
        act[na++] = i;
    }
    if (na) {
        u64 inv_all[NL];
        mont_inv<NL>(f, pref + na * NL, inv_all);
        u64 plain_one[NL] = {1};
        for (int64_t j = na - 1; j >= 0; j--) {
            int64_t i = act[j];
            u64 zi[NL], zi2[NL], t[NL];
            mont_mul<NL>(f, inv_all, pref + j * NL, zi);       // 1/Z_i
            mont_mul<NL>(f, inv_all, Ps[i].Z, inv_all);        // strip Z_i
            mont_sqr<NL>(f, zi, zi2);
            mont_mul<NL>(f, Ps[i].X, zi2, t);
            mont_mul<NL>(f, t, plain_one, out_xy + 2 * NL * i);
            mont_mul<NL>(f, zi2, zi, zi2);                     // zi^3
            mont_mul<NL>(f, Ps[i].Y, zi2, t);
            mont_mul<NL>(f, t, plain_one, out_xy + 2 * NL * i + NL);
            out_inf[i] = 0;
        }
    }
    delete[] pref;
    delete[] act;
}

// width-w NAF of a (possibly 64*NL+1-bit after additions) scalar.
template <int NL>
static int wnaf(const u64* k_in, int w, int8_t* out) {
    u64 k[NL + 1];
    memcpy(k, k_in, 8 * NL);
    k[NL] = 0;
    int len = 0;
    int mask = (1 << w) - 1;
    for (;;) {
        u64 any = 0;
        for (int i = 0; i <= NL; i++) any |= k[i];
        if (!any) break;
        int8_t d = 0;
        if (k[0] & 1) {
            int dd = (int)(k[0] & mask);
            if (dd >= (1 << (w - 1))) dd -= (1 << w);
            d = (int8_t)dd;
            if (dd > 0) {
                u128 borrow = dd;
                for (int i = 0; i <= NL && borrow; i++) {
                    u128 cur = (u128)k[i] - (u64)borrow;
                    k[i] = (u64)cur;
                    borrow = (cur >> 64) ? 1 : 0;
                }
            } else {
                u128 carry = (u64)(-dd);
                for (int i = 0; i <= NL && carry; i++) {
                    u128 cur = (u128)k[i] + (u64)carry;
                    k[i] = (u64)cur;
                    carry = cur >> 64;
                }
            }
        }
        out[len++] = d;
        for (int i = 0; i < NL; i++) k[i] = (k[i] >> 1) | (k[i + 1] << 63);
        k[NL] >>= 1;
    }
    return len;
}

static const int MAX_NAF = 64 * 9 + 8;  // NL <= 9

// odd multiples table [P, 3P, ..., (2^(w-1)-1)P]
template <int NL>
static void odd_table(const Fp<NL>* f, const JP<NL>* P, int w, JP<NL>* tbl) {
    tbl[0] = *P;
    JP<NL> twoP;
    jac_double<NL>(f, P, &twoP);
    int count = 1 << (w - 2);
    for (int i = 1; i < count; i++) jac_add<NL>(f, &tbl[i - 1], &twoP, &tbl[i]);
}

template <int NL>
static void wnaf_mul(const Fp<NL>* f, const JP<NL>* tbl, int w, const u64* k,
                     JP<NL>* R) {
    int8_t naf[MAX_NAF];
    int len = wnaf<NL>(k, w, naf);
    jp_set_inf<NL>(R);
    for (int i = len - 1; i >= 0; i--) {
        jac_double<NL>(f, R, R);
        int8_t d = naf[i];
        if (d > 0) jac_add<NL>(f, R, &tbl[(d - 1) / 2], R);
        else if (d < 0) {
            JP<NL> n;
            jac_neg<NL>(f, &tbl[(-d - 1) / 2], &n);
            jac_add<NL>(f, R, &n, R);
        }
    }
}

// Fixed-base comb for a SHARED base with many scalars: precompute
// P[i][d] = d * 2^(w*i) * B for every w-bit window, then each scalar costs
// only nonzero-window ADDS -- no per-scalar doublings at all. The Precomp
// PIE's offline exponentiation (known table items against one index
// ciphertext, reference PrecompElGamalPIE.cpp:31-55) and every
// generator-base batch (Enc(0) streams, g^item tables) hit this path;
// measured ~4-6x over per-scalar wNAF at sweep batch sizes. Window width
// picked so table-build adds amortize over the batch.
template <int NL>
static void fixed_base_batch(const Fp<NL>* f, const JP<NL>* B,
                             const u64* scalars, int64_t n, JP<NL>* Rs) {
    const int w = n >= 1024 ? 8 : (n >= 128 ? 6 : 4);
    const int nwin = (64 * NL + w - 1) / w;
    const int tsz = 1 << w;
    JP<NL>* T = new JP<NL>[(size_t)nwin * tsz];
    JP<NL> base = *B;
    for (int i = 0; i < nwin; i++) {
        JP<NL>* row = T + (size_t)i * tsz;
        jp_set_inf<NL>(&row[0]);
        row[1] = base;
        for (int d = 2; d < tsz; d++)
            jac_add<NL>(f, &row[d - 1], &base, &row[d]);
        for (int b = 0; b < w; b++) jac_double<NL>(f, &base, &base);
    }
    for (int64_t s = 0; s < n; s++) {
        const u64* k = scalars + NL * s;
        JP<NL>* R = &Rs[s];
        jp_set_inf<NL>(R);
        for (int i = 0; i < nwin; i++) {
            int bit0 = w * i;
            int limb = bit0 >> 6, off = bit0 & 63;
            u64 d = k[limb] >> off;
            if (off + w > 64 && limb + 1 < NL) d |= k[limb + 1] << (64 - off);
            d &= (u64)(tsz - 1);
            if (d) jac_add<NL>(f, R, &T[(size_t)i * tsz + d], R);
        }
    }
    delete[] T;
}

// ---------------------------------------------------------------------------
// Templated implementations of the batch entry points
// ---------------------------------------------------------------------------

template <int NL>
static int mul_batch_impl(
    const u64* p, const u64* a, int shared_base,
    const u64* base_xy, const uint8_t* base_inf,
    const u64* scalars, int64_t n,
    u64* out_xy, uint8_t* out_inf)
{
    Fp<NL> f;
    fp_init<NL>(&f, p, a);
    const int W = 5;
    JP<NL> tbl[1 << (W - 2)];
    JP<NL> B;
    JP<NL>* Rs = new JP<NL>[n];
    if (shared_base) {
        load_affine<NL>(&f, base_xy, base_inf[0], &B);
        if (!B.inf && n >= 16) {
            fixed_base_batch<NL>(&f, &B, scalars, n, Rs);
            batch_store_affine<NL>(&f, Rs, n, out_xy, out_inf);
            delete[] Rs;
            return 0;
        }
        if (!B.inf) odd_table<NL>(&f, &B, W, tbl);
    }
    for (int64_t i = 0; i < n; i++) {
        const u64* k = scalars + NL * i;
        int binf;
        if (shared_base) binf = B.inf;
        else {
            load_affine<NL>(&f, base_xy + 2 * NL * i, base_inf[i], &B);
            binf = B.inf;
            if (!binf) odd_table<NL>(&f, &B, W, tbl);
        }
        if (binf || is_zeroN<NL>(k)) jp_set_inf<NL>(&Rs[i]);
        else wnaf_mul<NL>(&f, tbl, W, k, &Rs[i]);
    }
    batch_store_affine<NL>(&f, Rs, n, out_xy, out_inf);
    delete[] Rs;
    return 0;
}

template <int NL>
static int multi_mul_batch_impl(
    const u64* p, const u64* a, int64_t n_groups, int64_t k,
    const u64* pts_xy, const uint8_t* pts_inf, const u64* scalars,
    u64* out_xy, uint8_t* out_inf)
{
    Fp<NL> f;
    fp_init<NL>(&f, p, a);
    const int W = 4;
    const int TBL = 1 << (W - 2);
    JP<NL>* tbls = new JP<NL>[k * TBL];
    int8_t* nafs = new int8_t[k * MAX_NAF];
    int* lens = new int[k];
    JP<NL>* Rs = new JP<NL>[n_groups];
    for (int64_t g = 0; g < n_groups; g++) {
        int active = 0;
        int maxlen = 0;
        for (int64_t j = 0; j < k; j++) {
            const u64* s = scalars + NL * (g * k + j);
            if (pts_inf[g * k + j] || is_zeroN<NL>(s)) continue;
            JP<NL> P;
            load_affine<NL>(&f, pts_xy + 2 * NL * (g * k + j), 0, &P);
            odd_table<NL>(&f, &P, W, tbls + active * TBL);
            lens[active] = wnaf<NL>(s, W, nafs + active * MAX_NAF);
            if (lens[active] > maxlen) maxlen = lens[active];
            active++;
        }
        JP<NL>* R = &Rs[g];
        jp_set_inf<NL>(R);
        for (int bit = maxlen - 1; bit >= 0; bit--) {
            jac_double<NL>(&f, R, R);
            for (int j = 0; j < active; j++) {
                int8_t d = bit < lens[j] ? nafs[j * MAX_NAF + bit] : 0;
                if (d > 0) jac_add<NL>(&f, R, &tbls[j * TBL + (d - 1) / 2], R);
                else if (d < 0) {
                    JP<NL> nn;
                    jac_neg<NL>(&f, &tbls[j * TBL + (-d - 1) / 2], &nn);
                    jac_add<NL>(&f, R, &nn, R);
                }
            }
        }
    }
    batch_store_affine<NL>(&f, Rs, n_groups, out_xy, out_inf);
    delete[] Rs;
    delete[] tbls;
    delete[] nafs;
    delete[] lens;
    return 0;
}

template <int NL>
static int sum_batch_impl(
    const u64* p, const u64* a, int64_t n_groups, int64_t k,
    const u64* pts_xy, const uint8_t* pts_inf,
    u64* out_xy, uint8_t* out_inf)
{
    Fp<NL> f;
    fp_init<NL>(&f, p, a);
    JP<NL>* Rs = new JP<NL>[n_groups];
    for (int64_t g = 0; g < n_groups; g++) {
        jp_set_inf<NL>(&Rs[g]);
        for (int64_t j = 0; j < k; j++) {
            JP<NL> P;
            load_affine<NL>(&f, pts_xy + 2 * NL * (g * k + j),
                            pts_inf[g * k + j], &P);
            jac_add<NL>(&f, &Rs[g], &P, &Rs[g]);
        }
    }
    batch_store_affine<NL>(&f, Rs, n_groups, out_xy, out_inf);
    delete[] Rs;
    return 0;
}

template <int NL>
static int decompress_batch_impl(
    const u64* p, const u64* a, const u64* b, const u64* e,
    const u64* xs, const uint8_t* parities, int64_t n,
    u64* out_y, uint8_t* ok)
{
    Fp<NL> f;
    fp_init<NL>(&f, p, a);
    u64 bm[NL];
    mont_mul<NL>(&f, b, f.r2, bm);
    for (int64_t i = 0; i < n; i++) {
        u64 xm[NL], t[NL], rhs[NL], ym[NL], chk[NL], y[NL];
        mont_mul<NL>(&f, xs + NL * i, f.r2, xm);
        mont_sqr<NL>(&f, xm, t);
        mont_mul<NL>(&f, t, xm, rhs);              // x^3
        mont_mul<NL>(&f, f.a_mont, xm, t);
        add_mod<NL>(&f, rhs, t, rhs);              // + a*x
        add_mod<NL>(&f, rhs, bm, rhs);             // + b
        mont_pow<NL>(&f, rhs, e, ym);
        mont_sqr<NL>(&f, ym, chk);
        ok[i] = memcmp(chk, rhs, 8 * NL) == 0 ? 1 : 0;
        u64 one[NL] = {1};
        mont_mul<NL>(&f, ym, one, y);              // back to plain domain
        if (!is_zeroN<NL>(y) && ((y[0] & 1) != (parities[i] & 1))) {
            u64 tmp[NL];
            subN<NL>(tmp, f.p, y);
            memcpy(y, tmp, 8 * NL);
        }
        memcpy(out_y + NL * i, y, 8 * NL);
    }
    return 0;
}

// ---------------------------------------------------------------------------
// C entry points: n_limbs-dispatched (4 = <=256-bit, 6 = P-384, 9 = P-521).
// The `2` suffix changes the symbol names so a stale prebuilt .so from the
// fixed-4-limb era fails the ctypes lookup cleanly (python falls back).
// ---------------------------------------------------------------------------

#define DISPATCH(fn, ...)                       \
    switch (n_limbs) {                          \
        case 4: return fn<4>(__VA_ARGS__);      \
        case 6: return fn<6>(__VA_ARGS__);      \
        case 9: return fn<9>(__VA_ARGS__);      \
        default: return -1;                     \
    }

extern "C" {

int ec_mul_batch2(
    int n_limbs, const u64* p, const u64* a, int shared_base,
    const u64* base_xy, const uint8_t* base_inf,
    const u64* scalars, int64_t n,
    u64* out_xy, uint8_t* out_inf)
{
    DISPATCH(mul_batch_impl, p, a, shared_base, base_xy, base_inf,
             scalars, n, out_xy, out_inf)
}

int ec_multi_mul_batch2(
    int n_limbs, const u64* p, const u64* a, int64_t n_groups, int64_t k,
    const u64* pts_xy, const uint8_t* pts_inf, const u64* scalars,
    u64* out_xy, uint8_t* out_inf)
{
    DISPATCH(multi_mul_batch_impl, p, a, n_groups, k, pts_xy, pts_inf,
             scalars, out_xy, out_inf)
}

int ec_sum_batch2(
    int n_limbs, const u64* p, const u64* a, int64_t n_groups, int64_t k,
    const u64* pts_xy, const uint8_t* pts_inf,
    u64* out_xy, uint8_t* out_inf)
{
    DISPATCH(sum_batch_impl, p, a, n_groups, k, pts_xy, pts_inf,
             out_xy, out_inf)
}

int ec_decompress_batch2(
    int n_limbs, const u64* p, const u64* a, const u64* b, const u64* e,
    const u64* xs, const uint8_t* parities, int64_t n,
    u64* out_y, uint8_t* ok)
{
    DISPATCH(decompress_batch_impl, p, a, b, e, xs, parities, n, out_y, ok)
}

}  // extern "C"
