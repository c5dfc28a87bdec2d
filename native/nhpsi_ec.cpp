// Native prime-field EC backend for the ElGamal track (<= 256-bit curves).
//
// Replaces the pure-Python hot path of crypto/ec.py (itself the TPU-build
// replacement for libscapi's OpenSSLDlogECFp, reference
// /root/reference/src/Common/Crypto/AddHomElGamalEnc.cpp:545-637): the
// Parameters1.txt ElGamal rows execute millions of scalar multiplications,
// which is host work by design (SURVEY 2.2) but unusably slow as Python
// bigint arithmetic.  This file provides batch entry points so one ctypes
// call amortizes over many group operations:
//
//   ec_mul_batch        k_i * B_i (or a shared base with one shared window)
//   ec_multi_mul_batch  groups of simultaneous multi-exponentiations
//   ec_sum_batch        groups of point sums (Precomp online accumulation)
//
// Field: 4x64-limb Montgomery (any odd p < 2^256, so P-192/224/256 and the
// generic-prime case).  Curve ops: Jacobian double/add, width-5 wNAF single
// mul, width-4 interleaved wNAF multi-exp -- the same algorithms as the
// Python EcGroup, so affine results are identical.
//
// Points on the wire: affine (x, y) as 2*4 uint64 little-endian limbs plus a
// separate infinity flag byte. Scalars: 4 uint64 limbs, already reduced mod
// the group order by the caller.

#include <cstdint>
#include <cstring>

typedef uint64_t u64;
typedef unsigned __int128 u128;

struct Fp {
    u64 p[4];
    u64 n0;      // -p^-1 mod 2^64
    u64 r2[4];   // 2^512 mod p
    u64 mont_one[4];  // 2^256 mod p
    u64 a_mont[4];    // curve a in Montgomery form
};

static bool geq4(const u64* a, const u64* b) {
    for (int i = 3; i >= 0; i--) {
        if (a[i] != b[i]) return a[i] > b[i];
    }
    return true;
}

static void sub4(u64* r, const u64* a, const u64* b) {  // r = a - b (no borrow out)
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 cur = (u128)a[i] - b[i] - (u64)borrow;
        r[i] = (u64)cur;
        borrow = (cur >> 64) ? 1 : 0;
    }
}

static void add_mod(const Fp* f, const u64* a, const u64* b, u64* r) {
    u64 t[4];
    u128 carry = 0;
    for (int i = 0; i < 4; i++) {
        u128 cur = (u128)a[i] + b[i] + (u64)carry;
        t[i] = (u64)cur;
        carry = cur >> 64;
    }
    if (carry || geq4(t, f->p)) sub4(r, t, f->p);
    else memcpy(r, t, 32);
}

static void sub_mod(const Fp* f, const u64* a, const u64* b, u64* r) {
    u64 t[4];
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 cur = (u128)a[i] - b[i] - (u64)borrow;
        t[i] = (u64)cur;
        borrow = (cur >> 64) ? 1 : 0;
    }
    if (borrow) {
        u128 carry = 0;
        for (int i = 0; i < 4; i++) {
            u128 cur = (u128)t[i] + f->p[i] + (u64)carry;
            r[i] = (u64)cur;
            carry = cur >> 64;
        }
    } else memcpy(r, t, 32);
}

static void mont_mul(const Fp* f, const u64* a, const u64* b, u64* out) {
    u64 t[8];
    memset(t, 0, sizeof(t));
    for (int i = 0; i < 4; i++) {
        u64 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 cur = (u128)a[i] * b[j] + t[i + j] + carry;
            t[i + j] = (u64)cur;
            carry = (u64)(cur >> 64);
        }
        t[i + 4] = carry;
    }
    u64 extra = 0;
    for (int i = 0; i < 4; i++) {
        u64 m = t[i] * f->n0;
        u64 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 cur = (u128)m * f->p[j] + t[i + j] + carry;
            t[i + j] = (u64)cur;
            carry = (u64)(cur >> 64);
        }
        for (int j = i + 4; j < 8 && carry; j++) {
            u128 cur = (u128)t[j] + carry;
            t[j] = (u64)cur;
            carry = (u64)(cur >> 64);
        }
        extra += carry;  // carry out of t[7]
    }
    u64 r[4] = {t[4], t[5], t[6], t[7]};
    if (extra || geq4(r, f->p)) sub4(out, r, f->p);
    else memcpy(out, r, 32);
}

static void mont_sqr(const Fp* f, const u64* a, u64* out) { mont_mul(f, a, a, out); }

static bool is_zero4(const u64* a) { return !(a[0] | a[1] | a[2] | a[3]); }

// Montgomery-domain power: out = a^e, e given as 4x64 little-endian limbs.
static void mont_pow(const Fp* f, const u64* a, const u64* e, u64* out) {
    u64 acc[4];
    memcpy(acc, f->mont_one, 32);
    u64 base[4];
    memcpy(base, a, 32);
    for (int limb = 0; limb < 4; limb++) {
        u64 bits = e[limb];
        for (int i = 0; i < 64; i++) {
            if (bits & 1) mont_mul(f, acc, base, acc);
            mont_sqr(f, base, base);
            bits >>= 1;
        }
    }
    memcpy(out, acc, 32);
}

// Montgomery-domain inverse via Fermat (p prime): a^(p-2).
static void mont_inv(const Fp* f, const u64* a, u64* out) {
    u64 e[4];
    // e = p - 2
    u64 two[4] = {2, 0, 0, 0};
    sub4(e, f->p, two);
    mont_pow(f, a, e, out);
}

static void fp_init(Fp* f, const u64* p, const u64* a_plain) {
    memcpy(f->p, p, 32);
    // n0 = -p^-1 mod 2^64 (Newton iteration)
    u64 inv = p[0];
    for (int i = 0; i < 6; i++) inv *= 2 - p[0] * inv;
    f->n0 = (u64)(0 - inv);
    // mont_one = 2^256 mod p by repeated doubling of (2^255 via shifts)
    u64 one[4] = {1, 0, 0, 0};
    u64 cur[4];
    memcpy(cur, one, 32);
    for (int i = 0; i < 256; i++) add_mod(f, cur, cur, cur);
    memcpy(f->mont_one, cur, 32);
    // r2 = 2^512 mod p: double mont_one 256 more times
    for (int i = 0; i < 256; i++) add_mod(f, cur, cur, cur);
    memcpy(f->r2, cur, 32);
    // a in Montgomery form
    mont_mul(f, a_plain, f->r2, f->a_mont);
}

struct JP {
    u64 X[4], Y[4], Z[4];
    int inf;
};

static void jp_set_inf(JP* r) { r->inf = 1; }

static void jac_double(const Fp* f, const JP* P, JP* R) {
    if (P->inf || is_zero4(P->Y)) { jp_set_inf(R); return; }
    u64 XX[4], YY[4], YYYY[4], ZZ[4], S[4], M[4], T[4], t0[4], t1[4];
    mont_sqr(f, P->X, XX);
    mont_sqr(f, P->Y, YY);
    mont_sqr(f, YY, YYYY);
    mont_sqr(f, P->Z, ZZ);
    // S = 2*((X+YY)^2 - XX - YYYY)
    add_mod(f, P->X, YY, t0);
    mont_sqr(f, t0, t0);
    sub_mod(f, t0, XX, t0);
    sub_mod(f, t0, YYYY, t0);
    add_mod(f, t0, t0, S);
    // M = 3*XX + a*ZZ^2
    add_mod(f, XX, XX, M);
    add_mod(f, M, XX, M);
    mont_sqr(f, ZZ, t1);
    mont_mul(f, t1, f->a_mont, t1);
    add_mod(f, M, t1, M);
    // T = M^2 - 2*S
    mont_sqr(f, M, T);
    sub_mod(f, T, S, T);
    sub_mod(f, T, S, T);
    // Y3 = M*(S - T) - 8*YYYY
    sub_mod(f, S, T, t0);
    mont_mul(f, M, t0, t0);
    add_mod(f, YYYY, YYYY, t1);
    add_mod(f, t1, t1, t1);
    add_mod(f, t1, t1, t1);
    sub_mod(f, t0, t1, t0);
    // Z3 = (Y+Z)^2 - YY - ZZ
    u64 z3[4];
    add_mod(f, P->Y, P->Z, z3);
    mont_sqr(f, z3, z3);
    sub_mod(f, z3, YY, z3);
    sub_mod(f, z3, ZZ, z3);
    memcpy(R->X, T, 32);
    memcpy(R->Y, t0, 32);
    memcpy(R->Z, z3, 32);
    R->inf = 0;
}

static void jac_add(const Fp* f, const JP* P, const JP* Q, JP* R) {
    if (P->inf) { *R = *Q; return; }
    if (Q->inf) { *R = *P; return; }
    u64 Z1Z1[4], Z2Z2[4], U1[4], U2[4], S1[4], S2[4];
    mont_sqr(f, P->Z, Z1Z1);
    mont_sqr(f, Q->Z, Z2Z2);
    mont_mul(f, P->X, Z2Z2, U1);
    mont_mul(f, Q->X, Z1Z1, U2);
    mont_mul(f, P->Y, Q->Z, S1);
    mont_mul(f, S1, Z2Z2, S1);
    mont_mul(f, Q->Y, P->Z, S2);
    mont_mul(f, S2, Z1Z1, S2);
    if (!memcmp(U1, U2, 32)) {
        if (memcmp(S1, S2, 32)) { jp_set_inf(R); return; }
        jac_double(f, P, R);
        return;
    }
    u64 H[4], I[4], J[4], r_[4], V[4], t0[4], t1[4];
    sub_mod(f, U2, U1, H);
    add_mod(f, H, H, I);
    mont_sqr(f, I, I);       // I = (2H)^2 = 4H^2
    mont_mul(f, H, I, J);
    sub_mod(f, S2, S1, r_);
    add_mod(f, r_, r_, r_);
    mont_mul(f, U1, I, V);
    // X3 = r^2 - J - 2V
    mont_sqr(f, r_, t0);
    sub_mod(f, t0, J, t0);
    sub_mod(f, t0, V, t0);
    sub_mod(f, t0, V, t0);
    // Y3 = r*(V - X3) - 2*S1*J
    sub_mod(f, V, t0, t1);
    mont_mul(f, r_, t1, t1);
    u64 t2[4];
    mont_mul(f, S1, J, t2);
    add_mod(f, t2, t2, t2);
    sub_mod(f, t1, t2, t1);
    // Z3 = ((Z1+Z2)^2 - Z1Z1 - Z2Z2) * H
    u64 z3[4];
    add_mod(f, P->Z, Q->Z, z3);
    mont_sqr(f, z3, z3);
    sub_mod(f, z3, Z1Z1, z3);
    sub_mod(f, z3, Z2Z2, z3);
    mont_mul(f, z3, H, z3);
    memcpy(R->X, t0, 32);
    memcpy(R->Y, t1, 32);
    memcpy(R->Z, z3, 32);
    R->inf = 0;
}

static void jac_neg(const Fp* f, const JP* P, JP* R) {
    *R = *P;
    if (!P->inf) {
        u64 zero[4] = {0, 0, 0, 0};
        sub_mod(f, zero, P->Y, R->Y);
    }
}

static void load_affine(const Fp* f, const u64* xy, int inf, JP* R) {
    if (inf) { jp_set_inf(R); return; }
    mont_mul(f, xy, f->r2, R->X);
    mont_mul(f, xy + 4, f->r2, R->Y);
    memcpy(R->Z, f->mont_one, 32);
    R->inf = 0;
}

static void store_affine(const Fp* f, const JP* P, u64* xy, uint8_t* inf) {
    if (P->inf || is_zero4(P->Z)) {
        *inf = 1;
        memset(xy, 0, 64);
        return;
    }
    *inf = 0;
    u64 zi[4], zi2[4], t[4];
    mont_inv(f, P->Z, zi);
    mont_sqr(f, zi, zi2);
    u64 plain_one[4] = {1, 0, 0, 0};
    mont_mul(f, P->X, zi2, t);
    mont_mul(f, t, plain_one, xy);          // from Montgomery
    mont_mul(f, zi2, zi, zi2);              // zi^3
    mont_mul(f, P->Y, zi2, t);
    mont_mul(f, t, plain_one, xy + 4);
}

// width-w NAF of a (possibly 257-bit after additions) scalar; digits out.
static int wnaf(const u64* k_in, int w, int8_t* out) {
    u64 k[5];
    memcpy(k, k_in, 32);
    k[4] = 0;
    int len = 0;
    int mask = (1 << w) - 1;
    while (k[0] | k[1] | k[2] | k[3] | k[4]) {
        int8_t d = 0;
        if (k[0] & 1) {
            int dd = (int)(k[0] & mask);
            if (dd >= (1 << (w - 1))) dd -= (1 << w);
            d = (int8_t)dd;
            if (dd > 0) {
                u128 borrow = dd;
                for (int i = 0; i < 5 && borrow; i++) {
                    u128 cur = (u128)k[i] - (u64)borrow;
                    k[i] = (u64)cur;
                    borrow = (cur >> 64) ? 1 : 0;
                }
            } else {
                u128 carry = (u64)(-dd);
                for (int i = 0; i < 5 && carry; i++) {
                    u128 cur = (u128)k[i] + (u64)carry;
                    k[i] = (u64)cur;
                    carry = cur >> 64;
                }
            }
        }
        out[len++] = d;
        // k >>= 1
        for (int i = 0; i < 4; i++) k[i] = (k[i] >> 1) | (k[i + 1] << 63);
        k[4] >>= 1;
    }
    return len;
}

// odd multiples table [P, 3P, ..., (2^(w-1)-1)P]
static void odd_table(const Fp* f, const JP* P, int w, JP* tbl) {
    tbl[0] = *P;
    JP twoP;
    jac_double(f, P, &twoP);
    int count = 1 << (w - 2);
    for (int i = 1; i < count; i++) jac_add(f, &tbl[i - 1], &twoP, &tbl[i]);
}

static void wnaf_mul(const Fp* f, const JP* tbl, int w, const u64* k, JP* R) {
    int8_t naf[262];
    int len = wnaf(k, w, naf);
    jp_set_inf(R);
    for (int i = len - 1; i >= 0; i--) {
        jac_double(f, R, R);
        int8_t d = naf[i];
        if (d > 0) jac_add(f, R, &tbl[(d - 1) / 2], R);
        else if (d < 0) {
            JP n;
            jac_neg(f, &tbl[(-d - 1) / 2], &n);
            jac_add(f, R, &n, R);
        }
    }
}

extern "C" {

// out[i] = scalars[i] * base[i]  (shared_base: base[0] for all, shared table)
int ec_mul_batch(
    const u64* p, const u64* a, int shared_base,
    const u64* base_xy, const uint8_t* base_inf,
    const u64* scalars, int64_t n,
    u64* out_xy, uint8_t* out_inf)
{
    Fp f;
    fp_init(&f, p, a);
    const int W = 5;
    JP tbl[1 << (W - 2)];
    JP B;
    if (shared_base) {
        load_affine(&f, base_xy, base_inf[0], &B);
        if (!B.inf) odd_table(&f, &B, W, tbl);
    }
    for (int64_t i = 0; i < n; i++) {
        const u64* k = scalars + 4 * i;
        int binf;
        if (shared_base) binf = B.inf;
        else {
            load_affine(&f, base_xy + 8 * i, base_inf[i], &B);
            binf = B.inf;
            if (!binf) odd_table(&f, &B, W, tbl);
        }
        if (binf || !(k[0] | k[1] | k[2] | k[3])) {
            out_inf[i] = 1;
            memset(out_xy + 8 * i, 0, 64);
            continue;
        }
        JP R;
        wnaf_mul(&f, tbl, W, k, &R);
        store_affine(&f, &R, out_xy + 8 * i, out_inf + i);
    }
    return 0;
}

// n_groups simultaneous multi-exponentiations of k points each:
// out[g] = sum_j scalars[g*k+j] * pts[g*k+j]
int ec_multi_mul_batch(
    const u64* p, const u64* a, int64_t n_groups, int64_t k,
    const u64* pts_xy, const uint8_t* pts_inf, const u64* scalars,
    u64* out_xy, uint8_t* out_inf)
{
    Fp f;
    fp_init(&f, p, a);
    const int W = 4;
    const int TBL = 1 << (W - 2);
    // per-group scratch (k can be large; allocate on heap once)
    JP* tbls = new JP[k * TBL];
    int8_t* nafs = new int8_t[k * 262];
    int* lens = new int[k];
    for (int64_t g = 0; g < n_groups; g++) {
        int active = 0;
        int maxlen = 0;
        for (int64_t j = 0; j < k; j++) {
            const u64* s = scalars + 4 * (g * k + j);
            if (pts_inf[g * k + j] || !(s[0] | s[1] | s[2] | s[3])) continue;
            JP P;
            load_affine(&f, pts_xy + 8 * (g * k + j), 0, &P);
            odd_table(&f, &P, W, tbls + active * TBL);
            lens[active] = wnaf(s, W, nafs + active * 262);
            if (lens[active] > maxlen) maxlen = lens[active];
            active++;
        }
        JP R;
        jp_set_inf(&R);
        for (int bit = maxlen - 1; bit >= 0; bit--) {
            jac_double(&f, &R, &R);
            for (int j = 0; j < active; j++) {
                int8_t d = bit < lens[j] ? nafs[j * 262 + bit] : 0;
                if (d > 0) jac_add(&f, &R, &tbls[j * TBL + (d - 1) / 2], &R);
                else if (d < 0) {
                    JP nn;
                    jac_neg(&f, &tbls[j * TBL + (-d - 1) / 2], &nn);
                    jac_add(&f, &R, &nn, &R);
                }
            }
        }
        store_affine(&f, &R, out_xy + 8 * g, out_inf + g);
    }
    delete[] tbls;
    delete[] nafs;
    delete[] lens;
    return 0;
}

// n_groups sums of k points each: out[g] = sum_j pts[g*k+j]
int ec_sum_batch(
    const u64* p, const u64* a, int64_t n_groups, int64_t k,
    const u64* pts_xy, const uint8_t* pts_inf,
    u64* out_xy, uint8_t* out_inf)
{
    Fp f;
    fp_init(&f, p, a);
    for (int64_t g = 0; g < n_groups; g++) {
        JP R;
        jp_set_inf(&R);
        for (int64_t j = 0; j < k; j++) {
            JP P;
            load_affine(&f, pts_xy + 8 * (g * k + j), pts_inf[g * k + j], &P);
            jac_add(&f, &R, &P, &R);
        }
        store_affine(&f, &R, out_xy + 8 * g, out_inf + g);
    }
    return 0;
}

// SEC1 point decompression for curves with p = 3 (mod 4):
// y = (x^3 + a*x + b)^((p+1)/4); ok[i] = 0 if x is not on the curve.
// e = (p+1)/4 as 4x64 little-endian limbs; parities[i] = wanted y & 1.
// The wire-deserialization hot path (one modexp + one verifying square per
// point, all in Montgomery domain) -- replaces per-point Python pow chains.
int ec_decompress_batch(
    const u64* p, const u64* a, const u64* b, const u64* e,
    const u64* xs, const uint8_t* parities, int64_t n,
    u64* out_y, uint8_t* ok)
{
    Fp f;
    fp_init(&f, p, a);
    u64 bm[4];
    mont_mul(&f, b, f.r2, bm);
    for (int64_t i = 0; i < n; i++) {
        u64 xm[4], t[4], rhs[4], ym[4], chk[4], y[4];
        mont_mul(&f, xs + 4 * i, f.r2, xm);
        mont_sqr(&f, xm, t);
        mont_mul(&f, t, xm, rhs);             // x^3
        mont_mul(&f, f.a_mont, xm, t);
        add_mod(&f, rhs, t, rhs);             // + a*x
        add_mod(&f, rhs, bm, rhs);            // + b
        mont_pow(&f, rhs, e, ym);
        mont_sqr(&f, ym, chk);
        ok[i] = memcmp(chk, rhs, 32) == 0 ? 1 : 0;
        u64 one[4] = {1, 0, 0, 0};
        mont_mul(&f, ym, one, y);             // back to plain domain
        if (!is_zero4(y) && ((y[0] & 1) != (parities[i] & 1))) {
            u64 tmp[4];
            sub4(tmp, f.p, y);
            memcpy(y, tmp, 32);
        }
        memcpy(out_y + 4 * i, y, 32);
    }
    return 0;
}

}  // extern "C"
