// Native binary-field (GF(2^m)) EC backend for the B-*/K-* ElGamal curves.
//
// Completes the native curve coverage the reference gets from libscapi's
// OpenSSLDlogECF2m (/root/reference/src/Server/ElGamal/ElGamalPSIServer.hpp:38-41):
// crypto/ec2m.py implements the same group law in pure Python (bigint
// carry-less window multiply) -- functional but orders of magnitude too slow
// for sweep rows. Here field multiplication is hardware carry-less multiply
// (PCLMULQDQ), squaring is one clmul per limb, inversion is Itoh-Tsujii
// (addition-chain exponentiation by 2^m - 2: ~log2(m) + popcount(m-1) field
// mults plus cheap squarings), and the affine Weierstrass-binary group law
// (y^2 + xy = x^3 + a x^2 + b) mirrors ec2m.py exactly, so affine results
// are identical point-for-point.
//
// Wire: field elements as NW little-endian uint64 limbs (NW in {3,4,5,7,9}
// covering m = 163..571); points (x, y) as 2*NW limbs + infinity byte;
// scalars NW limbs reduced mod the order. The field modulus is passed as
// (m, red_exps): x^m + sum x^e.

#include <cstdint>
#include <cstring>
#include <immintrin.h>

typedef uint64_t u64;

struct F2m {
    int m;          // extension degree
    int nw;         // limbs in use (<= MAXW)
    int n_red;
    int red[8];     // reduction exponents below m (descending or any order)
};

static const int MAXW = 9;

// r ^= clmul(a, b) at limb offset `off` (r has >= off+2 limbs)
static inline void clmul_acc(u64* r, u64 a, u64 b, int off) {
    __m128i va = _mm_set_epi64x(0, (long long)a);
    __m128i vb = _mm_set_epi64x(0, (long long)b);
    __m128i p = _mm_clmulepi64_si128(va, vb, 0x00);
    r[off] ^= (u64)_mm_cvtsi128_si64(p);
    r[off + 1] ^= (u64)_mm_extract_epi64(p, 1);
}

// xor-shift: r ^= (v << s) where v spans `vw` limbs, r large enough.
static void xorshl(u64* r, const u64* v, int vw, int s) {
    int ls = s >> 6, bs = s & 63;
    if (bs == 0) {
        for (int i = 0; i < vw; i++) r[i + ls] ^= v[i];
        return;
    }
    u64 carry = 0;
    for (int i = 0; i < vw; i++) {
        r[i + ls] ^= (v[i] << bs) | carry;
        carry = v[i] >> (64 - bs);
    }
    r[vw + ls] ^= carry;
}

// reduce a (2*nw+1)-limb polynomial into nw limbs mod x^m + sum x^red
static void f2m_reduce(const F2m* f, u64* t /* 2*MAXW+1 limbs */, u64* out) {
    const int m = f->m;
    const int top = 2 * f->nw + 1;  // live limbs of the product
    for (;;) {
        // hi = t >> m (as polynomial); width in limbs
        int hw = 0;
        u64 hi[2 * MAXW + 1] = {0};
        int ls = m >> 6, bs = m & 63;
        for (int i = ls; i < top; i++) {
            u64 v = t[i] >> bs;
            if (bs && i + 1 < top) v |= t[i + 1] << (64 - bs);
            hi[i - ls] = v;
            if (v) hw = i - ls + 1;
        }
        if (hw == 0) break;
        // t &= (1<<m) - 1
        for (int i = ls + 1; i < top; i++) t[i] = 0;
        if (bs) t[ls] &= ((u64)1 << bs) - 1;
        // t ^= hi << e for each reduction exponent
        for (int k = 0; k < f->n_red; k++) xorshl(t, hi, hw, f->red[k]);
    }
    for (int i = 0; i < f->nw; i++) out[i] = t[i];
}

static void f2m_mul(const F2m* f, const u64* a, const u64* b, u64* out) {
    u64 t[2 * MAXW + 1] = {0};
    for (int i = 0; i < f->nw; i++) {
        if (!a[i]) continue;
        for (int j = 0; j < f->nw; j++) {
            if (b[j]) clmul_acc(t, a[i], b[j], i + j);
        }
    }
    f2m_reduce(f, t, out);
}

static void f2m_sqr(const F2m* f, const u64* a, u64* out) {
    u64 t[2 * MAXW + 1] = {0};
    for (int i = 0; i < f->nw; i++)
        if (a[i]) clmul_acc(t, a[i], a[i], 2 * i);
    f2m_reduce(f, t, out);
}

static bool f2m_is_zero(const F2m* f, const u64* a) {
    u64 acc = 0;
    for (int i = 0; i < f->nw; i++) acc |= a[i];
    return acc == 0;
}

static bool f2m_eq(const F2m* f, const u64* a, const u64* b) {
    u64 acc = 0;
    for (int i = 0; i < f->nw; i++) acc |= a[i] ^ b[i];
    return acc == 0;
}

// Itoh-Tsujii inversion: x^(2^m - 2) = (beta_{m-1})^2 with
// beta_k = x^(2^k - 1), beta_{j+k} = beta_j^(2^k) * beta_k.
static void f2m_inv(const F2m* f, const u64* x, u64* out) {
    // addition chain from the binary expansion of m-1 (MSB first)
    int e = f->m - 1;
    int bits[16], nb = 0;
    for (int v = e; v; v >>= 1) bits[nb++] = v & 1;
    u64 beta[MAXW], tmp[MAXW];
    memcpy(beta, x, 8 * f->nw);   // beta_1 = x^(2^1 - 1)
    int k = 1;
    for (int i = nb - 2; i >= 0; i--) {
        // beta_{2k} = beta_k^(2^k) * beta_k
        memcpy(tmp, beta, 8 * f->nw);
        for (int s = 0; s < k; s++) f2m_sqr(f, tmp, tmp);
        f2m_mul(f, tmp, beta, beta);
        k *= 2;
        if (bits[i]) {
            // beta_{k+1} = beta_k^2 * x
            f2m_sqr(f, beta, beta);
            f2m_mul(f, beta, x, beta);
            k += 1;
        }
    }
    // k == m-1; inverse = beta^(2) (x^(2^m - 2))
    f2m_sqr(f, beta, out);
}

struct AP {  // affine point
    u64 x[MAXW], y[MAXW];
    int inf;
};

struct Curve {
    F2m f;
    u64 a[MAXW];
    u64 b[MAXW];
};

static void ap_set_inf(AP* p) { p->inf = 1; }

// exact mirror of ec2m.py BinaryEcGroup.add (affine binary Weierstrass)
static void ec_add(const Curve* c, const AP* A, const AP* B, AP* R) {
    const F2m* f = &c->f;
    if (A->inf) { *R = *B; return; }
    if (B->inf) { *R = *A; return; }
    u64 lam[MAXW], t[MAXW], x3[MAXW], y3[MAXW];
    if (f2m_eq(f, A->x, B->x)) {
        u64 xy[MAXW];
        for (int i = 0; i < f->nw; i++) xy[i] = A->x[i] ^ A->y[i];
        if (f2m_is_zero(f, A->x) || f2m_eq(f, B->y, xy)) {
            ap_set_inf(R);
            return;  // B = -A (incl. the order-2 point x = 0)
        }
        // doubling: lam = x + y/x
        f2m_inv(f, A->x, t);
        f2m_mul(f, A->y, t, lam);
        for (int i = 0; i < f->nw; i++) lam[i] ^= A->x[i];
        f2m_sqr(f, lam, x3);
        for (int i = 0; i < f->nw; i++) x3[i] ^= lam[i] ^ c->a[i];
        // y3 = x^2 + (lam + 1) * x3
        f2m_sqr(f, A->x, y3);
        u64 l1[MAXW];
        memcpy(l1, lam, 8 * f->nw);
        l1[0] ^= 1;
        f2m_mul(f, l1, x3, t);
        for (int i = 0; i < f->nw; i++) y3[i] ^= t[i];
    } else {
        u64 dx[MAXW], dy[MAXW];
        for (int i = 0; i < f->nw; i++) {
            dx[i] = A->x[i] ^ B->x[i];
            dy[i] = A->y[i] ^ B->y[i];
        }
        f2m_inv(f, dx, t);
        f2m_mul(f, dy, t, lam);
        f2m_sqr(f, lam, x3);
        for (int i = 0; i < f->nw; i++)
            x3[i] ^= lam[i] ^ A->x[i] ^ B->x[i] ^ c->a[i];
        // y3 = lam*(x1 + x3) + x3 + y1
        for (int i = 0; i < f->nw; i++) t[i] = A->x[i] ^ x3[i];
        f2m_mul(f, lam, t, y3);
        for (int i = 0; i < f->nw; i++) y3[i] ^= x3[i] ^ A->y[i];
    }
    memcpy(R->x, x3, 8 * f->nw);
    memcpy(R->y, y3, 8 * f->nw);
    R->inf = 0;
}

static void ec_neg(const Curve* c, const AP* A, AP* R) {
    *R = *A;
    if (!A->inf)
        for (int i = 0; i < c->f.nw; i++) R->y[i] ^= A->x[i];
}

// ---------------------------------------------------------------------------
// Lopez-Dahab projective coordinates (x = X/Z, y = Y/Z^2): inversion-free
// double (~4M+4S) and mixed add (~8M+5S) -- the affine law pays one
// Itoh-Tsujii inversion (m squarings) PER group operation, which dominated
// the first native measurement. NIST binary curves have a in {0, 1}, which
// the formulas exploit (general a falls back to an extra multiply).
// ---------------------------------------------------------------------------

struct LP {
    u64 X[MAXW], Y[MAXW], Z[MAXW];
    int inf;
};

static void lp_set_inf(LP* p) { p->inf = 1; }

static int curve_a01(const Curve* c) {
    // 0, 1, or -1 for a general a
    u64 rest = 0;
    for (int i = 1; i < c->f.nw; i++) rest |= c->a[i];
    if (rest) return -1;
    if (c->a[0] == 0) return 0;
    if (c->a[0] == 1) return 1;
    return -1;
}

static void lp_from_ap(const Curve* c, const AP* A, LP* R) {
    if (A->inf) { lp_set_inf(R); return; }
    memcpy(R->X, A->x, 8 * c->f.nw);
    memcpy(R->Y, A->y, 8 * c->f.nw);
    memset(R->Z, 0, 8 * c->f.nw);
    R->Z[0] = 1;
    R->inf = 0;
}

// HMV "Guide to ECC" Alg 3.24: LD doubling
static void ld_double(const Curve* c, const LP* P, LP* R) {
    const F2m* f = &c->f;
    if (P->inf || f2m_is_zero(f, P->X)) { lp_set_inf(R); return; }
    int a01 = curve_a01(c);
    u64 T1[MAXW], T2[MAXW], X3[MAXW], Y3[MAXW], Z3[MAXW];
    f2m_sqr(f, P->Z, T1);            // Z1^2
    f2m_sqr(f, P->X, T2);            // X1^2
    f2m_mul(f, T1, T2, Z3);          // Z3 = X1^2 Z1^2
    f2m_sqr(f, T2, X3);              // X1^4
    f2m_sqr(f, T1, T1);              // Z1^4
    f2m_mul(f, T1, c->b, T2);        // b Z1^4
    for (int i = 0; i < f->nw; i++) X3[i] ^= T2[i];  // X3 = X1^4 + b Z1^4
    f2m_sqr(f, P->Y, T1);            // Y1^2
    if (a01 == 1) {
        for (int i = 0; i < f->nw; i++) T1[i] ^= Z3[i];
    } else if (a01 == -1) {
        u64 az[MAXW];
        f2m_mul(f, c->a, Z3, az);
        for (int i = 0; i < f->nw; i++) T1[i] ^= az[i];
    }
    for (int i = 0; i < f->nw; i++) T1[i] ^= T2[i];  // aZ3 + Y1^2 + bZ1^4
    f2m_mul(f, X3, T1, Y3);
    f2m_mul(f, T2, Z3, T1);          // bZ1^4 * Z3
    for (int i = 0; i < f->nw; i++) Y3[i] ^= T1[i];
    memcpy(R->X, X3, 8 * f->nw);
    memcpy(R->Y, Y3, 8 * f->nw);
    memcpy(R->Z, Z3, 8 * f->nw);
    R->inf = 0;
}

// HMV Alg 3.25: mixed LD + affine addition
static void ld_madd(const Curve* c, const LP* P, const AP* Q, LP* R) {
    const F2m* f = &c->f;
    if (Q->inf) { *R = *P; return; }
    if (P->inf) { lp_from_ap(c, Q, R); return; }
    int a01 = curve_a01(c);
    u64 A_[MAXW], B_[MAXW], C_[MAXW], T1[MAXW], T2[MAXW], T3[MAXW];
    u64 X3[MAXW], Y3[MAXW], Z3[MAXW];
    f2m_mul(f, P->Z, Q->x, T1);      // x2 Z1
    f2m_sqr(f, P->Z, T2);            // Z1^2
    for (int i = 0; i < f->nw; i++) A_[i] = P->X[i] ^ T1[i];
    f2m_mul(f, P->Z, A_, C_);        // C = Z1 A
    f2m_mul(f, T2, Q->y, T3);        // y2 Z1^2
    for (int i = 0; i < f->nw; i++) B_[i] = P->Y[i] ^ T3[i];
    if (f2m_is_zero(f, A_)) {
        if (f2m_is_zero(f, B_)) {
            LP Qp;
            lp_from_ap(c, Q, &Qp);
            ld_double(c, &Qp, R);
        } else {
            lp_set_inf(R);
        }
        return;
    }
    f2m_sqr(f, C_, Z3);              // Z3 = C^2
    u64 CB[MAXW];
    f2m_mul(f, C_, B_, CB);          // C B
    if (a01 == 1) {
        for (int i = 0; i < f->nw; i++) C_[i] ^= T2[i];  // C + a Z1^2
    } else if (a01 == -1) {
        u64 az[MAXW];
        f2m_mul(f, c->a, T2, az);
        for (int i = 0; i < f->nw; i++) C_[i] ^= az[i];
    }
    f2m_sqr(f, A_, T2);              // A^2
    f2m_mul(f, T2, C_, X3);          // A^2 (C + a Z1^2)
    f2m_sqr(f, B_, T2);              // B^2
    for (int i = 0; i < f->nw; i++) X3[i] ^= T2[i] ^ CB[i];
    f2m_mul(f, Q->x, Z3, T2);        // x2 Z3
    for (int i = 0; i < f->nw; i++) T2[i] ^= X3[i];
    f2m_sqr(f, Z3, T1);              // Z3^2
    for (int i = 0; i < f->nw; i++) T3[i] = CB[i] ^ Z3[i];
    f2m_mul(f, T3, T2, Y3);
    for (int i = 0; i < f->nw; i++) T2[i] = Q->x[i] ^ Q->y[i];
    f2m_mul(f, T1, T2, T3);
    for (int i = 0; i < f->nw; i++) Y3[i] ^= T3[i];
    memcpy(R->X, X3, 8 * f->nw);
    memcpy(R->Y, Y3, 8 * f->nw);
    memcpy(R->Z, Z3, 8 * f->nw);
    R->inf = 0;
}

// batch LP -> affine with ONE inversion (Montgomery simultaneous inversion)
static void lp_batch_to_ap(const Curve* c, const LP* Ps, int64_t n, AP* out) {
    const F2m* f = &c->f;
    u64* pref = new u64[(size_t)(n + 1) * MAXW];
    int64_t* act = new int64_t[n];
    int64_t na = 0;
    memset(pref, 0, 8 * MAXW);
    pref[0] = 1;
    for (int64_t i = 0; i < n; i++) {
        if (Ps[i].inf || f2m_is_zero(f, Ps[i].Z)) {
            ap_set_inf(&out[i]);
            continue;
        }
        f2m_mul(f, pref + na * MAXW, Ps[i].Z, pref + (na + 1) * MAXW);
        act[na++] = i;
    }
    if (na) {
        u64 inv_all[MAXW];
        f2m_inv(f, pref + na * MAXW, inv_all);
        for (int64_t j = na - 1; j >= 0; j--) {
            int64_t i = act[j];
            u64 zi[MAXW], zi2[MAXW];
            f2m_mul(f, inv_all, pref + j * MAXW, zi);   // 1/Z_i
            f2m_mul(f, inv_all, Ps[i].Z, inv_all);      // strip Z_i
            f2m_mul(f, Ps[i].X, zi, out[i].x);          // x = X/Z
            f2m_sqr(f, zi, zi2);
            f2m_mul(f, Ps[i].Y, zi2, out[i].y);         // y = Y/Z^2
            out[i].inf = 0;
        }
    }
    delete[] pref;
    delete[] act;
}

// width-4 window scalar mult in LD coordinates; result in LD (batch-convert)
static void ec_mul_ld(const Curve* c, const AP* P, const u64* k,
                      int kw, LP* R) {
    // affine window table via LD adds + one batched inversion
    LP tl[16];
    AP tbl[16];
    lp_set_inf(&tl[0]);
    lp_from_ap(c, P, &tl[1]);
    for (int i = 2; i < 16; i++) ld_madd(c, &tl[i - 1], P, &tl[i]);
    lp_batch_to_ap(c, tl, 16, tbl);
    lp_set_inf(R);
    int started = 0;
    for (int limb = kw - 1; limb >= 0; limb--) {
        for (int nib = 15; nib >= 0; nib--) {
            int d = (int)((k[limb] >> (4 * nib)) & 0xF);
            if (started) {
                ld_double(c, R, R);
                ld_double(c, R, R);
                ld_double(c, R, R);
                ld_double(c, R, R);
            }
            if (d) {
                ld_madd(c, R, &tbl[d], R);
                started = 1;
            }
        }
    }
}

static void curve_init(Curve* c, int m, const int64_t* red, int n_red,
                       const u64* a, const u64* b, int nw) {
    memset(c, 0, sizeof(*c));
    c->f.m = m;
    c->f.nw = nw;
    c->f.n_red = n_red;
    for (int i = 0; i < n_red; i++) c->f.red[i] = (int)red[i];
    memcpy(c->a, a, 8 * nw);
    memcpy(c->b, b, 8 * nw);
}

static void load_ap(const Curve* c, const u64* xy, int inf, AP* P) {
    if (inf) { ap_set_inf(P); return; }
    memcpy(P->x, xy, 8 * c->f.nw);
    memcpy(P->y, xy + c->f.nw, 8 * c->f.nw);
    P->inf = 0;
}

static void store_ap(const Curve* c, const AP* P, u64* xy, uint8_t* inf) {
    if (P->inf) {
        *inf = 1;
        memset(xy, 0, 16 * c->f.nw);
        return;
    }
    *inf = 0;
    memcpy(xy, P->x, 8 * c->f.nw);
    memcpy(xy + c->f.nw, P->y, 8 * c->f.nw);
}

// Fixed-base comb for shared-base batches (same rationale as nhpsi_ec.cpp);
// rows are built in LD coordinates and batch-converted (one inversion per
// window row) so table construction never pays per-add inversions.
static void fixed_base_batch(const Curve* c, const AP* B, const u64* scalars,
                             int64_t n, int nw, LP* Rs) {
    const int w = n >= 1024 ? 8 : (n >= 128 ? 6 : 4);
    const int nwin = (64 * nw + w - 1) / w;
    const int tsz = 1 << w;
    AP* T = new AP[(size_t)nwin * tsz];
    LP* row_ld = new LP[tsz];
    AP base = *B;
    for (int i = 0; i < nwin; i++) {
        AP* row = T + (size_t)i * tsz;
        lp_set_inf(&row_ld[0]);
        lp_from_ap(c, &base, &row_ld[1]);
        for (int d = 2; d < tsz; d++)
            ld_madd(c, &row_ld[d - 1], &base, &row_ld[d]);
        // next window base = 2^w * base (LD doubles + join the batch conv)
        LP nb = row_ld[1];
        for (int b = 0; b < w; b++) ld_double(c, &nb, &nb);
        lp_batch_to_ap(c, row_ld, tsz, row);
        LP nb1[1] = {nb};
        AP nba[1];
        lp_batch_to_ap(c, nb1, 1, nba);
        base = nba[0];
    }
    for (int64_t s = 0; s < n; s++) {
        const u64* k = scalars + nw * s;
        LP* R = &Rs[s];
        lp_set_inf(R);
        for (int i = 0; i < nwin; i++) {
            int bit0 = w * i;
            int limb = bit0 >> 6, off = bit0 & 63;
            u64 d = k[limb] >> off;
            if (off + w > 64 && limb + 1 < nw) d |= k[limb + 1] << (64 - off);
            d &= (u64)(tsz - 1);
            if (d) ld_madd(c, R, &T[(size_t)i * tsz + d], R);
        }
    }
    delete[] row_ld;
    delete[] T;
}

extern "C" {

// out[i] = scalars[i] * base[i] (shared_base: base[0] + comb for all)
int ec2m_mul_batch(
    int m, const int64_t* red, int n_red, int n_limbs, const u64* a,
    const u64* b, int shared_base, const u64* base_xy,
    const uint8_t* base_inf, const u64* scalars, int64_t n,
    u64* out_xy, uint8_t* out_inf)
{
    if (n_limbs > MAXW) return -1;
    Curve c;
    curve_init(&c, m, red, n_red, a, b, n_limbs);
    AP B;
    LP* Rs = new LP[n];
    AP* Ra = new AP[n];
    if (shared_base) {
        load_ap(&c, base_xy, base_inf[0], &B);
        if (!B.inf && n >= 16) {
            fixed_base_batch(&c, &B, scalars, n, n_limbs, Rs);
            lp_batch_to_ap(&c, Rs, n, Ra);
            for (int64_t i = 0; i < n; i++)
                store_ap(&c, &Ra[i], out_xy + 2 * n_limbs * i, out_inf + i);
            delete[] Rs;
            delete[] Ra;
            return 0;
        }
    }
    for (int64_t i = 0; i < n; i++) {
        const u64* k = scalars + n_limbs * i;
        if (!shared_base) load_ap(&c, base_xy + 2 * n_limbs * i, base_inf[i], &B);
        u64 any = 0;
        for (int j = 0; j < n_limbs; j++) any |= k[j];
        if (B.inf || !any) lp_set_inf(&Rs[i]);
        else ec_mul_ld(&c, &B, k, n_limbs, &Rs[i]);
    }
    lp_batch_to_ap(&c, Rs, n, Ra);
    for (int64_t i = 0; i < n; i++)
        store_ap(&c, &Ra[i], out_xy + 2 * n_limbs * i, out_inf + i);
    delete[] Rs;
    delete[] Ra;
    return 0;
}

// out[g] = sum_j scalars[g*k+j] * pts[g*k+j]
int ec2m_multi_mul_batch(
    int m, const int64_t* red, int n_red, int n_limbs, const u64* a,
    const u64* b, int64_t n_groups, int64_t k, const u64* pts_xy,
    const uint8_t* pts_inf, const u64* scalars, u64* out_xy, uint8_t* out_inf)
{
    if (n_limbs > MAXW) return -1;
    Curve c;
    curve_init(&c, m, red, n_red, a, b, n_limbs);
    LP* Rs = new LP[n_groups];
    AP* Ra = new AP[n_groups];
    LP* terms = new LP[k];
    AP* terms_a = new AP[k];
    for (int64_t g = 0; g < n_groups; g++) {
        int64_t nt = 0;
        for (int64_t j = 0; j < k; j++) {
            const u64* s = scalars + n_limbs * (g * k + j);
            u64 any = 0;
            for (int i = 0; i < n_limbs; i++) any |= s[i];
            if (pts_inf[g * k + j] || !any) continue;
            AP P;
            load_ap(&c, pts_xy + 2 * n_limbs * (g * k + j), 0, &P);
            ec_mul_ld(&c, &P, s, n_limbs, &terms[nt++]);
        }
        // one simultaneous inversion for all k terms, then LD accumulation
        lp_batch_to_ap(&c, terms, nt, terms_a);
        LP* R = &Rs[g];
        lp_set_inf(R);
        for (int64_t j = 0; j < nt; j++) ld_madd(&c, R, &terms_a[j], R);
    }
    lp_batch_to_ap(&c, Rs, n_groups, Ra);
    for (int64_t g = 0; g < n_groups; g++)
        store_ap(&c, &Ra[g], out_xy + 2 * n_limbs * g, out_inf + g);
    delete[] terms;
    delete[] terms_a;
    delete[] Rs;
    delete[] Ra;
    return 0;
}

// out[g] = sum_j pts[g*k+j]
int ec2m_sum_batch(
    int m, const int64_t* red, int n_red, int n_limbs, const u64* a,
    const u64* b, int64_t n_groups, int64_t k, const u64* pts_xy,
    const uint8_t* pts_inf, u64* out_xy, uint8_t* out_inf)
{
    if (n_limbs > MAXW) return -1;
    Curve c;
    curve_init(&c, m, red, n_red, a, b, n_limbs);
    LP* Rs = new LP[n_groups];
    AP* Ra = new AP[n_groups];
    for (int64_t g = 0; g < n_groups; g++) {
        LP* R = &Rs[g];
        lp_set_inf(R);
        for (int64_t j = 0; j < k; j++) {
            AP P;
            load_ap(&c, pts_xy + 2 * n_limbs * (g * k + j),
                    pts_inf[g * k + j], &P);
            ld_madd(&c, R, &P, R);
        }
    }
    lp_batch_to_ap(&c, Rs, n_groups, Ra);
    for (int64_t g = 0; g < n_groups; g++)
        store_ap(&c, &Ra[g], out_xy + 2 * n_limbs * g, out_inf + g);
    delete[] Rs;
    delete[] Ra;
    return 0;
}

}  // extern "C"
