"""RNS basis extension (HPS-style fast base conversion).

The building block OpenFHE's BFVRNS multiplication uses to move ciphertext
polynomials between RNS bases (reference call sites: every EvalMult in
BatchedFHEHIPPIE.cpp:101-126 runs over DCRTPoly, whose ct x ct path extends
q -> q u B, tensor-multiplies, scales by t/q and converts back). The scheme
layer's textbook BFV ct x ct is built from these pieces via BFVMulConverter
below; BasisExtension is the standalone conversion kernel: given x as
residues over source base q = {q_1..q_L}, produce its residues over a
disjoint base B = {b_1..b_K}.

Math: with y_i = [x_i * (q/q_i)^{-1}]_{q_i},

    x = sum_i y_i * (q/q_i) - v*q,   v = round(sum_i y_i / q_i)

so  [x]_{b_j} = sum_i y_i * [(q/q_i)]_{b_j} - v * [q]_{b_j}.

The overflow count v is computed in floating point (float64 on CPU hosts,
float32 on TPU); a boundary miss adds +-q to the represented integer, which
HPS's noise analysis absorbs (multiples of q become multiples of t after the
t/q scale-and-round -- small additive noise). Pass correction=False for the
lazy variant that skips v entirely (x + u*q for u in [0, L), cheaper, same
noise argument).

All multiplications here have a precomputed constant operand, so they run as
Shoup multiplies (ops.modmath.shoup_mul: one mulhi + two low multiplies,
~40% cheaper than Montgomery's two mulhi) -- this glue is the dominant VPU
cost of the HPS ct x ct (measured: benchmarks/profile_online.py hps).
Shoup's bound holds for ANY x < 2**32, so residues of one prime feed
multiplies mod another with no cross-prime pre-reduction pass.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from nested_hashing_psi_tpu.ops.modmath import (
    U32,
    add_mod,
    modsum,
    mont_constants,
    shoup_host,
    shoup_mul,
    sub_mod,
)


def _shoup_pair(vals: np.ndarray, ps: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(w, floor(w * 2**32 / p)) as uint32 arrays; vals/ps broadcastable."""
    w = np.asarray(vals, np.uint64)
    p = np.asarray(ps, np.uint64)
    wq = (w << np.uint64(32)) // p
    return w.astype(np.uint32), wq.astype(np.uint32)


class BasisExtension:
    """Fast base conversion from RNS base `src` to disjoint base `dst`."""

    def __init__(self, src_primes, dst_primes):
        src = [int(p) for p in src_primes]
        dst = [int(p) for p in dst_primes]
        assert not set(src) & set(dst), "bases must be disjoint"
        self.src_primes, self.dst_primes = tuple(src), tuple(dst)
        L, K = len(src), len(dst)
        q = 1
        for p in src:
            q *= p
        self.q = q

        src_a = np.array(src, np.uint32).reshape(L, 1)
        dst_a = np.array(dst, np.uint32).reshape(K, 1)
        self.src_p = jnp.asarray(src_a)
        self.dst_p = jnp.asarray(dst_a)

        # [ (q/q_i)^{-1} ]_{q_i}, shaped (L, 1)
        self.qhat_inv = _shoup_pair(
            np.array([pow(q // p, -1, p) for p in src], np.uint64).reshape(L, 1),
            src_a,
        )
        # [(q/q_i)]_{b_j}, shaped (L, K, 1)
        qhat_mod_b = np.zeros((L, K, 1), np.uint64)
        for i, p in enumerate(src):
            for j, b in enumerate(dst):
                qhat_mod_b[i, j, 0] = (q // p) % b
        self.qhat_mod_b = _shoup_pair(qhat_mod_b, dst_a[None])
        self.q_mod_b = _shoup_pair(
            np.array([q % b for b in dst], np.uint64).reshape(K, 1), dst_a
        )
        # float reciprocal table; dtype picked at call time (float64 needs
        # jax_enable_x64, which the CPU test config sets; TPU uses float32)
        self._inv_src_np = np.array([1.0 / p for p in src]).reshape(L, 1)

    def convert(self, x: jnp.ndarray, correction: bool = True) -> jnp.ndarray:
        """(..., L, N) uint32 coefficient-domain residues over src ->
        (..., K, N) over dst. Exact up to a possible +-q boundary miss
        (correction=True) or +u*q, u in [0, L) (correction=False)."""
        A = jnp.asarray
        y = shoup_mul(x, A(self.qhat_inv[0]), A(self.qhat_inv[1]), self.src_p)
        # contraction: sum_i y_i * qhat_i  mod b_j (y_i < 2**31: Shoup needs
        # no cross-prime pre-reduction)
        terms = shoup_mul(
            y[..., :, None, :],
            A(self.qhat_mod_b[0]),
            A(self.qhat_mod_b[1]),
            self.dst_p,
        )
        acc = modsum(terms, self.dst_p, axis=-3)  # (..., K, N)
        if not correction:
            return acc
        fdtype = jnp.zeros(0, jnp.float64).dtype  # float64 iff x64 enabled
        inv = jnp.asarray(self._inv_src_np, fdtype)
        v = jnp.round(jnp.sum(y.astype(fdtype) * inv, axis=-2)).astype(U32)
        vq = shoup_mul(
            v[..., None, :], A(self.q_mod_b[0]), A(self.q_mod_b[1]), self.dst_p
        )
        return sub_mod(acc, vq, self.dst_p)


class RNSRescale:
    """Exact RNS drop-limb rescale in coefficient domain (BFV mod switch).

    c' = (c - [c]_{qd})/qd over the kept base, qd = product of the dropped
    trailing primes, [c]_{qd} the *centered* residue -- the scale-invariant
    modulus switch OpenFHE's BFVRNS ModReduce performs. For a BFV phase
    Delta*m + e this yields Delta'*m + e' with
    e' ~ e/qd + delta*m + (r0 + r1*s)/qd, |delta| < 1, so the noise floor
    after a switch is ~|m| + n/2 (~t * small): see fhe.params.bfv_mul_limbs
    for the budget model.

    The centered residue over the kept primes is reconstructed CRT-style
    from the dropped limbs: y_i = [r_i * (qd/qd_i)^{-1}]_{qd_i},
    [c]_{qd} = sum_i y_i*(qd/qd_i) - v*qd with v = floor(sum_i y_i/qd_i)
    (float); centering subtracts one more qd when frac > 1/2. A float
    boundary miss moves c' by +-1 -- one ulp of rounding noise.
    """

    def __init__(self, src_primes, n_drop: int):
        src = [int(p) for p in src_primes]
        assert 1 <= n_drop < len(src)
        keep, drop = src[:-n_drop], src[-n_drop:]
        self.keep_primes, self.drop_primes = tuple(keep), tuple(drop)
        Lk, Ld = len(keep), len(drop)
        self.n_drop = n_drop
        qd = math.prod(drop)

        keep_a = np.array(keep, np.uint32).reshape(Lk, 1)
        drop_a = np.array(drop, np.uint32).reshape(Ld, 1)
        self.p_keep = keep_a
        self.p_drop = drop_a
        self.qdhat_inv = _shoup_pair(
            np.array(
                [pow(qd // p, -1, p) for p in drop], np.uint64
            ).reshape(Ld, 1),
            drop_a,
        )
        qdhat_mod_k = np.zeros((Ld, Lk, 1), np.uint64)
        for i, p in enumerate(drop):
            for j, b in enumerate(keep):
                qdhat_mod_k[i, j, 0] = (qd // p) % b
        self.qdhat_mod_k = _shoup_pair(qdhat_mod_k, keep_a[None])
        self.qd_mod_k = _shoup_pair(
            np.array([qd % b for b in keep], np.uint64).reshape(Lk, 1), keep_a
        )
        self.qdinv_mod_k = _shoup_pair(
            np.array(
                [pow(qd % b, -1, b) for b in keep], np.uint64
            ).reshape(Lk, 1),
            keep_a,
        )
        self._inv_drop_np = np.array([1.0 / p for p in drop]).reshape(Ld, 1)

    def rescale(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """(..., L, N) coefficient-domain residues -> (..., L - n_drop, N)."""
        A = jnp.asarray
        Lk = len(self.keep_primes)
        p_k = A(self.p_keep)
        c_keep = coeffs[..., :Lk, :]
        r = coeffs[..., Lk:, :]
        w, wq = A(self.qdhat_inv[0]), A(self.qdhat_inv[1])
        y = shoup_mul(r, w, wq, A(self.p_drop))
        w, wq = A(self.qdhat_mod_k[0]), A(self.qdhat_mod_k[1])
        terms = shoup_mul(y[..., :, None, :], w, wq, p_k)  # (..., Ld, Lk, N)
        acc = modsum(terms, p_k, axis=-3)
        fdtype = jnp.zeros(0, jnp.float64).dtype
        s = jnp.sum(y.astype(fdtype) * jnp.asarray(self._inv_drop_np, fdtype), axis=-2)
        v = jnp.floor(s)
        corr = (v + (s - v > 0.5)).astype(U32)  # v + centering, < Ld + 1
        w, wq = A(self.qd_mod_k[0]), A(self.qd_mod_k[1])
        r_c = sub_mod(acc, shoup_mul(corr[..., None, :], w, wq, p_k), p_k)
        w, wq = A(self.qdinv_mod_k[0]), A(self.qdinv_mod_k[1])
        return shoup_mul(sub_mod(c_keep, r_c, p_k), w, wq, p_k)


class BFVMulConverter:
    """RNS machinery for *textbook* HPS-style BFV ct x ct multiplication.

    Replaces the reference's OpenFHE BFVRNS EvalMult internals (the ct x ct
    across hash functions in BatchedFHEHIPPIE.cpp:116-125 runs over DCRTPoly,
    which extends q -> q u B, tensor-multiplies, scales by t/q with rounding
    and converts back). Three pieces, all uint32 VPU work:

      1. ``extend_q_to_aux`` -- fast base conversion of ciphertext
         coefficients from q = {q_1..q_L} to the auxiliary base
         aux = {b_1..b_K, m_r}. The overflow count v is float-corrected; a
         boundary miss leaves the operand off by +-q, which after the t/q
         scale-and-round becomes a multiple of t on the result -- i.e.
         *noise* of size ~t*(e + m), absorbed by the budget. float32 on TPU
         is therefore safe here.
      2. ``scale_round`` -- y = round(t * d / q) over aux from d's residues
         over q (for r = [t*d]_q, centered) and over aux:
         y = (t*d - r) * q^{-1} per aux residue (exact integer division).
         A float miss in r's conversion costs +-1 on y: rounding noise.
      3. ``exact_to_q`` -- the one direction where a conversion miss would be
         catastrophic (+-B mod q on a ciphertext coefficient), so it is
         *integer-exact*: Shenoy-Kumaresan conversion using the redundant
         modulus m_r carried through the whole pipeline. With
         y+ = y + B//2 in [0, B) and z_i = [y+ * (B/b_i)^{-1}]_{b_i},
         y+ = sum_i z_i*(B/b_i) - u*B where u = [(sum_i z_i*(B/b_i) - y+)
         * B^{-1}]_{m_r} is exact because 0 <= u < K < m_r.

    Aux base sizing: corrected-extension operands are centered up to a rare
    float miss, so |operand| <= 3q/2 and each tensor coefficient satisfies
    |d| <= n*(3q/2)^2, giving |y| = |round(t*d/q)| <= (9/4)*t*n*q. B must
    exceed 2*|y| for the exact Shenoy-Kumaresan return trip; it is grown
    until B > 9*t*n*q (a 2x margin over that bound).

    All multiplies are by precomputed constants -> Shoup form (see module
    docstring). Constants are stored as NumPy arrays and lifted with
    jnp.asarray at call time: a converter built lazily inside one jit trace
    never leaks trace constants into another (see BGVContext.automorphism
    for the same pattern).
    """

    def __init__(self, q_primes, t: int, ring_dim: int):
        from nested_hashing_psi_tpu.ops.ntt import NTTPlan
        from nested_hashing_psi_tpu.ops.primes import ntt_primes

        q_list = [int(p) for p in q_primes]
        L, n, t = len(q_list), int(ring_dim), int(t)
        q = math.prod(q_list)
        self.q_primes, self.t, self.n = tuple(q_list), t, n

        need = 9 * t * n * q  # 2x margin over the worst-case 2*|y| (see doc)
        K = max(1, (need.bit_length() + 30) // 31)
        while True:
            aux = ntt_primes(K + 1, 31, 2 * n, avoid=tuple(q_list) + (t,))
            B = math.prod(aux[:K])
            if B > need:
                break
            K += 1
        self.aux_primes = aux  # b_1..b_K, m_r  (m_r last)
        self.K, self.B = K, B
        m_r = aux[K]
        assert m_r > K + 1
        self.plan_aux = NTTPlan(n, aux)

        KA = K + 1  # aux limb count incl. m_r

        # --- source (q) side constants -------------------------------------
        q_a = np.array(q_list, np.uint32).reshape(L, 1)
        aux_a = np.array(aux, np.uint32).reshape(KA, 1)
        self.p_q = q_a
        self.p_aux = aux_a
        self.pinv_aux = np.array(
            [mont_constants(b)[0] for b in aux], np.uint32
        ).reshape(KA, 1)
        self.r2_aux = np.array(
            [mont_constants(b)[1] for b in aux], np.uint32
        ).reshape(KA, 1)
        self.qhat_inv_q = _shoup_pair(
            np.array([pow(q // p, -1, p) for p in q_list], np.uint64).reshape(L, 1),
            q_a,
        )
        self.t_q = _shoup_pair(
            np.array([t % p for p in q_list], np.uint64).reshape(L, 1), q_a
        )
        self.inv_q_f = np.array([1.0 / p for p in q_list]).reshape(L, 1)

        # --- aux side constants --------------------------------------------
        qhat_mod_aux = np.zeros((L, KA, 1), np.uint64)
        for i, p in enumerate(q_list):
            for j, b in enumerate(aux):
                qhat_mod_aux[i, j, 0] = (q // p) % b
        self.qhat_mod_aux = _shoup_pair(qhat_mod_aux, aux_a[None])
        self.q_mod_aux = _shoup_pair(
            np.array([q % b for b in aux], np.uint64).reshape(KA, 1), aux_a
        )
        self.t_aux = _shoup_pair(
            np.array([t % b for b in aux], np.uint64).reshape(KA, 1), aux_a
        )
        self.qinv_aux = _shoup_pair(
            np.array([pow(q % b, -1, b) for b in aux], np.uint64).reshape(KA, 1),
            aux_a,
        )

        # --- Shenoy-Kumaresan (aux -> q, exact via m_r) ---------------------
        c = B >> 1  # centering offset: y + c in [0, B)
        self.c_mod_aux = np.array([c % b for b in aux], np.uint32).reshape(KA, 1)
        self.c_mod_q = np.array([c % p for p in q_list], np.uint32).reshape(L, 1)
        bs = aux[:K]
        b_a = np.array(bs, np.uint32).reshape(K, 1)
        self.p_b = b_a
        self.bhat_inv = _shoup_pair(
            np.array([pow(B // b, -1, b) for b in bs], np.uint64).reshape(K, 1),
            b_a,
        )
        bhat_mod_q = np.zeros((K, L, 1), np.uint64)
        for i, b in enumerate(bs):
            for j, p in enumerate(q_list):
                bhat_mod_q[i, j, 0] = (B // b) % p
        self.bhat_mod_q = _shoup_pair(bhat_mod_q, q_a[None])
        self.bhat_mod_mr = _shoup_pair(
            np.array([(B // b) % m_r for b in bs], np.uint64).reshape(K, 1),
            np.uint64(m_r),
        )
        self.B_mod_q = _shoup_pair(
            np.array([B % p for p in q_list], np.uint64).reshape(L, 1), q_a
        )
        self.Binv_mr = (
            np.uint32(pow(B % m_r, -1, m_r)),
            np.uint32(shoup_host(pow(B % m_r, -1, m_r), m_r)),
        )
        self.p_mr = np.uint32(m_r)

    # -- jnp views of the numpy constants (fresh per trace, see class doc) --
    @staticmethod
    def _a(x):
        return jnp.asarray(x)

    def _sh(self, pair):
        return jnp.asarray(pair[0]), jnp.asarray(pair[1])

    def extend_q_to_aux(self, x: jnp.ndarray, correction: bool = True) -> jnp.ndarray:
        """(..., L, N) coefficient-domain residues over q -> (..., K+1, N)
        over aux, centered representative up to a rare +-q float miss.
        correction=False skips the float overflow count: the result is
        x + u*q for some u in [0, L) -- cheaper, for call sites whose
        downstream math absorbs multiples of q (see scale_round)."""
        A = self._a
        p_q, p_aux = A(self.p_q), A(self.p_aux)
        w, wq = self._sh(self.qhat_inv_q)
        y = shoup_mul(x, w, wq, p_q)
        w, wq = self._sh(self.qhat_mod_aux)
        terms = shoup_mul(y[..., :, None, :], w, wq, p_aux)  # (..., L, K+1, N)
        acc = modsum(terms, p_aux, axis=-3)
        if not correction:
            return acc
        fdtype = jnp.zeros(0, jnp.float64).dtype  # f64 iff x64 enabled
        v = jnp.round(
            jnp.sum(y.astype(fdtype) * jnp.asarray(self.inv_q_f, fdtype), axis=-2)
        ).astype(U32)
        w, wq = self._sh(self.q_mod_aux)
        vq = shoup_mul(v[..., None, :], w, wq, p_aux)
        return sub_mod(acc, vq, p_aux)

    def scale_round(self, d_q: jnp.ndarray, d_aux: jnp.ndarray) -> jnp.ndarray:
        """y = round(t*d/q): d_q (..., L, N) and d_aux (..., K+1, N) are d's
        coefficient-domain residues; returns y over aux (..., K+1, N).

        The r = [t*d]_q extension is LAZY (correction=False): an overshoot
        of u*q on r, u in [0, L), shifts y by exactly -u -- ~3 bits of
        pre-relinearization rounding noise, absorbed by the same budget term
        as the +-1 float miss it replaces (and |y| grows by < L, far inside
        the aux base's 2x margin)."""
        A = self._a
        p_aux = A(self.p_aux)
        w, wq = self._sh(self.t_q)
        r = shoup_mul(d_q, w, wq, A(self.p_q))
        r_aux = self.extend_q_to_aux(r, correction=False)
        w, wq = self._sh(self.t_aux)
        td = shoup_mul(d_aux, w, wq, p_aux)
        w, wq = self._sh(self.qinv_aux)
        return shoup_mul(sub_mod(td, r_aux, p_aux), w, wq, p_aux)

    def exact_to_q(self, y: jnp.ndarray) -> jnp.ndarray:
        """(..., K+1, N) residues of centered y (|y| < B/2) -> exact
        (..., L, N) residues over q (Shenoy-Kumaresan via m_r)."""
        A = self._a
        K = self.K
        p_q = A(self.p_q)
        p_mr = jnp.uint32(self.p_mr)
        yp = add_mod(y, A(self.c_mod_aux), A(self.p_aux))
        y_b, y_mr = yp[..., :K, :], yp[..., K, :]
        w, wq = self._sh(self.bhat_inv)
        z = shoup_mul(y_b, w, wq, A(self.p_b))  # (..., K, N)
        w, wq = self._sh(self.bhat_mod_q)
        acc = modsum(
            shoup_mul(z[..., :, None, :], w, wq, p_q), p_q, axis=-3
        )
        w, wq = self._sh(self.bhat_mod_mr)
        s_mr = modsum(shoup_mul(z, w, wq, p_mr), p_mr, axis=-2)
        u = shoup_mul(
            sub_mod(s_mr, y_mr, p_mr),
            jnp.uint32(self.Binv_mr[0]),
            jnp.uint32(self.Binv_mr[1]),
            p_mr,
        )  # exact overflow count, 0 <= u < K
        w, wq = self._sh(self.B_mod_q)
        uB = shoup_mul(u[..., None, :], w, wq, p_q)
        return sub_mod(sub_mod(acc, uB, p_q), A(self.c_mod_q), p_q)
