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

All arithmetic is jittable uint32 VPU work: one Montgomery mul to form y, a
(L -> K) modular contraction, and one correction multiply.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from nested_hashing_psi_tpu.ops.modmath import (
    U32,
    add_mod,
    cond_sub_mod,
    modsum,
    mont_constants,
    mont_mul,
    sub_mod,
    to_mont_host,
)


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

        # [ (q/q_i)^{-1} ]_{q_i} in Montgomery form, shaped (L, 1)
        qhat_inv = np.array(
            [(pow(q // p, -1, p) << 32) % p for p in src], np.uint32
        ).reshape(L, 1)
        self.qhat_inv_mont = jnp.asarray(qhat_inv)
        self.src_p = jnp.asarray(np.array(src, np.uint32).reshape(L, 1))
        self.src_pinv = jnp.asarray(
            np.array([mont_constants(p)[0] for p in src], np.uint32).reshape(L, 1)
        )

        # [(q/q_i)]_{b_j} in Montgomery form wrt b_j, shaped (L, K, 1)
        qhat_mod_b = np.zeros((L, K, 1), np.uint32)
        for i, p in enumerate(src):
            for j, b in enumerate(dst):
                qhat_mod_b[i, j, 0] = (((q // p) % b) << 32) % b
        self.qhat_mod_b_mont = jnp.asarray(qhat_mod_b)
        self.dst_p = jnp.asarray(np.array(dst, np.uint32).reshape(K, 1))
        self.dst_pinv = jnp.asarray(
            np.array([mont_constants(b)[0] for b in dst], np.uint32).reshape(K, 1)
        )
        q_mod_b = np.array(
            [((q % b) << 32) % b for b in dst], np.uint32
        ).reshape(K, 1)
        self.q_mod_b_mont = jnp.asarray(q_mod_b)
        # float reciprocal table; dtype picked at call time (float64 needs
        # jax_enable_x64, which the CPU test config sets; TPU uses float32)
        self._inv_src_np = np.array([1.0 / p for p in src]).reshape(L, 1)

    def convert(self, x: jnp.ndarray, correction: bool = True) -> jnp.ndarray:
        """(..., L, N) uint32 coefficient-domain residues over src ->
        (..., K, N) over dst. Exact up to a possible +-q boundary miss
        (correction=True) or +u*q, u in [0, L) (correction=False)."""
        y = mont_mul(x, self.qhat_inv_mont, self.src_p, self.src_pinv)
        # contraction: sum_i y_i * qhat_i  mod b_j
        y_b = cond_sub_mod(y[..., :, None, :], self.dst_p)  # (..., L, K, N)
        terms = mont_mul(y_b, self.qhat_mod_b_mont, self.dst_p, self.dst_pinv)
        acc = modsum(terms, self.dst_p, axis=-3)  # (..., K, N)
        if not correction:
            return acc
        fdtype = jnp.zeros(0, jnp.float64).dtype  # float64 iff x64 enabled
        inv = jnp.asarray(self._inv_src_np, fdtype)
        v = jnp.round(jnp.sum(y.astype(fdtype) * inv, axis=-2)).astype(U32)
        vq = mont_mul(
            cond_sub_mod(v[..., None, :], self.dst_p), self.q_mod_b_mont, self.dst_p, self.dst_pinv
        )
        return sub_mod(acc, vq, self.dst_p)


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

    Aux base sizing: |y| <= (9/4)*t*n*q (corrected-extension operands are
    bounded by 3q/2 even across rare misses), so B is grown until
    B > (9/2)*t*n*q with margin.

    All constants are stored as NumPy arrays and lifted with jnp.asarray at
    call time: a converter built lazily inside one jit trace never leaks
    trace constants into another (see BGVContext.automorphism for the same
    pattern).
    """

    def __init__(self, q_primes, t: int, ring_dim: int):
        from nested_hashing_psi_tpu.ops.ntt import NTTPlan
        from nested_hashing_psi_tpu.ops.primes import ntt_primes

        q_list = [int(p) for p in q_primes]
        L, n, t = len(q_list), int(ring_dim), int(t)
        q = math.prod(q_list)
        self.q_primes, self.t, self.n = tuple(q_list), t, n

        need = 9 * t * n * q * 2  # 2x margin over the worst-case 2*|y|
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
        self.p_q = np.array(q_list, np.uint32).reshape(L, 1)
        self.pinv_q = np.array(
            [mont_constants(p)[0] for p in q_list], np.uint32
        ).reshape(L, 1)
        self.qhat_inv_mont_q = np.array(
            [to_mont_host(pow(q // p, -1, p), p) for p in q_list], np.uint32
        ).reshape(L, 1)
        self.t_mont_q = np.array(
            [to_mont_host(t % p, p) for p in q_list], np.uint32
        ).reshape(L, 1)
        self.inv_q_f = np.array([1.0 / p for p in q_list]).reshape(L, 1)

        # --- aux side constants --------------------------------------------
        self.p_aux = np.array(aux, np.uint32).reshape(KA, 1)
        self.pinv_aux = np.array(
            [mont_constants(b)[0] for b in aux], np.uint32
        ).reshape(KA, 1)
        self.r2_aux = np.array(
            [mont_constants(b)[1] for b in aux], np.uint32
        ).reshape(KA, 1)
        qhat_mod_aux = np.zeros((L, KA, 1), np.uint32)
        for i, p in enumerate(q_list):
            for j, b in enumerate(aux):
                qhat_mod_aux[i, j, 0] = to_mont_host((q // p) % b, b)
        self.qhat_mod_aux_mont = qhat_mod_aux
        self.q_mod_aux_mont = np.array(
            [to_mont_host(q % b, b) for b in aux], np.uint32
        ).reshape(KA, 1)
        self.t_mont_aux = np.array(
            [to_mont_host(t % b, b) for b in aux], np.uint32
        ).reshape(KA, 1)
        self.qinv_mont_aux = np.array(
            [to_mont_host(pow(q % b, -1, b), b) for b in aux], np.uint32
        ).reshape(KA, 1)

        # --- Shenoy-Kumaresan (aux -> q, exact via m_r) ---------------------
        c = B >> 1  # centering offset: y + c in [0, B)
        self.c_mod_aux = np.array([c % b for b in aux], np.uint32).reshape(KA, 1)
        self.c_mod_q = np.array([c % p for p in q_list], np.uint32).reshape(L, 1)
        bs = aux[:K]
        self.bhat_inv_mont = np.array(
            [to_mont_host(pow(B // b, -1, b), b) for b in bs], np.uint32
        ).reshape(K, 1)
        bhat_mod_q = np.zeros((K, L, 1), np.uint32)
        for i, b in enumerate(bs):
            for j, p in enumerate(q_list):
                bhat_mod_q[i, j, 0] = to_mont_host((B // b) % p, p)
        self.bhat_mod_q_mont = bhat_mod_q
        self.bhat_mod_mr_mont = np.array(
            [to_mont_host((B // b) % m_r, m_r) for b in bs], np.uint32
        ).reshape(K, 1)
        self.B_mod_q_mont = np.array(
            [to_mont_host(B % p, p) for p in q_list], np.uint32
        ).reshape(L, 1)
        self.Binv_mont_mr = np.uint32(to_mont_host(pow(B % m_r, -1, m_r), m_r))
        self.p_mr = np.uint32(m_r)
        self.pinv_mr = np.uint32(mont_constants(m_r)[0])

    # -- jnp views of the numpy constants (fresh per trace, see class doc) --
    @staticmethod
    def _a(x):
        return jnp.asarray(x)

    def extend_q_to_aux(self, x: jnp.ndarray) -> jnp.ndarray:
        """(..., L, N) coefficient-domain residues over q -> (..., K+1, N)
        over aux, centered representative up to a rare +-q float miss."""
        A = self._a
        p_q, pinv_q = A(self.p_q), A(self.pinv_q)
        p_aux, pinv_aux = A(self.p_aux), A(self.pinv_aux)
        y = mont_mul(x, A(self.qhat_inv_mont_q), p_q, pinv_q)
        y_b = cond_sub_mod(y[..., :, None, :], p_aux)  # (..., L, K+1, N)
        terms = mont_mul(y_b, A(self.qhat_mod_aux_mont), p_aux, pinv_aux)
        acc = modsum(terms, p_aux, axis=-3)
        fdtype = jnp.zeros(0, jnp.float64).dtype  # f64 iff x64 enabled
        v = jnp.round(
            jnp.sum(y.astype(fdtype) * jnp.asarray(self.inv_q_f, fdtype), axis=-2)
        ).astype(U32)
        vq = mont_mul(
            cond_sub_mod(v[..., None, :], p_aux), A(self.q_mod_aux_mont), p_aux, pinv_aux
        )
        return sub_mod(acc, vq, p_aux)

    def scale_round(self, d_q: jnp.ndarray, d_aux: jnp.ndarray) -> jnp.ndarray:
        """y = round(t*d/q): d_q (..., L, N) and d_aux (..., K+1, N) are d's
        coefficient-domain residues; returns y over aux (..., K+1, N)."""
        A = self._a
        p_aux, pinv_aux = A(self.p_aux), A(self.pinv_aux)
        r = mont_mul(d_q, A(self.t_mont_q), A(self.p_q), A(self.pinv_q))
        r_aux = self.extend_q_to_aux(r)
        td = mont_mul(d_aux, A(self.t_mont_aux), p_aux, pinv_aux)
        return mont_mul(
            sub_mod(td, r_aux, p_aux), A(self.qinv_mont_aux), p_aux, pinv_aux
        )

    def exact_to_q(self, y: jnp.ndarray) -> jnp.ndarray:
        """(..., K+1, N) residues of centered y (|y| < B/2) -> exact
        (..., L, N) residues over q (Shenoy-Kumaresan via m_r)."""
        A = self._a
        K = self.K
        p_q, pinv_q = A(self.p_q), A(self.pinv_q)
        p_mr, pinv_mr = jnp.uint32(self.p_mr), jnp.uint32(self.pinv_mr)
        yp = add_mod(y, A(self.c_mod_aux), A(self.p_aux))
        y_b, y_mr = yp[..., :K, :], yp[..., K, :]
        p_b, pinv_b = A(self.p_aux[:K]), A(self.pinv_aux[:K])
        z = mont_mul(y_b, A(self.bhat_inv_mont), p_b, pinv_b)  # (..., K, N)
        zq = cond_sub_mod(z[..., :, None, :], p_q)  # (..., K, L, N)
        acc = modsum(
            mont_mul(zq, A(self.bhat_mod_q_mont), p_q, pinv_q), p_q, axis=-3
        )
        s_mr = modsum(
            mont_mul(cond_sub_mod(z, p_mr), A(self.bhat_mod_mr_mont), p_mr, pinv_mr),
            p_mr,
            axis=-2,
        )
        u = mont_mul(
            sub_mod(s_mr, y_mr, p_mr), jnp.uint32(self.Binv_mont_mr), p_mr, pinv_mr
        )  # exact overflow count, 0 <= u < K
        uB = mont_mul(u[..., None, :], A(self.B_mod_q_mont), p_q, pinv_q)
        return sub_mod(sub_mod(acc, uB, p_q), A(self.c_mod_q), p_q)
