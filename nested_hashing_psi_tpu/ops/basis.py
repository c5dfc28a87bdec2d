"""RNS basis extension (HPS-style fast base conversion).

The building block OpenFHE's BFVRNS multiplication uses to move ciphertext
polynomials between RNS bases (reference call sites: every EvalMult in
BatchedFHEHIPPIE.cpp:101-126 runs over DCRTPoly, whose ct x ct path extends
q -> q u B, tensor-multiplies, scales by t/q and converts back). Here the
scheme layer's ct x ct uses the exact t-scaling bridge (fhe/bfv.py), so this
op stands alone as the conversion kernel: given x as residues over source
base q = {q_1..q_L}, produce its residues over a disjoint base B = {b_1..b_K}.

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

import numpy as np
import jax.numpy as jnp

from nested_hashing_psi_tpu.ops.modmath import (
    U32,
    modsum,
    mont_constants,
    mont_mul,
    sub_mod,
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
        y_b = y[..., :, None, :] % self.dst_p  # (..., L, K, N)
        terms = mont_mul(y_b, self.qhat_mod_b_mont, self.dst_p, self.dst_pinv)
        acc = modsum(terms, self.dst_p, axis=-3)  # (..., K, N)
        if not correction:
            return acc
        fdtype = jnp.zeros(0, jnp.float64).dtype  # float64 iff x64 enabled
        inv = jnp.asarray(self._inv_src_np, fdtype)
        v = jnp.round(jnp.sum(y.astype(fdtype) * inv, axis=-2)).astype(U32)
        vq = mont_mul(
            v[..., None, :] % self.dst_p, self.q_mod_b_mont, self.dst_p, self.dst_pinv
        )
        return sub_mod(acc, vq, self.dst_p)
