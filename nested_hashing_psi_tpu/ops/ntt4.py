"""Four-step negacyclic NTT: n = m1*m2 as two batched modular matmul stages.

Bit-exact with ops.ntt (same canonical bit-reversed output order): the psi
pre-twist, the mid twiddles, and the bit-reversal permutations of both output
index halves are all absorbed into three precomputed constant matrices:

    canonical(m1 x m2) = (M1' @ A) .* T'  @ M2'^T,   A = a.reshape(m1, m2)

with   M1'[a, k1] = psi^(m2*k1) * omega^(m2 * rev_m1(a) * k1)
       T'[a, k2]  = psi^k2      * omega^(rev_m1(a) * k2)
       M2'[b, k2] = omega^(m1 * rev_m2(b) * k2)          (omega = psi^2)

This factorization is the basis for
 (a) the distributed slot/coefficient-sharded NTT (parallel/dist_ntt.py):
     stage 1 is local when the m2 axis is sharded, stage 2 is local when the
     m1 axis is sharded, with ONE all-to-all between them (the Ulysses-style
     relayout of SURVEY.md section 2.3), and
 (b) the planned MXU int8-digit matmul execution of the stages.

The matmuls here run as fori-accumulated VPU mont_muls; per element that is
O(m1 + m2) multiplies vs O(log n) for the butterfly NTT -- use ops.ntt for
single-chip transforms and this form where the structure pays for itself.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from nested_hashing_psi_tpu.ops import primes as primes_mod
from nested_hashing_psi_tpu.ops.modmath import add_mod, mont_mul, to_mont_host
from nested_hashing_psi_tpu.ops.ntt import bit_reverse_indices


def _build_matrices(n: int, m1: int, p: int) -> tuple[np.ndarray, ...]:
    """Forward + inverse constant matrices mod p, Montgomery form."""
    m2 = n // m1
    psi = primes_mod.primitive_root_of_unity(p, 2 * n)
    omega = psi * psi % p
    rev1 = bit_reverse_indices(m1)
    rev2 = bit_reverse_indices(m2)
    psi_inv = pow(psi, -1, p)
    omega_inv = pow(omega, -1, p)
    m1_inv = pow(m1, -1, p)
    m2_inv = pow(m2, -1, p)

    M1 = np.zeros((m1, m1), dtype=np.uint32)
    T = np.zeros((m1, m2), dtype=np.uint32)
    M2T = np.zeros((m2, m2), dtype=np.uint32)  # [k2, b] = M2'[b, k2]
    iM1 = np.zeros((m1, m1), dtype=np.uint32)  # [k1, a]
    iT = np.zeros((m1, m2), dtype=np.uint32)
    iM2T = np.zeros((m2, m2), dtype=np.uint32)  # [b, k2]
    for a in range(m1):
        j1 = int(rev1[a])
        for k1 in range(m1):
            M1[a, k1] = to_mont_host(
                pow(psi, m2 * k1, p) * pow(omega, m2 * j1 * k1, p) % p, p
            )
            # inverse stage: A[k1, k2] = (1/m1) sum_a psi^(-m2 k1) *
            #                omega^(-m2 rev(a) k1) * C[a, k2]
            iM1[k1, a] = to_mont_host(
                m1_inv
                * pow(psi_inv, m2 * k1, p)
                * pow(omega_inv, m2 * j1 * k1, p)
                % p,
                p,
            )
        for k2 in range(m2):
            T[a, k2] = to_mont_host(
                pow(psi, k2, p) * pow(omega, j1 * k2, p) % p, p
            )
            iT[a, k2] = to_mont_host(
                pow(psi_inv, k2, p) * pow(omega_inv, j1 * k2, p) % p, p
            )
    for b in range(m2):
        j2 = int(rev2[b])
        for k2 in range(m2):
            M2T[k2, b] = to_mont_host(pow(omega, m1 * j2 * k2, p), p)
            iM2T[b, k2] = to_mont_host(m2_inv * pow(omega_inv, m1 * j2 * k2, p) % p, p)
    return M1, T, M2T, iM1, iT, iM2T


@dataclass
class FourStepPlan:
    n: int
    primes: tuple[int, ...]
    m1: int = 0

    def __post_init__(self):
        if self.m1 == 0:
            self.m1 = 1 << ((self.n.bit_length() - 1 + 1) // 2)
        self.m2 = self.n // self.m1
        assert self.m1 * self.m2 == self.n
        mats = [np.stack(x) for x in zip(*[
            _build_matrices(self.n, self.m1, p) for p in self.primes
        ])]
        self.M1, self.T, self.M2T, self.iM1, self.iT, self.iM2T = mats
        L = len(self.primes)
        from nested_hashing_psi_tpu.ops.modmath import mont_constants

        self.p_arr = np.array(self.primes, np.uint32).reshape(L, 1, 1)
        self.pinv_arr = np.array(
            [mont_constants(p)[0] for p in self.primes], np.uint32
        ).reshape(L, 1, 1)

    @property
    def L(self) -> int:
        return len(self.primes)


def _matmul_left(M, x, p, pinv):
    """result[..., L, a, j] = sum_k M[L, a, k] * x[..., L, k, j] mod p."""
    m_out = M.shape[1]

    def body(k, acc):
        term = mont_mul(x[..., k, :][..., None, :], M[:, :, k][..., None], p, pinv)
        return add_mod(acc, term, p)

    if m_out == x.shape[-2]:
        # derive from x so shard_map's varying-axis types match in the loop
        acc = x * jnp.uint32(0)
    else:
        acc = jnp.zeros(x.shape[:-2] + (m_out, x.shape[-1]), jnp.uint32)
    return jax.lax.fori_loop(0, M.shape[2], body, acc)


def _matmul_right(x, M, p, pinv):
    """result[..., L, a, b] = sum_k x[..., L, a, k] * M[L, k, b] mod p."""
    m_out = M.shape[2]

    def body(k, acc):
        term = mont_mul(x[..., k][..., None], M[:, k, :][:, None, :], p, pinv)
        return add_mod(acc, term, p)

    if m_out == x.shape[-1]:
        acc = x * jnp.uint32(0)
    else:
        acc = jnp.zeros(x.shape[:-1] + (m_out,), jnp.uint32)
    return jax.lax.fori_loop(0, M.shape[1], body, acc)


def ntt4(x, plan: FourStepPlan):
    """Forward four-step NTT, bit-exact with ops.ntt.ntt. x: (..., L, n)."""
    L, m1, m2 = plan.L, plan.m1, plan.m2
    bshape = x.shape[:-2]
    X = x.reshape(*bshape, L, m1, m2)
    p = jnp.asarray(plan.p_arr)
    pinv = jnp.asarray(plan.pinv_arr)
    C = _matmul_left(jnp.asarray(plan.M1), X, p, pinv)
    D = mont_mul(C, jnp.asarray(plan.T), p, pinv)
    out = _matmul_right(D, jnp.asarray(plan.M2T), p, pinv)
    return out.reshape(*bshape, L, plan.n)


def intt4(x, plan: FourStepPlan):
    """Inverse four-step NTT, bit-exact with ops.ntt.intt."""
    L, m1, m2 = plan.L, plan.m1, plan.m2
    bshape = x.shape[:-2]
    X = x.reshape(*bshape, L, m1, m2)
    p = jnp.asarray(plan.p_arr)
    pinv = jnp.asarray(plan.pinv_arr)
    D = _matmul_right(X, jnp.asarray(plan.iM2T), p, pinv)
    C = mont_mul(D, jnp.asarray(plan.iT), p, pinv)
    out = _matmul_left(jnp.asarray(plan.iM1), C, p, pinv)
    return out.reshape(*bshape, L, plan.n)
