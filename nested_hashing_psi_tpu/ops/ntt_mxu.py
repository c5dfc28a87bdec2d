"""MXU four-step NTT: the butterfly stages as int8-digit matrix multiplies.

The VPU kernel (ops/ntt_pallas.py) is compute-bound on Montgomery butterflies
(~34 uint32 VPU ops each); the MXU sits idle. This formulation executes the
two four-step stages (ops/ntt4.py's factorization: canonical bit-reversed
order) as exact integer matmuls on the systolic array:

    S = M @ X mod p  with  M, X < p < 2^31
      = sum_i 2^(7i) * Q_i,   Q_i = G_i @ X_digits
    X_digits: X split into five 7-bit digits, stacked along the contraction
    axis (640 = 5*128 rows); G_i = the i-th 7-bit digit of the pre-scaled
    constants [2^(7j) * M mod p], concatenated over j to match.

Every digit is in [0, 127] (fits signed int8); Q_i <= 640 * 127^2 < 2^24, so
int8 x int8 -> int32 MXU accumulation is exact. Recombination needs only
three Montgomery reductions per element: A = Q_0 + 128*Q_1 and
B = Q_2 + 128*Q_3 stay below 2^31, so

    S = [A * 2^32 + B * (2^14 * 2^32) + Q_4 * (2^28 * 2^32)]_p  (mont_mul form)

The pure-jnp path here is the correctness oracle (and is itself MXU-bound
under XLA); the fused Pallas kernel keeps the digit tensors and Q_i blocks
VMEM-resident so the poly still crosses HBM exactly once.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nested_hashing_psi_tpu.ops import primes as primes_mod
from nested_hashing_psi_tpu.ops.modmath import (
    add_mod,
    mont_constants,
    mont_mul,
    to_mont_host,
)
from nested_hashing_psi_tpu.ops.ntt import bit_reverse_indices

DIGITS = 5
DIGIT_BITS = 7
DIGIT_MASK = (1 << DIGIT_BITS) - 1


def _plain_matrices(n: int, m1: int, p: int):
    """Plain-form (non-Montgomery) four-step matrices mod p, same formulas
    as ops.ntt4._build_matrices: M1 (m1,m1), T (m1,m2), M2T (m2,m2) and
    inverses iM1, iT (with 1/n folded in), iM2T."""
    m2 = n // m1
    psi = primes_mod.primitive_root_of_unity(p, 2 * n)
    omega = psi * psi % p
    rev1 = bit_reverse_indices(m1)
    rev2 = bit_reverse_indices(m2)
    psi_inv = pow(psi, -1, p)
    omega_inv = pow(omega, -1, p)
    m1_inv = pow(m1, -1, p)
    m2_inv = pow(m2, -1, p)

    M1 = np.zeros((m1, m1), np.uint32)
    T = np.zeros((m1, m2), np.uint32)
    M2T = np.zeros((m2, m2), np.uint32)
    iM1 = np.zeros((m1, m1), np.uint32)
    iT = np.zeros((m1, m2), np.uint32)
    iM2T = np.zeros((m2, m2), np.uint32)
    for a in range(m1):
        j1 = int(rev1[a])
        for k1 in range(m1):
            M1[a, k1] = pow(psi, m2 * k1, p) * pow(omega, m2 * j1 * k1, p) % p
            iM1[k1, a] = (
                m1_inv * pow(psi_inv, m2 * k1, p) * pow(omega_inv, m2 * j1 * k1, p) % p
            )
        for k2 in range(m2):
            T[a, k2] = pow(psi, k2, p) * pow(omega, j1 * k2, p) % p
            iT[a, k2] = (
                pow(psi_inv, k2, p) * pow(omega_inv, j1 * k2, p) * m2_inv % p
            )
    for b in range(m2):
        j2 = int(rev2[b])
        for k2 in range(m2):
            M2T[k2, b] = pow(omega, m1 * j2 * k2, p)
            iM2T[b, k2] = pow(omega_inv, m1 * j2 * k2, p)
    return M1, T, M2T, iM1, iT, iM2T


def _digit_stack_left(M: np.ndarray, p: int) -> np.ndarray:
    """For S = M @ X with X digit-stacked along rows: G (DIGITS, m, D*k) int8
    with G[i][:, j*k:(j+1)*k] = digit_i(2^(7j) * M mod p)."""
    m, k = M.shape
    G = np.zeros((DIGITS, m, DIGITS * k), np.int8)
    for j in range(DIGITS):
        Mj = (M.astype(object) * (1 << (DIGIT_BITS * j))) % p
        for i in range(DIGITS):
            G[i, :, j * k : (j + 1) * k] = (
                (Mj >> (DIGIT_BITS * i)) & DIGIT_MASK
            ).astype(np.int8)
    return G


def _digit_stack_right(M: np.ndarray, p: int) -> np.ndarray:
    """For S = X @ M with X digit-stacked along columns: G (DIGITS, D*k, m)."""
    k, m = M.shape
    G = np.zeros((DIGITS, DIGITS * k, m), np.int8)
    for j in range(DIGITS):
        Mj = (M.astype(object) * (1 << (DIGIT_BITS * j))) % p
        for i in range(DIGITS):
            G[i, j * k : (j + 1) * k, :] = (
                (Mj >> (DIGIT_BITS * i)) & DIGIT_MASK
            ).astype(np.int8)
    return G


@dataclass(eq=False)  # identity hash: used as a static jit argument
class MxuNTTPlan:
    n: int
    primes: tuple[int, ...]
    m1: int = 0

    def __post_init__(self):
        n = self.n
        if self.m1 == 0:
            self.m1 = 1 << ((n.bit_length() // 2))
        self.m2 = n // self.m1
        m1, m2 = self.m1, self.m2
        assert m1 * m2 == n
        L = len(self.primes)
        self.G1 = np.zeros((L, DIGITS, m1, DIGITS * m1), np.int8)
        self.G2 = np.zeros((L, DIGITS, DIGITS * m2, m2), np.int8)
        self.iG1 = np.zeros((L, DIGITS, m1, DIGITS * m1), np.int8)
        self.iG2 = np.zeros((L, DIGITS, DIGITS * m2, m2), np.int8)
        self.tw = np.zeros((L, m1, m2), np.uint32)
        self.itw = np.zeros((L, m1, m2), np.uint32)
        # recombination constants c_k = 2^(7k) * 2^32 mod p for k in {0,2,4}
        self.rc = np.zeros((L, 3, 1, 1), np.uint32)
        self.p_arr = np.zeros((L, 1), np.uint32)
        self.pinv_arr = np.zeros((L, 1), np.uint32)
        for l, p in enumerate(self.primes):
            M1, T, M2T, iM1, iT, iM2T = _plain_matrices(n, m1, p)
            self.G1[l] = _digit_stack_left(M1, p)
            self.G2[l] = _digit_stack_right(M2T, p)
            self.iG1[l] = _digit_stack_left(iM1, p)
            self.iG2[l] = _digit_stack_right(iM2T, p)
            for a in range(m1):
                for b in range(m2):
                    self.tw[l, a, b] = to_mont_host(int(T[a, b]), p)
                    self.itw[l, a, b] = to_mont_host(int(iT[a, b]), p)
            for idx, k in enumerate((0, 2, 4)):
                self.rc[l, idx] = ((1 << (DIGIT_BITS * k)) << 32) % p
            pinv, _ = mont_constants(p)
            self.p_arr[l, 0] = p
            self.pinv_arr[l, 0] = pinv

    @property
    def L(self) -> int:
        return len(self.primes)


def _recombine(Q, rc, p, pinv):
    """Q: (..., DIGITS, m, k) int32 >= 0 -> S (..., m, k) uint32 mod p."""
    Qu = Q.astype(jnp.uint32)
    A = Qu[..., 0, :, :] + (Qu[..., 1, :, :] << 7)   # < 2^31
    B = Qu[..., 2, :, :] + (Qu[..., 3, :, :] << 7)
    C = Qu[..., 4, :, :]
    S = add_mod(
        mont_mul(A, rc[..., 0, :, :], p, pinv),
        mont_mul(B, rc[..., 1, :, :], p, pinv),
        p,
    )
    return add_mod(S, mont_mul(C, rc[..., 2, :, :], p, pinv), p)


def _digits_rows(X):
    """(..., m, k) uint32 -> (..., DIGITS*m, k) int8 digit stack (rows)."""
    ds = [((X >> (DIGIT_BITS * j)) & DIGIT_MASK).astype(jnp.int8) for j in range(DIGITS)]
    return jnp.concatenate(ds, axis=-2)


def _digits_cols(X):
    """(..., m, k) uint32 -> (..., m, DIGITS*k) int8 digit stack (columns)."""
    ds = [((X >> (DIGIT_BITS * j)) & DIGIT_MASK).astype(jnp.int8) for j in range(DIGITS)]
    return jnp.concatenate(ds, axis=-1)


def _stage_left(X, G, rc, p, pinv):
    """S = M @ X mod p. X: (TB, m1, m2) u32; G: (DIGITS, m1, DIGITS*m1) i8."""
    Xd = _digits_rows(X)                               # (TB, 5*m1, m2)
    Q = jax.lax.dot_general(
        G, Xd, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                  # (DIGITS, m1, TB, m2)
    Q = jnp.moveaxis(Q, 2, 0)                          # (TB, DIGITS, m1, m2)
    return _recombine(Q, rc, p, pinv)


def _stage_right(X, G, rc, p, pinv):
    """S = X @ M mod p. X: (TB, m1, m2) u32; G: (DIGITS, DIGITS*m2, m2) i8."""
    Xd = _digits_cols(X)                               # (TB, m1, 5*m2)
    Q = jax.lax.dot_general(
        Xd, G, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                  # (TB, m1, DIGITS, m2)
    Q = jnp.moveaxis(Q, -2, 1)                         # (TB, DIGITS, m1, m2)
    return _recombine(Q, rc, p, pinv)


def _fwd_mxu(X, G1, tw, G2, rc, p, pinv):
    C = _stage_left(X, G1, rc, p, pinv)
    D = mont_mul(C, tw, p, pinv)
    return _stage_right(D, G2, rc, p, pinv)


def _inv_mxu(X, iG2, itw, iG1, rc, p, pinv):
    D = _stage_right(X, iG2, rc, p, pinv)
    C = mont_mul(D, itw, p, pinv)
    return _stage_left(C, iG1, rc, p, pinv)


# ---------------------------------------------------------------------------
# jnp oracle path
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("plan", "inverse"))
def _mxu_jnp(x, plan: MxuNTTPlan, inverse: bool):
    L, n, m1, m2 = plan.L, plan.n, plan.m1, plan.m2
    bshape = x.shape[:-2]
    B = int(np.prod(bshape)) if bshape else 1
    X = x.reshape(B, L, m1, m2)
    outs = []
    for l in range(L):
        p = jnp.uint32(plan.p_arr[l, 0])
        pinv = jnp.uint32(plan.pinv_arr[l, 0])
        rc = jnp.asarray(plan.rc[l])
        if inverse:
            o = _inv_mxu(
                X[:, l], jnp.asarray(plan.iG2[l]), jnp.asarray(plan.itw[l]),
                jnp.asarray(plan.iG1[l]), rc, p, pinv,
            )
        else:
            o = _fwd_mxu(
                X[:, l], jnp.asarray(plan.G1[l]), jnp.asarray(plan.tw[l]),
                jnp.asarray(plan.G2[l]), rc, p, pinv,
            )
        outs.append(o)
    out = jnp.stack(outs, axis=1)
    return out.reshape(*bshape, L, n) if bshape else out[0].reshape(L, n)


def ntt_mxu(x, plan: MxuNTTPlan):
    """Forward MXU four-step NTT (jnp/XLA path), bit-exact vs ops.ntt."""
    return _mxu_jnp(x, plan, False)


def intt_mxu(x, plan: MxuNTTPlan):
    return _mxu_jnp(x, plan, True)


# ---------------------------------------------------------------------------
# Fused Pallas kernel: digits, matmuls and recombination stay in VMEM.
# ---------------------------------------------------------------------------

def _make_kernel(inverse: bool):
    def kernel(p_ref, pinv_ref, x_ref, ga_ref, tw_ref, gb_ref, rc_ref, out_ref):
        l = pl.program_id(0)
        p = p_ref[l, 0]
        pinv = pinv_ref[l, 0]
        X = x_ref[:, 0]
        rc = rc_ref[0]
        if inverse:
            out = _inv_mxu(X, gb_ref[0], tw_ref[0], ga_ref[0], rc, p, pinv)
        else:
            out = _fwd_mxu(X, ga_ref[0], tw_ref[0], gb_ref[0], rc, p, pinv)
        out_ref[:, 0] = out

    return kernel


@partial(jax.jit, static_argnames=("plan", "inverse", "tile_b", "interpret"))
def _mxu_pallas(x, plan: MxuNTTPlan, inverse: bool, tile_b: int, interpret: bool):
    L, n, m1, m2 = plan.L, plan.n, plan.m1, plan.m2
    bshape = x.shape[:-2]
    B = int(np.prod(bshape)) if bshape else 1
    xb = x.reshape(B, L, m1, m2)
    pad = (-B) % tile_b
    if pad:
        xb = jnp.concatenate([xb, jnp.zeros((pad, L, m1, m2), x.dtype)], axis=0)
    Bp = B + pad
    ga, gb = (plan.iG1, plan.iG2) if inverse else (plan.G1, plan.G2)
    tw = plan.itw if inverse else plan.tw
    D = DIGITS
    out = pl.pallas_call(
        _make_kernel(inverse),
        grid=(L, Bp // tile_b),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, 1, m1, m2), lambda l, b: (b, l, 0, 0)),
            pl.BlockSpec((1, D, m1, D * m1), lambda l, b: (l, 0, 0, 0)),
            pl.BlockSpec((1, m1, m2), lambda l, b: (l, 0, 0)),
            pl.BlockSpec((1, D, D * m2, m2), lambda l, b: (l, 0, 0, 0)),
            pl.BlockSpec((1, 3, 1, 1), lambda l, b: (l, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_b, 1, m1, m2), lambda l, b: (b, l, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, L, m1, m2), jnp.uint32),
        interpret=interpret,
    )(
        jnp.asarray(plan.p_arr),
        jnp.asarray(plan.pinv_arr),
        xb,
        jnp.asarray(ga),
        jnp.asarray(tw),
        jnp.asarray(gb),
        jnp.asarray(plan.rc),
    )
    out = out[:B].reshape(*bshape, L, n) if bshape else out[0].reshape(L, n)
    return out


def ntt_mxu_pallas(x, plan: MxuNTTPlan, tile_b: int = 8,
                   interpret: bool | None = None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _mxu_pallas(x, plan, False, tile_b, interpret)


def intt_mxu_pallas(x, plan: MxuNTTPlan, tile_b: int = 8,
                    interpret: bool | None = None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _mxu_pallas(x, plan, True, tile_b, interpret)
