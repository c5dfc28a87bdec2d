"""Negacyclic NTT/iNTT over RNS limb tensors (JAX/XLA, VPU path).

TPU-native replacement for OpenFHE's NTT inside ``DCRTPoly`` (every
EvalMult/Encrypt call site in the reference, e.g.
/root/reference/src/Common/Crypto/PrivateIndexedEqualityCheck/BatchedFHEHIPPIE.cpp:101-126).

Design:
 - Merged-twiddle Cooley-Tukey (forward, natural -> bit-reversed order) and
   Gentleman-Sande (inverse, bit-reversed -> natural) butterflies; the 2n-th
   root psi is folded into the twiddle tables so x^n + 1 reduction is free.
 - Data layout (..., L, n): L RNS limbs each with its own prime; twiddle
   tables are (L, n) uint32 pairs (value, Shoup quotient) so each butterfly
   is one ``shoup_mul`` (one mulhi + two low multiplies, ~25% fewer VPU ops
   than Montgomery) + add/sub on the VPU.
 - log2(n) stages are unrolled at trace time (static shapes); XLA fuses each
   stage into a couple of elementwise kernels. The fused Pallas kernel that
   keeps a tile of residue polynomials VMEM-resident across all stages (one
   HBM read + write per poly) is ``ops.ntt_pallas.ntt_pallas``; this jnp
   form remains the CPU / sharded-path / oracle implementation.

Bit-reversed transform order is an internal convention: pointwise ciphertext
algebra is order-independent, and iNTT restores natural coefficient order.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from nested_hashing_psi_tpu.ops import primes as primes_mod
from nested_hashing_psi_tpu.ops.modmath import (
    add_mod,
    mont_constants,
    shoup_host,
    shoup_mul,
    sub_mod,
)


def bit_reverse_indices(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint64)
    rev = np.zeros(n, dtype=np.uint64)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev.astype(np.int64)


@dataclass
class NTTPlan:
    """Per-(ring dim, prime set) twiddle tables, built once on host.

    Arrays are jnp on first use; stored np for cheap pickling/sharding.
    """

    n: int
    primes: tuple[int, ...]
    # host tables (numpy); twiddles are (L, 2, n) with axis 1 packing the
    # Shoup pair [value, floor(value * 2^32 / p)]
    psi_rev: np.ndarray = field(init=False)       # (L, 2, n)
    psi_inv_rev: np.ndarray = field(init=False)   # (L, 2, n)
    n_inv: np.ndarray = field(init=False)         # (L, 2, 1) n^-1 Shoup pair
    p_arr: np.ndarray = field(init=False)         # (L, 1)
    pinv_arr: np.ndarray = field(init=False)      # (L, 1)
    r2_arr: np.ndarray = field(init=False)        # (L, 1)

    def __post_init__(self):
        n, ps = self.n, self.primes
        assert n & (n - 1) == 0
        L = len(ps)
        rev = bit_reverse_indices(n)
        psi_rev = np.zeros((L, 2, n), dtype=np.uint32)
        psi_inv_rev = np.zeros((L, 2, n), dtype=np.uint32)
        n_inv = np.zeros((L, 2, 1), dtype=np.uint32)
        p_arr = np.zeros((L, 1), dtype=np.uint32)
        pinv_arr = np.zeros((L, 1), dtype=np.uint32)
        r2_arr = np.zeros((L, 1), dtype=np.uint32)
        for l, p in enumerate(ps):
            psi = primes_mod.primitive_root_of_unity(p, 2 * n)
            psi_pows = [1] * n
            for i in range(1, n):
                psi_pows[i] = psi_pows[i - 1] * psi % p
            psi_inv = pow(psi, -1, p)
            ipsi_pows = [1] * n
            for i in range(1, n):
                ipsi_pows[i] = ipsi_pows[i - 1] * psi_inv % p
            for i in range(n):
                w, iw = psi_pows[rev[i]], ipsi_pows[rev[i]]
                psi_rev[l, 0, i], psi_rev[l, 1, i] = w, shoup_host(w, p)
                psi_inv_rev[l, 0, i] = iw
                psi_inv_rev[l, 1, i] = shoup_host(iw, p)
            ninv = pow(n, -1, p)
            n_inv[l, 0, 0], n_inv[l, 1, 0] = ninv, shoup_host(ninv, p)
            pinv, r2 = mont_constants(p)
            p_arr[l, 0] = p
            pinv_arr[l, 0] = pinv
            r2_arr[l, 0] = r2
        self.psi_rev = psi_rev
        self.psi_inv_rev = psi_inv_rev
        self.n_inv = n_inv
        self.p_arr = p_arr
        self.pinv_arr = pinv_arr
        self.r2_arr = r2_arr

    @property
    def L(self) -> int:
        return len(self.primes)

    @property
    def logn(self) -> int:
        return self.n.bit_length() - 1

    # Jitted entry points (compile once per input shape; use these outside of
    # an enclosing jit -- eager per-op dispatch compiles hundreds of tiny XLA
    # programs otherwise).
    def ntt_jit(self, x):
        if not hasattr(self, "_ntt_fn"):
            self._ntt_fn = jax.jit(lambda a: ntt(a, self))
        return self._ntt_fn(x)

    def intt_jit(self, x):
        if not hasattr(self, "_intt_fn"):
            self._intt_fn = jax.jit(lambda a: intt(a, self))
        return self._intt_fn(x)


def ntt(x, plan: NTTPlan):
    """Forward negacyclic NTT. x: uint32 (..., L, n) -> (..., L, n) (bit-rev order)."""
    n, L = plan.n, plan.L
    bshape = x.shape[:-2]
    assert x.shape[-2:] == (L, n), (x.shape, L, n)
    psi = jnp.asarray(plan.psi_rev)
    p = jnp.asarray(plan.p_arr)[:, :, None]      # (L,1,1)
    m, t = 1, n
    for _ in range(plan.logn):
        t //= 2
        x = x.reshape(*bshape, L, m, 2, t)
        sw = psi[:, 0, m:2 * m][:, :, None]      # (L, m, 1)
        sq = psi[:, 1, m:2 * m][:, :, None]
        u = x[..., 0, :]
        v = shoup_mul(x[..., 1, :], sw, sq, p)
        x = jnp.stack([add_mod(u, v, p), sub_mod(u, v, p)], axis=-2)
        m *= 2
    return x.reshape(*bshape, L, n)


def intt(x, plan: NTTPlan):
    """Inverse negacyclic NTT. x: uint32 (..., L, n) (bit-rev) -> natural order."""
    n, L = plan.n, plan.L
    bshape = x.shape[:-2]
    assert x.shape[-2:] == (L, n)
    ipsi = jnp.asarray(plan.psi_inv_rev)
    p = jnp.asarray(plan.p_arr)[:, :, None]
    m, t = n, 1
    while m > 1:
        h = m // 2
        x = x.reshape(*bshape, L, h, 2, t)
        sw = ipsi[:, 0, h:2 * h][:, :, None]
        sq = ipsi[:, 1, h:2 * h][:, :, None]
        u = x[..., 0, :]
        v = x[..., 1, :]
        x = jnp.stack(
            [add_mod(u, v, p), shoup_mul(sub_mod(u, v, p), sw, sq, p)], axis=-2
        )
        t *= 2
        m = h
    x = x.reshape(*bshape, L, n)
    ninv = jnp.asarray(plan.n_inv)
    return shoup_mul(x, ninv[:, 0], ninv[:, 1], jnp.asarray(plan.p_arr))
