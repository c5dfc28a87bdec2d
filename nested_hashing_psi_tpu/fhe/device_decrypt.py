"""Fully on-device BFV decrypt -> packed slots (zero-test ready).

The host decrypt path (bgv.BGVContext.decrypt) fetches the whole phase
tensor (..., L, N) and runs the CRT float trick + slot NTT in numpy -- at
the 2^20 sweep geometry that is a ~6 MB device->host transfer plus host
compute per query, and through this sandbox's ~1 MB/s relay it dominates
client-visible latency. This module keeps EVERYTHING on device:

    phase = c0 + c1*s            (31-bit RNS, existing fused kernels)
    m     = round(t/q * x) mod t (exact fixed-point CRT, multiword uint32)
    slots = NTT_t(m)[s2n]        (two-plane Shoup-64 transform, ops.mod64)

and hands back either the packed slot values as (lo, hi) uint32 planes or
just the zero mask -- 16 KB instead of megabytes on the wire, and the
protocol's intersection extraction needs only the mask (a slot matches iff
it decrypts to 0; the tracked ct scale is a unit mod t, so it never affects
zeroness).

Exactness of the CRT step: with y_i = [x * (q/q_i)^{-1}]_{q_i} we have
t*x/q = t*v - t*k for v = sum_i y_i/q_i and integer k < L, so
m + t*k = round(t*v). S = sum_i y_i * floor(t*2^72/q_i) underestimates
t*v*2^72 by at most sum_i y_i < 2^36 -- an absolute error < 2^-36, four
orders below the >= 17-bit decrypt noise margin -- so
m_plus = (S + 2^71) >> 72 is exactly round(t*v), and at most L conditional
subtracts of t reduce it to m. (Oracle: tests/test_device_decrypt.py
cross-checks bit-exactly against BGVContext.decrypt.)

Reference client decode analogue: BatchedFHEPSIClient.cpp:171-193
(Decrypt + GetPackedValue + zero scan).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from nested_hashing_psi_tpu.ops import mod64
from nested_hashing_psi_tpu.ops.modmath import add_mod, mont_mul, shoup_mul, shoup_host
from nested_hashing_psi_tpu.ops.refmodel import _bitrev


class DeviceDecryptor:
    """Precomputed constants + jitted pipeline for one (BFV) context.

    Build with the context matching the ciphertext's limb count (shipped
    results live on the rescaled basis: use ctx.context_for_limbs(L')).
    """

    def __init__(self, ctx):
        if ctx.default_form != "bfv":
            raise ValueError("DeviceDecryptor supports BFV-form ciphertexts")
        self.ctx = ctx
        t, n, L = int(ctx.t), ctx.n, ctx.L
        qs = [int(p) for p in ctx.q_primes]

        # y_i = phase_i * (q/q_i)^{-1} mod q_i  (Shoup constant per limb)
        inv = [int(v) for v in np.asarray(ctx._crt_inv).reshape(-1)]
        self._inv_w = jnp.asarray(
            np.array(inv, np.uint32).reshape(L, 1)
        )
        self._inv_wq = jnp.asarray(
            np.array(
                [shoup_host(inv[i], qs[i]) for i in range(L)], np.uint32
            ).reshape(L, 1)
        )

        # T_i = floor(t * 2^72 / q_i): 3 planes (t <= 2^49 -> T_i < 2^91)
        T = [(t << 72) // qs[i] for i in range(L)]
        Tp = np.zeros((3, L, 1), np.uint32)
        for i, v in enumerate(T):
            assert v < 1 << 96
            Tp[0, i, 0] = v & 0xFFFFFFFF
            Tp[1, i, 0] = (v >> 32) & 0xFFFFFFFF
            Tp[2, i, 0] = v >> 64
        self._T = jnp.asarray(Tp)

        self._t2 = (
            jnp.uint32(t & 0xFFFFFFFF),
            jnp.uint32(t >> 32),
        )
        self._L = L

        # decode-NTT twiddles mod t (bit-reversed psi powers + Shoup-64)
        enc = ctx.encoder
        rev = _bitrev(n)
        cur = 1
        pows = []
        for _ in range(n):
            pows.append(cur)
            cur = cur * enc.psi % t
        pows = np.array(pows, dtype=object)
        psi_pows = pows[rev]
        w_lo = np.array([int(v) & 0xFFFFFFFF for v in psi_pows], np.uint32)
        w_hi = np.array([int(v) >> 32 for v in psi_pows], np.uint32)
        wq = [mod64.shoup64_host(int(v), t) for v in psi_pows]
        self._psi_w = (jnp.asarray(w_lo), jnp.asarray(w_hi))
        self._psi_wq = (
            jnp.asarray(np.array([v[0] for v in wq], np.uint32)),
            jnp.asarray(np.array([v[1] for v in wq], np.uint32)),
        )
        self._s2n = jnp.asarray(np.asarray(enc._s2n, np.int32))
        self._jits: dict = {}

    # ------------------------------------------------------------------
    def _phase(self, ct_data, s_mont):
        """[c0 + c1*s]_q coefficients: (..., L, N) uint32 (degree-2 only)."""
        ctx = self.ctx
        ph = add_mod(
            ct_data[..., 0, :, :],
            mont_mul(ct_data[..., 1, :, :], s_mont, ctx.p, ctx.pinv),
            ctx.p,
        )
        return ctx._intt_fast(ph)

    def _mt_planes(self, phase):
        """phase (..., L, N) -> m = round(t/q*[x]_q) mod t as (lo, hi)."""
        y = shoup_mul(phase, self._inv_w, self._inv_wq, self.ctx.p)  # (..., L, N)
        # S = sum_i y_i * T_i over 4 uint32 planes
        from nested_hashing_psi_tpu.ops.modmath import mulhi_u32

        T0, T1, T2 = self._T[0], self._T[1], self._T[2]
        p0 = y * T0
        c01 = mulhi_u32(y, T0)
        p1r = y * T1
        c12 = mulhi_u32(y, T1)
        p2r = y * T2
        c23 = mulhi_u32(y, T2)
        # per-limb product planes with carries
        s1, c1 = mod64._addc(c01, p1r)
        s2a, c2a = mod64._addc(c12, p2r)
        s2, c2b = mod64._addc(s2a, c1)
        p3 = c23 + c2a + c2b
        # reduce over the limb axis with carry propagation (exact: the sum
        # of <= 32 limb products stays under 2^128)
        U32 = jnp.uint32

        def _sum_axis(planes):
            # planes: list of 4 arrays (..., L, N); returns 4 arrays (..., N)
            a0, a1, a2, a3 = planes
            L = a0.shape[-2]
            r0 = a0[..., 0, :]
            r1 = a1[..., 0, :]
            r2 = a2[..., 0, :]
            r3 = a3[..., 0, :]
            for i in range(1, L):
                r0, c = mod64._addc(r0, a0[..., i, :])
                r1, cc = mod64._addc(r1, a1[..., i, :])
                r1, cd = mod64._addc(r1, c)
                r2, ce = mod64._addc(r2, a2[..., i, :])
                r2, cf = mod64._addc(r2, cc + cd)
                r3 = r3 + a3[..., i, :] + ce + cf
            return r0, r1, r2, r3

        S0, S1, S2, S3 = _sum_axis([p0, s1, s2, p3])
        # + 2^71 (rounding), then >> 72
        S2, c = mod64._addc(S2, jnp.full_like(S2, U32(1 << 7)))
        S3 = S3 + c
        m0 = (S2 >> 8) | (S3 << 24)
        m1 = S3 >> 8
        # m_plus = m + k*t with k < L: reduce by conditional subtracts
        for _ in range(self._L):
            m0, m1 = mod64.csub64(m0, m1, self._t2[0], self._t2[1])
        return m0, m1

    def _slots_impl(self, ct_data, s_mont):
        phase = self._phase(ct_data, s_mont)
        m2 = self._mt_planes(phase)
        ev = mod64.ntt2_mod_t(m2, self._psi_w, self._psi_wq, self._t2)
        return (
            jnp.take(ev[0], self._s2n, axis=-1),
            jnp.take(ev[1], self._s2n, axis=-1),
        )

    def _jit(self, name, fn):
        if name not in self._jits:
            self._jits[name] = jax.jit(fn)
        return self._jits[name]

    def slots(self, ct_data, s_mont):
        """Decrypt to packed slot values: (lo, hi) uint32 (..., n), canonical
        slot order. ct_data: (..., 2, L, N) on this context's basis."""
        return self._jit("slots", self._slots_impl)(ct_data, s_mont)

    def zero_mask(self, ct_data, s_mont, length: int | None = None):
        """Decrypt straight to the per-slot zero mask (..., n) bool --
        the only artifact the PSI client's intersection extraction needs."""

        def impl(d, s):
            lo, hi = self._slots_impl(d, s)
            return (lo == 0) & (hi == 0)

        out = self._jit("zero_mask", impl)(ct_data, s_mont)
        return out[..., :length] if length is not None else out
