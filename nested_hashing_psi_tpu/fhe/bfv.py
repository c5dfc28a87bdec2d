"""RNS-BFV scheme layer (the reference's default scheme; --bgv switches).

Capability parity with OpenFHE's CryptoContextBFVRNS as used by
/root/reference/src/Client/FHE/BatchedFHEPSIClient.cpp:71-79: scale-invariant
(MSB) encoding Enc(m) with phase Delta*m + e, Delta = floor(q/t).

Shares the whole RNS/NTT machinery with BGVContext; the differences:

 - encryption places Delta*m in the phase and uses plain (not t-scaled)
   noise; decryption rounds t/q * phase.
 - ct x ct multiplication uses the exact t-scaling bridge instead of
   HPS/BEHZ base extension: multiplying a BFV ciphertext by t turns its
   phase into t*e' - r*m (r = q mod t) -- a *BGV-form* ciphertext whose
   message is -r*m. The product is then a plain BGV tensor product +
   relinearization, with the known scalar (-r)^2 tracked in
   Ciphertext.scale and divided out at decryption. This is exact (no
   rounding), costs two scalar multiplications, and trades ~2*log2(t) bits
   of extra noise per multiplication versus textbook BFV -- budgeted by
   params.default_num_limbs(scheme="bfv").
 - ct x pt and additions are identical (plaintext operand is never
   Delta-scaled, matching EvalMult(ct, pt) semantics).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from nested_hashing_psi_tpu.fhe.bgv import BGVContext, Ciphertext
from nested_hashing_psi_tpu.fhe.params import SchemeParams
from nested_hashing_psi_tpu.ops.modmath import mont_mul


class BFVContext(BGVContext):
    default_form = "bfv"

    def __init__(self, params: SchemeParams, seed: int = 0):
        super().__init__(params, seed)
        q, t = params.q, self.t
        delta = q // t
        delta_mont = np.array(
            [((delta % p) << 32) % p for p in self.q_primes], np.uint32
        ).reshape(self.L, 1)
        self.delta_mont = jnp.asarray(delta_mont)
        # noise is plain e (message sits in the MSB)
        one_mont = np.array([(1 << 32) % p for p in self.q_primes], np.uint32)
        self.noise_mont = jnp.asarray(one_mont.reshape(self.L, 1))
        self.r_t = q % t  # BGV-bridge message factor is -r_t

    def _msg_prep(self, m_ntt):
        return mont_mul(m_ntt, self.delta_mont, self.p, self.pinv)

    def _to_mul_form(self, ct: Ciphertext) -> Ciphertext:
        """BFV-form -> BGV-form: multiply by t; message becomes -r_t * m."""
        if ct.form == "bgv":
            return ct
        scaled = self._jit(
            "bfv_to_bgv",
            lambda c: mont_mul(c.data, self.t_mont, self.p, self.pinv),
        )(ct)
        return Ciphertext(scaled, "bgv", ct.scale * (self.t - self.r_t) % self.t)

    def _phase_to_mt_bfv(self, phase: np.ndarray):
        """m = round(t/q * [phase]_q) mod t via the CRT float trick; exact
        object fallback for large t."""
        y = (phase * self._crt_inv.reshape(-1, 1)) % np.array(
            self.q_primes, np.uint64
        ).reshape(-1, 1)
        v = (y.astype(np.float64) / self._crt_qi_f.reshape(-1, 1)).sum(axis=-2)
        frac = v - np.floor(v)
        t = self.t
        # float64 error ~ L * 2^-52; safe for t below ~2^40
        if t < 1 << 40:
            m = np.round(frac * t).astype(np.int64) % t
            # noise estimate: distance of t*frac from the nearest integer
            err = np.abs(frac * t - np.round(frac * t))
            max_err = float(err.max()) if err.size else 0.0
            noise_bits = (
                float(np.log2(max_err)) + self.params.q.bit_length() - t.bit_length()
                if max_err > 0
                else 0.0
            )
            return m.astype(object), noise_bits
        # exact big-t path: full CRT with python ints
        from nested_hashing_psi_tpu.ops.primes import crt_reconstruct

        q = self.params.q
        flat = phase.reshape(-1, self.L, self.n)
        out = np.zeros((flat.shape[0], self.n), dtype=object)
        for b in range(flat.shape[0]):
            for j in range(self.n):
                x = crt_reconstruct(
                    [int(flat[b, i, j]) for i in range(self.L)],
                    list(self.q_primes),
                )
                out[b, j] = (x * t + q // 2) // q % t
        return out.reshape(phase.shape[:-2] + (self.n,)), 0.0


def make_context(params: SchemeParams, seed: int = 0) -> BGVContext:
    """Scheme factory matching the reference's --bgv switch."""
    if params.scheme == "bfv":
        return BFVContext(params, seed)
    return BGVContext(params, seed)
