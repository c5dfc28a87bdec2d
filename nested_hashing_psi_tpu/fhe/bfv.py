"""RNS-BFV scheme layer (the reference's default scheme; --bgv switches).

Capability parity with OpenFHE's CryptoContextBFVRNS as used by
/root/reference/src/Client/FHE/BatchedFHEPSIClient.cpp:71-79: scale-invariant
(MSB) encoding Enc(m) with phase Delta*m + e, Delta = floor(q/t).

Shares the whole RNS/NTT machinery with BGVContext; the differences:

 - encryption places Delta*m in the phase and uses plain (not t-scaled)
   noise; decryption rounds t/q * phase.
 - ct x ct multiplication is *textbook HPS*: extend both operands from q to
   a disjoint auxiliary RNS base, tensor-multiply over both bases, scale by
   t/q with rounding, and convert back to q -- all uint32 VPU work via
   ops.basis.BFVMulConverter (the aux -> q direction is integer-exact
   Shenoy-Kumaresan; see that class's docstring for the miss analysis).
   Noise grows *additively* (~ t*n*(e_a + e_b)) instead of multiplicatively
   as in BGV, so deep chains need far fewer limbs.
 - ct_ct_mul_bridge keeps the exact t-scaling bridge as an alternative:
   multiplying a BFV ciphertext by t turns its phase into t*e' - r*m
   (r = q mod t) -- a *BGV-form* ciphertext whose message is -r*m. The
   product is a plain BGV tensor product; relinearization then Delta-LIFTS
   the degree-2 result back to BFV form (every component times Delta, exact)
   before key switching, because this context's keys carry plain noise that
   a BGV-form phase would expose mod t. The known scalar (-r)^2 stays
   tracked in Ciphertext.scale and is divided out at decryption. Exact (no
   rounding), three scalar multiplications, ~2*log2(t) bits of extra noise
   per multiplication. Mixed-form operands (a BFV ct times a BGV ct) also
   route through the bridge.
 - ct x pt and additions are identical (plaintext operand is never
   Delta-scaled, matching EvalMult(ct, pt) semantics).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from nested_hashing_psi_tpu.fhe.bgv import BGVContext, Ciphertext, tensor_product
from nested_hashing_psi_tpu.fhe.params import SchemeParams
from nested_hashing_psi_tpu.ops.basis import BFVMulConverter
from nested_hashing_psi_tpu.ops.modmath import mont_mul
from nested_hashing_psi_tpu.ops.ntt import intt, ntt


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
        self._mulconv: BFVMulConverter | None = None

    def _msg_prep(self, m_ntt):
        return mont_mul(m_ntt, self.delta_mont, self.p, self.pinv)

    @property
    def mulconv(self) -> BFVMulConverter:
        """Lazily-built HPS multiplication machinery (numpy-stored constants,
        safe to construct inside a jit trace)."""
        if self._mulconv is None:
            self._mulconv = BFVMulConverter(self.q_primes, self.t, self.n)
        return self._mulconv

    def ct_ct_mul(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """EvalMult(ct, ct): textbook HPS for BFV-form operands; the
        t-scaling bridge handles mixed forms."""
        if a.form == "bfv" and b.form == "bfv":
            self.mulconv  # build eagerly relative to the jit below
            return self._jit("bfv_hps_mul", self._hps_mul_impl)(a, b)
        return super().ct_ct_mul(a, b)

    def ct_ct_mul_bridge(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """The exact t-scaling bridge multiplication (see module docstring)."""
        return super().ct_ct_mul(a, b)

    @property
    def _split_plan_aux(self):
        """Fused Pallas plan for the HPS auxiliary base (see _split_plan)."""
        if not hasattr(self, "_split_plan_aux_cache"):
            from nested_hashing_psi_tpu.ops.ntt_pallas import SplitNTTPlan

            self._split_plan_aux_cache = SplitNTTPlan(
                self.n, self.mulconv.aux_primes
            )
        return self._split_plan_aux_cache

    def _ntt_fast_aux(self, x):
        """Aux-base forward NTT: fused kernel single-chip on TPU (same
        gating as _ntt_fast), unrolled jnp stages elsewhere."""
        if self._fused_ntt_ok(self.n):
            from nested_hashing_psi_tpu.ops.ntt_pallas import ntt_pallas

            return ntt_pallas(x, self._split_plan_aux)
        return ntt(x, self.mulconv.plan_aux)

    def _intt_fast_aux(self, x):
        if self._fused_ntt_ok(self.n):
            from nested_hashing_psi_tpu.ops.ntt_pallas import intt_pallas

            return intt_pallas(x, self._split_plan_aux)
        return intt(x, self.mulconv.plan_aux)

    def _hps_mul_impl(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        mc = self._mulconv
        plan_aux = mc.plan_aux
        p_aux = jnp.asarray(plan_aux.p_arr)
        pinv_aux = jnp.asarray(plan_aux.pinv_arr)
        r2_aux = jnp.asarray(plan_aux.r2_arr)
        # operand coefficients over q, extended to the aux base's NTT domain.
        # All transforms run the fused Pallas path on a single TPU chip
        # (~3x the unfused XLA stages at these shapes; see BENCH_NOTES.md).
        # Both operands ride ONE stacked transform per direction: better
        # kernel-grid utilization than two half-sized calls.
        ab = jnp.stack([a.data, b.data], axis=0)
        eab = self._ntt_fast_aux(mc.extend_q_to_aux(self._intt_fast(ab)))
        ea, eb = eab[0], eab[1]
        # tensor products over both bases
        d_q = tensor_product(a.data, b.data, self.p, self.pinv, self.r2)
        d_aux = tensor_product(ea, eb, p_aux, pinv_aux, r2_aux)
        # scale by t/q with rounding, exact-convert back to q
        y = mc.scale_round(self._intt_fast(d_q), self._intt_fast_aux(d_aux))
        out = self._ntt_fast(mc.exact_to_q(y))
        return Ciphertext(out, "bfv", a.scale * b.scale % self.t)

    def _relinearize_impl(self, ct: Ciphertext, rlk) -> Ciphertext:
        """BGV-form products (the t-scaling bridge) must be Delta-lifted to
        BFV form BEFORE key switching: this context's keys carry plain (not
        t-scaled) noise, which would land directly in the mod-t message of a
        BGV-form phase. Multiplying every component by Delta moves the
        message to the MSB (phase Delta*m - r_t*e, since Delta*t = q - r_t),
        where additive key-switch noise is absorbed by the rounding decrypt.
        Exact (no rounding); costs ~log2(t) noise bits, already part of the
        bridge's documented noise budget."""
        if ct.form == "bgv":
            ct = Ciphertext(
                mont_mul(ct.data, self.delta_mont, self.p, self.pinv),
                "bfv",
                ct.scale,
            )
        return super()._relinearize_impl(ct, rlk)

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
        native __int128 kernel (utils.native.phase_to_mt) for large t, with
        an exact object fallback."""
        if self.t >= 1 << 33:
            from nested_hashing_psi_tpu.utils import native

            res = native.phase_to_mt(phase, self.q_primes, self.t, "bfv")
            if res is not None:
                m, dist = res
                noise_bits = (
                    np.log2(dist)
                    + self.params.q.bit_length()
                    - self.t.bit_length()
                    if dist > 0
                    else 0.0
                )
                return m, noise_bits
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


def make_context(params: SchemeParams, seed: int | None = 0) -> BGVContext:
    """Scheme factory matching the reference's --bgv switch.

    seed=None draws the RNG key from OS entropy (secrets) -- required for any
    context that generates secret keys in production paths (the reference
    gets its entropy from OpenSSL). An explicit int seed is for tests only.
    """
    if seed is None:
        import secrets

        seed = secrets.randbits(63)
    if params.scheme == "bfv":
        return BFVContext(params, seed)
    return BGVContext(params, seed)
