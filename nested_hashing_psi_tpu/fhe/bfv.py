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

    def _hps_core(self, a_data, b_data, ab_coeffs=None) -> jnp.ndarray:
        """Textbook HPS product core: NTT-domain operands (each (..., 2, L, N))
        -> coefficient-domain product over q, (..., 3, L, N).

        ab_coeffs, when given, is the stacked (2, ..., 2, L, N)
        coefficient-domain view of the operands (callers that already
        inverse-transformed them -- e.g. the rescaled PIE path -- skip the
        iNTT here)."""
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
        if ab_coeffs is None:
            ab_coeffs = self._intt_fast(jnp.stack([a_data, b_data], axis=0))
        eab = self._ntt_fast_aux(mc.extend_q_to_aux(ab_coeffs))
        ea, eb = eab[0], eab[1]
        # tensor products over both bases
        d_q = tensor_product(a_data, b_data, self.p, self.pinv, self.r2)
        d_aux = tensor_product(ea, eb, p_aux, pinv_aux, r2_aux)
        # scale by t/q with rounding, exact-convert back to q
        y = mc.scale_round(self._intt_fast(d_q), self._intt_fast_aux(d_aux))
        return mc.exact_to_q(y)

    def _hps_mul_impl(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        out = self._ntt_fast(self._hps_core(a.data, b.data))
        return Ciphertext(out, "bfv", a.scale * b.scale % self.t)

    def ct_ct_mul_relin(self, a: Ciphertext, b: Ciphertext, rlk) -> Ciphertext:
        """Fused EvalMult + relinearization for BFV-form operands: the HPS
        product's d2 component stays in coefficient domain and feeds the
        relin gadget decompose directly, skipping its forward NTT and the
        decompose's inverse NTT (2*L limb transforms per call)."""
        if a.form == "bfv" and b.form == "bfv":
            self.mulconv
            return self._jit("bfv_hps_mul_relin", self._hps_mul_relin_impl)(
                a, b, rlk
            )
        return super().ct_ct_mul_relin(a, b, rlk)

    def _hps_mul_relin_impl(self, a: Ciphertext, b: Ciphertext, rlk) -> Ciphertext:
        from nested_hashing_psi_tpu.ops.modmath import add_mod

        y = self._hps_core(a.data, b.data)  # (..., 3, L, N) coeff domain
        d01 = self._ntt_fast(y[..., :2, :, :])
        ks0, ks1 = self._key_switch_coeffs(y[..., 2, :, :], rlk)
        data = jnp.stack(
            [
                add_mod(d01[..., 0, :, :], ks0, self.p),
                add_mod(d01[..., 1, :, :], ks1, self.p),
            ],
            axis=-3,
        )
        return Ciphertext(data, "bfv", a.scale * b.scale % self.t)

    # ------------------------------------------------------------------
    # drop-limb rescale (BFV modulus switch) + the rescaled mult pipeline
    # ------------------------------------------------------------------
    def _rescaler(self, n_limbs: int):
        """Cached exact RNS rescale from this context's basis to its first
        n_limbs primes (ops.basis.RNSRescale; numpy constants, trace-safe)."""
        if not hasattr(self, "_rescalers"):
            self._rescalers: dict[int, "RNSRescale"] = {}
        if n_limbs not in self._rescalers:
            from nested_hashing_psi_tpu.ops.basis import RNSRescale

            self._rescalers[n_limbs] = RNSRescale(self.q_primes, self.L - n_limbs)
        return self._rescalers[n_limbs]

    def rescale_coeffs(self, coeffs: jnp.ndarray, n_limbs: int) -> jnp.ndarray:
        """(..., L, N) coefficient-domain -> (..., n_limbs, N) over the
        child basis (exact integer rescale; see RNSRescale)."""
        assert 1 <= n_limbs < self.L
        return self._rescaler(n_limbs).rescale(coeffs)

    def rescale_ct(self, ct: Ciphertext, n_limbs: int) -> Ciphertext:
        """Modulus-switch a BFV-form ciphertext down to n_limbs limbs.
        Noise: e' ~ e/qd + t*small (fhe.params.bfv_mul_limbs model)."""
        assert ct.form == "bfv"
        if n_limbs >= self.L:
            return ct
        child = self.context_for_limbs(n_limbs)
        self._rescaler(n_limbs)

        def impl(ct):
            coeffs = self._intt_fast(ct.data)
            return Ciphertext(
                child._ntt_fast(self.rescale_coeffs(coeffs, n_limbs)),
                ct.form,
                ct.scale,
            )

        return self._jit(f"rescale_{n_limbs}", impl)(ct)

    def hps_mul_relin_rescaled(
        self,
        a: Ciphertext,
        b: Ciphertext,
        rlk,
        mul_limbs: int,
        ship_limbs: int | None = None,
        a_limbs: int | None = None,
    ) -> Ciphertext:
        """EvalMult + relin with both operands first rescaled to mul_limbs
        limbs, fully fused: the operands' inverse transforms feed the
        rescale, whose output feeds both the q'-side forward NTT and the
        HPS base extension directly. Optionally rescales the product once
        more to ship_limbs (the wire/decrypt basis).

        a may already live on a smaller basis (a_limbs, chained H > 2
        multiplications); b is always on the full basis. Trace-safe: call
        under the caller's jit. rlk is the FULL-basis relin key; it is
        shrunk to the mult basis here (RNS-CRT gadget keys restrict to
        prefix bases, bgv.BGVContext.shrink_relin_key)."""
        from nested_hashing_psi_tpu.ops.modmath import add_mod

        assert a.form == "bfv" and b.form == "bfv"
        mctx = self.context_for_limbs(mul_limbs)
        mctx.mulconv
        a_L = a.data.shape[-2] if a_limbs is None else a_limbs
        if a_L == self.L and b.data.shape[-2] == self.L:
            ab_coeffs = self._intt_fast(jnp.stack([a.data, b.data], axis=0))
            ab_m = self.rescale_coeffs(ab_coeffs, mul_limbs)
        else:
            actx = self.context_for_limbs(a_L)
            a_c = actx._intt_fast(a.data)
            a_m = (
                actx.rescale_coeffs(a_c, mul_limbs)
                if a_L > mul_limbs
                else a_c
            )
            b_m = self.rescale_coeffs(self._intt_fast(b.data), mul_limbs)
            ab_m = jnp.stack([a_m, b_m], axis=0)
        ntt_m = mctx._ntt_fast(ab_m)
        y = mctx._hps_core(ntt_m[0], ntt_m[1], ab_coeffs=ab_m)
        d01 = mctx._ntt_fast(y[..., :2, :, :])
        rlk_m = self.shrink_relin_key(rlk, mul_limbs)
        ks0, ks1 = mctx._key_switch_coeffs(y[..., 2, :, :], rlk_m)
        data = jnp.stack(
            [
                add_mod(d01[..., 0, :, :], ks0, mctx.p),
                add_mod(d01[..., 1, :, :], ks1, mctx.p),
            ],
            axis=-3,
        )
        scale = a.scale * b.scale % self.t
        if ship_limbs is not None and ship_limbs < mul_limbs:
            sctx = self.context_for_limbs(ship_limbs)
            coeffs = mctx._intt_fast(data)
            data = sctx._ntt_fast(mctx.rescale_coeffs(coeffs, ship_limbs))
        return Ciphertext(data, "bfv", scale)

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
