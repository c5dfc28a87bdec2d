"""RNS-BGV scheme over uint32 limb tensors (JAX/XLA).

TPU-native replacement for OpenFHE's CryptoContextBGVRNS/BFVRNS used by every
FHE call site in the reference (e.g. BatchedFHEPSIClient.cpp:60-91 keygen,
BatchedFHEHIPPIE.cpp:101-126 EvalMult/EvalAdd). Differences by design:

 - Ciphertexts are dense uint32 tensors (..., k, L, N): k components (2, or 3
   before relinearization), L RNS limbs (31-bit NTT-friendly primes), N ring
   coefficients, kept permanently in NTT (evaluation) domain -- pointwise
   VPU modmuls are the hot path, exactly what the PIE pipelines need.
 - Encryption is *batched*: one call encrypts a whole (B, L, N) plaintext
   stack (the reference encrypts ciphertext-by-ciphertext in a loop).
 - Relinearization uses the RNS-CRT gadget (digits = limb residues,
   centered): ksk[k] encrypts s^2 * g_k where g_k = 1 on limb k, 0 elsewhere,
   so key generation adds s^2 only on the matching limb.
 - BGV flavor: Dec(ct) = [[c0 + c1*s]_q]_t with noise t*e; multiplicative
   depth is budgeted by limb count (params.default_num_limbs) instead of
   modulus switching in round 1.

Randomness: jax.random (threefry) keyed from the context seed -- client and
server never need shared FHE randomness (keys travel over the wire), so
stream stability across hosts is not required here.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from nested_hashing_psi_tpu.fhe.encoding import PackedEncoder
from nested_hashing_psi_tpu.fhe.params import SchemeParams
from nested_hashing_psi_tpu.ops.modmath import (
    add_mod,
    cond_sub_mod,
    mont_constants,
    mont_mul,
    neg_mod,
    sub_mod,
    to_mont,
)
from nested_hashing_psi_tpu.ops.ntt import NTTPlan, intt, ntt

U32 = jnp.uint32


def tensor_product(a, b, p, pinv, r2):
    """(c0 + c1*s) x (d0 + d1*s) over one RNS base, NTT domain:
    a, b uint32 (..., 2, L, N) -> (..., 3, L, N)."""
    b0m = to_mont(b[..., 0, :, :], p, pinv, r2)
    b1m = to_mont(b[..., 1, :, :], p, pinv, r2)
    return tensor_product_mont(a, b0m, b1m, p, pinv)


def tensor_product_mont(a, b0m, b1m, p, pinv):
    """tensor_product with the second operand's components already in
    Montgomery form. Karatsuba: 3 REDC multiplies instead of 4 (the middle
    term from (a0+a1)(b0+b1) - d0 - d2; Montgomery form is linear, so the
    operand sums stay valid REDC inputs)."""
    a0, a1 = a[..., 0, :, :], a[..., 1, :, :]
    d0 = mont_mul(a0, b0m, p, pinv)
    d2 = mont_mul(a1, b1m, p, pinv)
    mid = mont_mul(add_mod(a0, a1, p), add_mod(b0m, b1m, p), p, pinv)
    d1 = sub_mod(sub_mod(mid, d0, p), d2, p)
    return jnp.stack([d0, d1, d2], axis=-3)


@jax.tree_util.register_pytree_node_class
@dataclass
class Ciphertext:
    """data: uint32 (..., k, L, N) in NTT domain; k = 2 (or 3 pre-relin).

    form/scale support the BFV layer (fhe.bfv): "bgv" phases carry the
    message in the LSB (m + t*e), "bfv" phases carry Delta*m + e. `scale` is
    a known mod-t factor on the message (BFV multiplication converts to BGV
    form by scaling with t, which multiplies the message by -(q mod t));
    decrypt divides it out.
    """

    data: jnp.ndarray
    form: str = "bgv"
    scale: int = 1

    @property
    def k(self) -> int:
        return self.data.shape[-3]

    def tree_flatten(self):
        return (self.data,), (self.form, self.scale)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def _register_fields(cls):
    names = tuple(cls.__dataclass_fields__)

    def flatten(self):
        return tuple(getattr(self, f) for f in names), None

    def unflatten(aux, children):
        return cls(*children)

    cls.tree_flatten = flatten
    cls.tree_unflatten = classmethod(lambda c, aux, ch: c(*ch))
    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_register_fields
@dataclass
class SecretKey:
    s_mont: jnp.ndarray      # (L, N) NTT domain, Montgomery form
    s_ntt: jnp.ndarray       # (L, N) NTT domain, plain form


@_register_fields
@dataclass
class PublicKey:
    b_mont: jnp.ndarray      # (L, N) Montgomery NTT form: b = t*e - a*s
    a_mont: jnp.ndarray      # (L, N)


@_register_fields
@dataclass
class RelinKey:
    b_mont: jnp.ndarray      # (L_dig, L, N)
    a_mont: jnp.ndarray      # (L_dig, L, N)


class BGVContext:
    default_form = "bgv"

    def _msg_prep(self, m_ntt):
        """Message placement in the phase: identity for BGV (LSB); the BFV
        subclass scales by Delta = floor(q/t) (MSB)."""
        return m_ntt

    def __init__(self, params: SchemeParams, seed: int = 0):
        self.params = params
        self.n = params.ring_dim
        self.t = params.plaintext_modulus
        self.q_primes = params.q_primes
        self.L = params.num_limbs
        self.plan = NTTPlan(self.n, self.q_primes)
        self.encoder = PackedEncoder(self.n, self.t)
        self._key = jax.random.PRNGKey(seed)
        self._jits: dict = {}

        # Device constants, shaped (L, 1) to broadcast against (..., L, N).
        self.p = jnp.asarray(self.plan.p_arr)
        self.pinv = jnp.asarray(self.plan.pinv_arr)
        self.r2 = jnp.asarray(self.plan.r2_arr)
        t_mont = np.zeros((self.L, 1), np.uint32)
        qk_mod_qj = np.zeros((self.L, self.L, 1), np.uint32)
        for j, pj in enumerate(self.q_primes):
            t_mont[j, 0] = (self.t << 32) % pj
            for k, pk in enumerate(self.q_primes):
                qk_mod_qj[k, j, 0] = pk % pj
        self.t_mont = jnp.asarray(t_mont)
        # encryption-noise scaling: t*e for BGV (message in LSB); the BFV
        # subclass overrides this with 1*e (message in MSB via Delta)
        self.noise_mont = self.t_mont
        self.qk_mod_qj = jnp.asarray(qk_mod_qj)
        self.q_half = jnp.asarray(
            np.array([p // 2 for p in self.q_primes], np.uint32).reshape(self.L, 1)
        )

        # Host CRT-decode constants.
        q = params.q
        self._crt_inv = np.array(
            [pow(q // p, -1, p) for p in self.q_primes], np.uint64
        )
        self._crt_qi_f = np.array([float(p) for p in self.q_primes])
        self._crt_qhat_mod_t = [(q // p) % self.t for p in self.q_primes]
        self._q_mod_t = q % self.t

    # ------------------------------------------------------------------
    # randomness
    # ------------------------------------------------------------------
    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    def _jit(self, name: str, fn):
        """Per-context cache of coarse jitted entry points (one XLA program
        per op instead of hundreds of eager per-op dispatches)."""
        if name not in self._jits:
            self._jits[name] = jax.jit(fn)
        return self._jits[name]

    def _uniform_rns(self, key, shape) -> jnp.ndarray:
        """Uniform mod q_i, shape (..., L, N); bias ~2^-33 via 64-bit draws."""
        hi = jax.random.bits(key, (2,) + shape, dtype=jnp.uint32)
        lo = hi[1] % self.p
        hi_m = mont_mul(hi[0], self.r2, self.p, self.pinv)  # hi * 2^32 mod p
        return add_mod(hi_m, lo, self.p)

    def _small_to_rns(self, v: jnp.ndarray) -> jnp.ndarray:
        """Signed small ints (..., N) int32 -> (..., L, N) uint32 residues."""
        v = v[..., None, :]  # add limb axis
        pos = v >= 0
        mag = jnp.abs(v).astype(U32) % self.p
        return jnp.where(pos, mag, neg_mod(mag, self.p))

    def _ternary(self, key, shape) -> jnp.ndarray:
        return jax.random.randint(key, shape, -1, 2, dtype=jnp.int32)

    def _gauss(self, key, shape) -> jnp.ndarray:
        e = jax.random.normal(key, shape) * self.params.error_std
        return jnp.clip(jnp.round(e), -24, 24).astype(jnp.int32)

    # ------------------------------------------------------------------
    # keys
    # ------------------------------------------------------------------
    def keygen(self) -> tuple[SecretKey, PublicKey]:
        return self._jit("keygen", self._keygen_impl)(self._next_key())

    def _keygen_impl(self, key):
        k_s, k_a, k_e = jax.random.split(key, 3)
        s = self._ternary(k_s, (self.n,))
        s_ntt = ntt(self._small_to_rns(s), self.plan)
        s_mont = to_mont(s_ntt, self.p, self.pinv, self.r2)
        sk = SecretKey(s_mont=s_mont, s_ntt=s_ntt)

        a = self._uniform_rns(k_a, (self.L, self.n))
        e = self._gauss(k_e, (self.n,))
        e_ntt = ntt(self._small_to_rns(e), self.plan)
        b = sub_mod(
            mont_mul(e_ntt, self.noise_mont, self.p, self.pinv),
            mont_mul(a, sk.s_mont, self.p, self.pinv),
            self.p,
        )
        pk = PublicKey(
            b_mont=to_mont(b, self.p, self.pinv, self.r2),
            a_mont=to_mont(a, self.p, self.pinv, self.r2),
        )
        return sk, pk

    def relin_keygen(self, sk: SecretKey) -> RelinKey:
        """RNS-CRT gadget key for s^2 -> s (EvalMultKeyGen equivalent)."""
        s2 = mont_mul(sk.s_ntt, sk.s_mont, self.p, self.pinv)  # plain form
        return self._jit("ksk_gen", self._ksk_gen_impl)(sk, s2, self._next_key())

    def galois_keygen(self, sk: SecretKey, elements) -> dict[int, RelinKey]:
        """Key-switch keys sigma_k(s) -> s for each Galois element k
        (EvalRotateKeyGen / EvalSumKeyGen equivalent)."""
        from nested_hashing_psi_tpu.fhe.galois import automorphism_ntt_perm

        out = {}
        for k in elements:
            perm = jnp.asarray(automorphism_ntt_perm(self.n, k))
            target = sk.s_ntt[..., perm]
            out[int(k)] = self._jit("ksk_gen", self._ksk_gen_impl)(
                sk, target, self._next_key()
            )
        return out

    def _ksk_gen_impl(self, sk: SecretKey, target_ntt, key) -> RelinKey:
        """ksk[k] = (noise*e_k - a_k*s + target*g_k, a_k) with the CRT gadget
        g_k = 1 on limb k, 0 elsewhere; target in plain NTT form (L, N).
        Noise scaling follows the scheme: t*e for BGV (killed mod t at
        decrypt), plain e for BFV (message sits at Delta, t*e would burn
        log2(t) bits of budget per key switch)."""
        L, n = self.L, self.n
        k_a, k_e = jax.random.split(key)
        a = self._uniform_rns(k_a, (L, L, n))
        e = self._gauss(k_e, (L, n))
        e_ntt = ntt(self._small_to_rns(e), self.plan)  # (L, L, n)
        b = sub_mod(
            mont_mul(e_ntt, self.noise_mont, self.p, self.pinv),
            mont_mul(a, sk.s_mont, self.p, self.pinv),
            self.p,
        )
        eye = jnp.eye(L, dtype=bool)[:, :, None]
        b = jnp.where(eye, add_mod(b, target_ntt[None], self.p), b)
        return RelinKey(
            b_mont=to_mont(b, self.p, self.pinv, self.r2),
            a_mont=to_mont(a, self.p, self.pinv, self.r2),
        )

    # ------------------------------------------------------------------
    # plaintexts
    # ------------------------------------------------------------------
    def make_plaintext_rns(self, slot_values) -> jnp.ndarray:
        """Packed-encode slot values -> (B?, L, N) uint32 NTT-domain tensor."""
        coeffs = self.encoder.encode(slot_values)
        rns = self.encoder.to_rns(coeffs, self.q_primes)  # (..., L, n) uint64
        return self._jit("pt_ntt", lambda x: ntt(x, self.plan))(
            jnp.asarray(rns, U32)
        )

    def make_plaintext_mont(self, slot_values) -> jnp.ndarray:
        """Like make_plaintext_rns but in Montgomery form (ct x pt operand)."""
        coeffs = self.encoder.encode(slot_values)
        rns = self.encoder.to_rns(coeffs, self.q_primes)
        return self._jit(
            "pt_ntt_mont",
            lambda x: to_mont(ntt(x, self.plan), self.p, self.pinv, self.r2),
        )(jnp.asarray(rns, U32))

    # ------------------------------------------------------------------
    # encryption / decryption
    # ------------------------------------------------------------------
    def encrypt_sk(self, m_ntt: jnp.ndarray, sk: SecretKey) -> Ciphertext:
        """Secret-key encryption of (B?, L, N) NTT-domain plaintext(s)."""
        return self._jit("encrypt_sk", self._encrypt_sk_impl)(
            m_ntt, sk, self._next_key()
        )

    def _encrypt_sk_impl(self, m_ntt, sk: SecretKey, key) -> Ciphertext:
        bshape = m_ntt.shape[:-2]
        k_c1, k_e = jax.random.split(key)
        c1 = self._uniform_rns(k_c1, bshape + (self.L, self.n))
        e = self._gauss(k_e, bshape + (self.n,))
        e_ntt = ntt(self._small_to_rns(e), self.plan)
        c0 = sub_mod(
            add_mod(
                mont_mul(e_ntt, self.noise_mont, self.p, self.pinv),
                self._msg_prep(m_ntt),
                self.p,
            ),
            mont_mul(c1, sk.s_mont, self.p, self.pinv),
            self.p,
        )
        return Ciphertext(jnp.stack([c0, c1], axis=-3), self.default_form, 1)

    def encrypt_pk(self, m_ntt: jnp.ndarray, pk: PublicKey) -> Ciphertext:
        return self._jit("encrypt_pk", self._encrypt_pk_impl)(
            m_ntt, pk, self._next_key()
        )

    def _encrypt_pk_impl(self, m_ntt, pk: PublicKey, key) -> Ciphertext:
        bshape = m_ntt.shape[:-2]
        k_u, k_e0, k_e1 = jax.random.split(key, 3)
        u = self._ternary(k_u, bshape + (self.n,))
        u_ntt = ntt(self._small_to_rns(u), self.plan)
        e0 = self._gauss(k_e0, bshape + (self.n,))
        e1 = self._gauss(k_e1, bshape + (self.n,))
        e0_ntt = ntt(self._small_to_rns(e0), self.plan)
        e1_ntt = ntt(self._small_to_rns(e1), self.plan)
        c0 = add_mod(
            add_mod(
                mont_mul(u_ntt, pk.b_mont, self.p, self.pinv),
                mont_mul(e0_ntt, self.noise_mont, self.p, self.pinv),
                self.p,
            ),
            self._msg_prep(m_ntt),
            self.p,
        )
        c1 = add_mod(
            mont_mul(u_ntt, pk.a_mont, self.p, self.pinv),
            mont_mul(e1_ntt, self.noise_mont, self.p, self.pinv),
            self.p,
        )
        return Ciphertext(jnp.stack([c0, c1], axis=-3), self.default_form, 1)

    def decrypt_phase(self, ct: Ciphertext, sk: SecretKey) -> jnp.ndarray:
        name = f"decrypt_phase{ct.data.shape[-3]}"
        return self._jit(name, self._decrypt_phase_impl)(ct, sk)

    def _decrypt_phase_impl(self, ct: Ciphertext, sk: SecretKey) -> jnp.ndarray:
        """[c0 + c1*s (+ c2*s^2)]_q in coefficient domain: (..., L, N) uint32."""
        d = ct.data
        phase = add_mod(
            d[..., 0, :, :],
            mont_mul(d[..., 1, :, :], sk.s_mont, self.p, self.pinv),
            self.p,
        )
        if d.shape[-3] == 3:
            c2s = mont_mul(d[..., 2, :, :], sk.s_mont, self.p, self.pinv)
            phase = add_mod(
                phase, mont_mul(c2s, sk.s_mont, self.p, self.pinv), self.p
            )
        return intt(phase, self.plan)

    def decrypt(self, ct: Ciphertext, sk: SecretKey, length: int | None = None):
        """Full decrypt to slot values in [0, t). Returns (slots, noise_bits).

        Ciphertexts on a smaller basis (leveled / rescaled pipelines ship
        fewer limbs) are decrypted in the matching child context with the
        shrunk key automatically."""
        n_limbs = ct.data.shape[-2]
        if n_limbs < self.L:
            return self.context_for_limbs(n_limbs).decrypt(
                ct, self.shrink_key_to(sk, n_limbs), length
            )
        phase = np.asarray(self.decrypt_phase(ct, sk), dtype=np.uint64)
        if ct.form == "bgv":
            coeffs, noise_bits = self._phase_to_mt(phase)
        else:
            coeffs, noise_bits = self._phase_to_mt_bfv(phase)
        if ct.scale != 1:
            inv = pow(ct.scale, -1, self.t)
            coeffs = (coeffs.astype(object) * inv) % self.t
        slots = self.encoder.decode(coeffs, length)
        return slots, noise_bits

    def _phase_to_mt_bfv(self, phase: np.ndarray):
        raise NotImplementedError("BFV-form decrypt requires BFVContext")

    def noise_bits_exact(self, ct: Ciphertext, sk: SecretKey) -> float:
        """Exact log2 |[phase]_q| via host CRT (tests/diagnostics only).

        The cheap estimate returned by decrypt() floors at ~log2(q) - 51
        (float64 resolution); this one is exact but slow.
        """
        phase = np.asarray(self.decrypt_phase(ct, sk), dtype=np.uint64)
        flat = phase.reshape(-1, self.L, self.n)
        q = self.params.q
        worst = 0
        from nested_hashing_psi_tpu.ops.primes import centered, crt_reconstruct

        for b in range(flat.shape[0]):
            for j in range(self.n):
                x = crt_reconstruct(
                    [int(flat[b, i, j]) for i in range(self.L)], list(self.q_primes)
                )
                worst = max(worst, abs(centered(x, q)))
        return float(int(worst).bit_length())

    def _phase_to_mt(self, phase: np.ndarray):
        """Exact [x]_q mod t from RNS residues (..., L, N), plus noise size.

        x = sum_i y_i*(q/q_i) - k*q with y_i = [x_i * (q/q_i)^-1]_{q_i} and
        k = round(sum_i y_i/q_i); float64 rounding is safe while the noise
        budget holds (|x| << q/2). Big t routes through the native __int128
        CRT kernel (utils.native.phase_to_mt) when available.
        """
        if self.t >= 1 << 33:
            from nested_hashing_psi_tpu.utils import native

            res = native.phase_to_mt(phase, self.q_primes, self.t, "bgv")
            if res is not None:
                m, dist = res
                noise_bits = (
                    np.log2(dist) + self.params.q.bit_length() if dist > 0 else 0.0
                )
                return m, noise_bits
        y = (phase * self._crt_inv.reshape(-1, 1)) % np.array(
            self.q_primes, np.uint64
        ).reshape(-1, 1)
        v = (y.astype(np.float64) / self._crt_qi_f.reshape(-1, 1)).sum(axis=-2)
        k = np.round(v).astype(np.int64)
        frac = np.abs(v - k)
        max_frac = float(frac.max()) if frac.size else 0.0
        noise_bits = (
            np.log2(max_frac) + self.params.q.bit_length() if max_frac > 0 else 0.0
        )
        t = self.t
        if t < 2**33 and max(self.q_primes) < 2**31:
            acc = np.zeros(y.shape[:-2] + y.shape[-1:], dtype=np.uint64)
            for i in range(self.L):
                acc = (acc + y[..., i, :] * np.uint64(self._crt_qhat_mod_t[i] % t)) % np.uint64(t)
            kb = (k.astype(object) * (self._q_mod_t)) % t
            m = (acc.astype(object) - kb) % t
            return m.astype(object), noise_bits
        # big-t fallback: exact object arithmetic
        acc = np.zeros(y.shape[:-2] + y.shape[-1:], dtype=object)
        for i in range(self.L):
            acc = (acc + y[..., i, :].astype(object) * self._crt_qhat_mod_t[i]) % t
        m = (acc - k.astype(object) * self._q_mod_t) % t
        return m, noise_bits

    # ------------------------------------------------------------------
    # homomorphic ops (pure, jit-composable)
    # ------------------------------------------------------------------
    def ct_add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        assert a.form == b.form and a.scale == b.scale, "mismatched ct forms"
        return self._jit(
            "ct_add",
            lambda x, y: Ciphertext(add_mod(x.data, y.data, self.p), x.form, x.scale),
        )(a, b)

    def ct_pt_mul(self, ct: Ciphertext, pt_mont: jnp.ndarray) -> Ciphertext:
        """ct x packed plaintext (Montgomery NTT form, (B?, L, N))."""
        return self._jit(
            "ct_pt_mul",
            lambda c, m: Ciphertext(
                mont_mul(c.data, m[..., None, :, :], self.p, self.pinv),
                c.form,
                c.scale,
            ),
        )(ct, pt_mont)

    def ct_ct_mul(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        a = self._to_mul_form(a)
        b = self._to_mul_form(b)
        return self._jit("ct_ct_mul", self._ct_ct_mul_impl)(a, b)

    def _to_mul_form(self, ct: Ciphertext) -> Ciphertext:
        """BGV contexts multiply in place; the BFV subclass converts
        Delta-form operands to BGV form first."""
        return ct

    def _ct_ct_mul_impl(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """Tensor product -> 3-component ciphertext (call relinearize after)."""
        return Ciphertext(
            tensor_product(a.data, b.data, self.p, self.pinv, self.r2),
            "bgv",
            a.scale * b.scale % self.t,
        )

    def relinearize(self, ct: Ciphertext, rlk: RelinKey) -> Ciphertext:
        return self._jit("relinearize", self._relinearize_impl)(ct, rlk)

    def _relinearize_impl(self, ct: Ciphertext, rlk: RelinKey) -> Ciphertext:
        """3 -> 2 components via RNS-CRT gadget key switching."""
        assert ct.data.shape[-3] == 3
        d0 = ct.data[..., 0, :, :]
        d1 = ct.data[..., 1, :, :]
        d2 = ct.data[..., 2, :, :]
        ks0, ks1 = self._key_switch(d2, rlk)
        return Ciphertext(
            jnp.stack(
                [add_mod(d0, ks0, self.p), add_mod(d1, ks1, self.p)], axis=-3
            ),
            ct.form,
            ct.scale,
        )

    def _key_switch(self, poly_ntt: jnp.ndarray, ksk: RelinKey):
        """Key-switch a polynomial under the gadget key: returns (d0, d1)
        with d0 + d1*s = poly * <key target> (+ small noise)."""
        return self._key_switch_coeffs(self._intt_fast(poly_ntt), ksk)

    def _key_switch_coeffs(self, poly_coeffs: jnp.ndarray, ksk: RelinKey):
        """_key_switch fed coefficient-domain input directly -- the fused
        HPS ct x ct + relin path produces d2 in coefficient domain, so the
        decompose's iNTT (and the producer's forward NTT) are skipped."""
        from nested_hashing_psi_tpu.ops.modmath import modsum

        dig = self._rns_decompose_coeffs(poly_coeffs)  # (..., L_dig, L, N) NTT
        d0 = modsum(mont_mul(dig, ksk.b_mont, self.p, self.pinv), self.p, axis=-3)
        d1 = modsum(mont_mul(dig, ksk.a_mont, self.p, self.pinv), self.p, axis=-3)
        return d0, d1

    # ------------------------------------------------------------------
    # modulus switching (leveled BGV)
    # ------------------------------------------------------------------
    def drop_limb_context(self) -> "BGVContext":
        """Context over q' = q / q_last (shares scheme params otherwise)."""
        if not hasattr(self, "_child_ctx"):
            from dataclasses import replace

            self._child_ctx = type(self)(
                replace(self.params, num_limbs=self.L - 1), seed=0
            )
        return self._child_ctx

    def shrink_key(self, sk: SecretKey) -> SecretKey:
        return SecretKey(s_mont=sk.s_mont[:-1], s_ntt=sk.s_ntt[:-1])

    def context_for_limbs(self, n_limbs: int) -> "BGVContext":
        """Walk the drop-limb chain down to a context over n_limbs limbs."""
        ctx = self
        while ctx.L > n_limbs:
            ctx = ctx.drop_limb_context()
        assert ctx.L == n_limbs, (self.L, n_limbs)
        return ctx

    def shrink_key_to(self, sk: SecretKey, n_limbs: int) -> SecretKey:
        return SecretKey(s_mont=sk.s_mont[:n_limbs], s_ntt=sk.s_ntt[:n_limbs])

    @staticmethod
    def shrink_relin_key(rlk: RelinKey, n_limbs: int) -> RelinKey:
        """A full-modulus RNS-CRT gadget key restricted to the child basis:
        dropping the last digit row and limb column yields a valid key for
        q' = q / q_last (the gadget g_k = 1 on limb k is basis-local)."""
        return RelinKey(
            b_mont=rlk.b_mont[:n_limbs, :n_limbs],
            a_mont=rlk.a_mont[:n_limbs, :n_limbs],
        )

    def mod_switch(self, ct: Ciphertext) -> Ciphertext:
        """BGV modulus switch: drop the last limb q_l, scaling noise by
        ~1/q_l. c' = (c - delta)/q_l with delta = c mod q_l corrected to
        0 mod t. Returns a ciphertext for drop_limb_context().
        Requires t < 2^31 (device mod-t arithmetic); BGV form only."""
        assert ct.form == "bgv", "mod switch operates on BGV-form phases"
        assert self.t < 2**31
        self.drop_limb_context()  # build eagerly: constants must not be
        return self._jit("mod_switch", self._mod_switch_impl)(ct)  # traced

    def _mod_switch_impl(self, ct: Ciphertext) -> Ciphertext:
        child = self.drop_limb_context()
        L, t = self.L, jnp.uint32(self.t)
        ql = self.q_primes[-1]
        coeffs = intt(ct.data, self.plan)                # (..., k, L, N)
        r = coeffs[..., L - 1, :]                        # [c]_{q_l} in [0, q_l)
        big = r > jnp.uint32(ql // 2)                    # centered sign

        # u = [-r_c * q_l^{-1}]_t in [0, t), r_c the centered residue
        t_pinv, _ = mont_constants(self.t)
        ql_inv_t = pow(ql, -1, self.t)
        r_mod_t = r % t
        r_c_mod_t = jnp.where(
            big, sub_mod(r_mod_t, jnp.uint32(ql % self.t), t), r_mod_t
        )
        neg_r_qlinv = mont_mul(
            neg_mod(r_c_mod_t, t),
            jnp.uint32((ql_inv_t << 32) % self.t),
            t,
            jnp.uint32(t_pinv),
        )
        u_big = neg_r_qlinv > jnp.uint32(self.t // 2)    # centered sign of u

        p = self.p[:-1]
        pinv = self.pinv[:-1]
        out_limbs = []
        for j in range(L - 1):
            qj = self.q_primes[j]
            # delta mod q_j = r_c + q_l * u_c  (r_c, u_c centered)
            r_j = jnp.where(
                big,
                sub_mod(r % jnp.uint32(qj), jnp.uint32(ql % qj), jnp.uint32(qj)),
                r % jnp.uint32(qj),
            )
            u_j = jnp.where(
                u_big,
                sub_mod(
                    neg_r_qlinv % jnp.uint32(qj),
                    jnp.uint32(self.t % qj),
                    jnp.uint32(qj),
                ),
                neg_r_qlinv % jnp.uint32(qj),
            )
            delta_j = add_mod(
                r_j,
                mont_mul(
                    u_j,
                    jnp.uint32((ql % qj << 32) % qj),
                    jnp.uint32(qj),
                    self.pinv[j, 0],
                ),
                jnp.uint32(qj),
            )
            diff = sub_mod(coeffs[..., j, :], delta_j, jnp.uint32(qj))
            scaled = mont_mul(
                diff,
                jnp.uint32((pow(ql, -1, qj) << 32) % qj),
                jnp.uint32(qj),
                self.pinv[j, 0],
            )
            out_limbs.append(scaled)
        new_coeffs = jnp.stack(out_limbs, axis=-2)
        # the message picks up a factor q_l^{-1} mod t; track it in scale
        new_scale = ct.scale * pow(ql, -1, self.t) % self.t
        return Ciphertext(ntt(new_coeffs, child.plan), ct.form, new_scale)

    # ------------------------------------------------------------------
    # automorphisms / rotations (EvalRotate, EvalSum equivalents)
    # ------------------------------------------------------------------
    def automorphism(self, ct: Ciphertext, k: int, gk: RelinKey) -> Ciphertext:
        """sigma_k(ct): slot permutation per fhe.galois + key switch."""
        from nested_hashing_psi_tpu.fhe.galois import automorphism_ntt_perm

        # keep as numpy: converted to a fresh constant at every trace (a jnp
        # constant created inside one jit trace must not leak into another)
        perm = automorphism_ntt_perm(self.n, k)

        def impl(ct, gk):
            c0 = ct.data[..., 0, :, :][..., perm]
            c1 = ct.data[..., 1, :, :][..., perm]
            ks0, ks1 = self._key_switch(c1, gk)
            return Ciphertext(
                jnp.stack([add_mod(c0, ks0, self.p), ks1], axis=-3),
                ct.form,
                ct.scale,
            )

        return self._jit(f"auto_{k}", impl)(ct, gk)

    def rotate_slots(self, ct: Ciphertext, r: int, gks: dict[int, RelinKey]) -> Ciphertext:
        """Left-rotate slots by r within each half-ring (EvalAtIndex)."""
        from nested_hashing_psi_tpu.fhe.galois import rotation_galois_element

        k = rotation_galois_element(self.n, r)
        if k == 1:
            return ct
        return self.automorphism(ct, k, gks[k])

    def conjugate(self, ct: Ciphertext, gks: dict[int, RelinKey]) -> Ciphertext:
        """Swap the two half-rings (sigma_{2n-1})."""
        k = 2 * self.n - 1
        return self.automorphism(ct, k, gks[k])

    def sum_ladder_elements(self) -> list[int]:
        """Galois elements needed by eval_sum_all_slots (EvalSumKeyGen set)."""
        from nested_hashing_psi_tpu.fhe.galois import rotation_galois_element

        half = self.n // 2
        els = [rotation_galois_element(self.n, 1 << j) for j in range(half.bit_length() - 1)]
        els.append(2 * self.n - 1)
        return els

    def eval_sum_all_slots(self, ct: Ciphertext, gks: dict[int, RelinKey]) -> Ciphertext:
        """Sum of all n slots, replicated into every slot (EvalSum over the
        full batch): log2(n/2) rotations + one conjugation."""
        half = self.n // 2
        r = 1
        while r < half:
            ct = self.ct_add(ct, self.rotate_slots(ct, r, gks))
            r <<= 1
        return self.ct_add(ct, self.conjugate(ct, gks))

    def ct_ct_mul_relin(self, a: Ciphertext, b: Ciphertext, rlk: RelinKey) -> Ciphertext:
        return self.relinearize(self.ct_ct_mul(a, b), rlk)

    @property
    def _split_plan(self):
        """Lazily-built four-step plan for the fused Pallas NTT (TPU)."""
        if not hasattr(self, "_split_plan_cache"):
            from nested_hashing_psi_tpu.ops.ntt_pallas import SplitNTTPlan

            self._split_plan_cache = SplitNTTPlan(self.n, self.q_primes)
        return self._split_plan_cache

    @staticmethod
    def _fused_ntt_ok(n: int) -> bool:
        """Use the fused Pallas NTT only single-chip on TPU: under a GSPMD
        mesh the operand axes may be partitioned across devices, which
        pallas_call does not auto-partition (the sharded PIE paths carry
        their own distributed NTTs in parallel/{mesh,dist_ntt}.py)."""
        return (
            jax.default_backend() == "tpu"
            and jax.device_count() == 1
            and n >= 2048
        )

    def _ntt_fast(self, x):
        """Forward NTT over q: fused VMEM-resident Pallas kernel on a single
        TPU chip (bit-exact with ops.ntt.ntt -- same canonical bit-reversed
        order), unrolled jnp stages elsewhere (CPU tests, device meshes)."""
        if self._fused_ntt_ok(self.n):
            from nested_hashing_psi_tpu.ops.ntt_pallas import ntt_pallas

            return ntt_pallas(x, self._split_plan)
        return ntt(x, self.plan)

    def _intt_fast(self, x):
        if self._fused_ntt_ok(self.n):
            from nested_hashing_psi_tpu.ops.ntt_pallas import intt_pallas

            return intt_pallas(x, self._split_plan)
        return intt(x, self.plan)

    def _rns_decompose(self, d2: jnp.ndarray) -> jnp.ndarray:
        """(..., L, N) NTT -> centered limb digits re-reduced mod every q_j,
        back in NTT domain: (..., L_dig, L, N). The decompose iNTT + L_dig
        digit NTTs dominate relinearization (SURVEY hard part #2), so they
        run on the fused Pallas path on TPU."""
        return self._rns_decompose_coeffs(self._intt_fast(d2))

    def _rns_decompose_coeffs(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """_rns_decompose from coefficient-domain input (..., L, N)."""
        dk = coeffs[..., :, None, :]              # (..., L_dig, 1, N)
        big = dk > self.q_half[:, None, :]        # centered lift sign
        # cross-prime re-reduction: residue < 2**31 < 2*q_j (31-bit primes),
        # so one conditional subtract replaces the integer division of `%`
        r = cond_sub_mod(dk, self.p[None, :, :])  # (..., L_dig, L, N)
        r_neg = sub_mod(r, self.qk_mod_qj, self.p[None, :, :])
        digits = jnp.where(big, r_neg, r)
        return self._ntt_fast(digits)
