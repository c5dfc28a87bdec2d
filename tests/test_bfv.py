"""BFV scheme tests: Delta-encoding roundtrips, hom ops, the t-scaling
multiplication bridge, and scale-corrected decryption."""

import numpy as np
import pytest

from nested_hashing_psi_tpu.fhe.bfv import BFVContext, make_context
from nested_hashing_psi_tpu.fhe.params import SchemeParams


def ctx_small(t=65537, n=64, limbs=8, seed=41):
    return BFVContext(
        SchemeParams(ring_dim=n, plaintext_modulus=t, num_limbs=limbs, scheme="bfv"),
        seed=seed,
    )


def test_factory():
    assert isinstance(
        make_context(SchemeParams(ring_dim=32, num_limbs=4, scheme="bfv")),
        BFVContext,
    )


def test_bfv_encrypt_decrypt():
    ctx = ctx_small()
    sk, pk = ctx.keygen()
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 65537, size=64)
    for enc in (lambda m: ctx.encrypt_sk(m, sk), lambda m: ctx.encrypt_pk(m, pk)):
        ct = enc(ctx.make_plaintext_rns(vals))
        assert ct.form == "bfv"
        slots, noise = ctx.decrypt(ct, sk)
        np.testing.assert_array_equal(np.asarray(slots, np.int64), vals)


def test_bfv_add_and_ct_pt():
    ctx = ctx_small(seed=43)
    sk, _ = ctx.keygen()
    rng = np.random.default_rng(1)
    a = rng.integers(0, 65537, size=64)
    b = rng.integers(0, 65537, size=64)
    ca = ctx.encrypt_sk(ctx.make_plaintext_rns(a), sk)
    cb = ctx.encrypt_sk(ctx.make_plaintext_rns(b), sk)
    s, _ = ctx.decrypt(ctx.ct_add(ca, cb), sk)
    np.testing.assert_array_equal(np.asarray(s, np.int64), (a + b) % 65537)
    m, _ = ctx.decrypt(ctx.ct_pt_mul(ca, ctx.make_plaintext_mont(b)), sk)
    np.testing.assert_array_equal(
        np.asarray(m, np.int64), (a.astype(object) * b) % 65537
    )


def test_bfv_ct_ct_mul_mixed_form_via_bridge():
    """ct_ct_mul with a BGV-form operand falls back to the t-scaling bridge
    (the default BFV x BFV path is textbook HPS, tested below)."""
    ctx = ctx_small(seed=47, limbs=10)
    sk, _ = ctx.keygen()
    rlk = ctx.relin_keygen(sk)
    rng = np.random.default_rng(2)
    a = rng.integers(0, 65537, size=64)
    b = rng.integers(0, 65537, size=64)
    ca = ctx._to_mul_form(ctx.encrypt_sk(ctx.make_plaintext_rns(a), sk))
    cb = ctx.encrypt_sk(ctx.make_plaintext_rns(b), sk)
    assert ca.form == "bgv" and cb.form == "bfv"
    prod = ctx.ct_ct_mul_relin(ca, cb, rlk)
    # relinearization Delta-lifts bridge products back to BFV form (the
    # context's plain-noise keys would corrupt a BGV-form phase mod t)
    assert prod.form == "bfv" and prod.scale != 1
    slots, noise = ctx.decrypt(prod, sk)
    np.testing.assert_array_equal(
        np.asarray(slots, np.int64), (a.astype(object) * b) % 65537
    )
    assert noise < 10 * 31 - 10


def test_bfv_zero_slots_survive_pipeline():
    """The PIE's zero test: (a - a) * b stays zero through the bridge."""
    ctx = ctx_small(seed=53, limbs=10)
    sk, _ = ctx.keygen()
    rlk = ctx.relin_keygen(sk)
    a = np.arange(2, 66)
    ca = ctx.encrypt_sk(ctx.make_plaintext_rns(a), sk)
    cneg = ctx.encrypt_sk(ctx.make_plaintext_rns([-int(v) for v in a]), sk)
    diff = ctx.ct_add(ca, cneg)  # Enc(0) in every slot
    other = ctx.encrypt_sk(ctx.make_plaintext_rns(np.arange(1, 65)), sk)
    prod = ctx.ct_ct_mul_relin(diff, other, rlk)
    slots, _ = ctx.decrypt(prod, sk)
    assert all(int(v) == 0 for v in slots)


# ---------------------------------------------------------------------------
# textbook HPS multiplication (the default for BFV-form operands)
# ---------------------------------------------------------------------------


def test_bfv_hps_mul():
    ctx = ctx_small(seed=59, limbs=6)
    sk, _ = ctx.keygen()
    rlk = ctx.relin_keygen(sk)
    rng = np.random.default_rng(6)
    a = rng.integers(0, 65537, size=64)
    b = rng.integers(0, 65537, size=64)
    ca = ctx.encrypt_sk(ctx.make_plaintext_rns(a), sk)
    cb = ctx.encrypt_sk(ctx.make_plaintext_rns(b), sk)
    prod = ctx.ct_ct_mul_relin(ca, cb, rlk)
    # HPS keeps BFV form and does not perturb the message scale
    assert prod.form == "bfv" and prod.scale == 1
    slots, _ = ctx.decrypt(prod, sk)
    np.testing.assert_array_equal(
        np.asarray([int(v) for v in slots]),
        np.asarray([int(v) for v in (a.astype(object) * b) % 65537]),
    )


def test_bfv_hps_mul_big_t():
    t = (1 << 32) + (1 << 20) + (1 << 19) + 1  # the reference's 32-bit table
    ctx = ctx_small(t=t, seed=61, limbs=8)
    sk, _ = ctx.keygen()
    rlk = ctx.relin_keygen(sk)
    rng = np.random.default_rng(7)
    a = rng.integers(0, t, size=64).astype(object)
    b = rng.integers(0, t, size=64).astype(object)
    ca = ctx.encrypt_sk(ctx.make_plaintext_rns(a), sk)
    cb = ctx.encrypt_sk(ctx.make_plaintext_rns(b), sk)
    prod = ctx.ct_ct_mul_relin(ca, cb, rlk)
    slots, _ = ctx.decrypt(prod, sk)
    assert all(int(s) == int(x) * int(y) % t for s, x, y in zip(slots, a, b))


def test_bfv_hps_depth_chain_low_limbs():
    """3 sequential multiplications at 6 limbs (186-bit q): HPS noise grows
    additively, where the t-scaling bridge would burn ~2*17 extra bits per
    multiplication."""
    ctx = ctx_small(seed=67, limbs=6)
    sk, _ = ctx.keygen()
    rlk = ctx.relin_keygen(sk)
    rng = np.random.default_rng(8)
    vals = [rng.integers(0, 65537, size=64) for _ in range(4)]
    cts = [ctx.encrypt_sk(ctx.make_plaintext_rns(v), sk) for v in vals]
    acc = cts[0]
    for ct in cts[1:]:
        acc = ctx.ct_ct_mul_relin(acc, ct, rlk)
    slots, _ = ctx.decrypt(acc, sk)
    want = np.ones(64, dtype=object)
    for v in vals:
        want = (want * v) % 65537
    np.testing.assert_array_equal(
        np.asarray([int(v) for v in slots]), np.asarray([int(v) for v in want])
    )


def test_bfv_hps_zero_slots():
    """The PIE's zero test through textbook multiplication."""
    ctx = ctx_small(seed=71, limbs=6)
    sk, _ = ctx.keygen()
    rlk = ctx.relin_keygen(sk)
    a = np.arange(2, 66)
    ca = ctx.encrypt_sk(ctx.make_plaintext_rns(a), sk)
    cneg = ctx.encrypt_sk(ctx.make_plaintext_rns([-int(v) for v in a]), sk)
    diff = ctx.ct_add(ca, cneg)
    other = ctx.encrypt_sk(ctx.make_plaintext_rns(np.arange(1, 65)), sk)
    prod = ctx.ct_ct_mul_relin(diff, other, rlk)
    slots, _ = ctx.decrypt(prod, sk)
    assert all(int(v) == 0 for v in slots)


def test_bfv_bridge_still_available():
    """ct_ct_mul_bridge keeps the exact t-scaling path (and mixed-form
    operands route through it automatically in ct_ct_mul)."""
    ctx = ctx_small(seed=73, limbs=10)
    sk, _ = ctx.keygen()
    rlk = ctx.relin_keygen(sk)
    rng = np.random.default_rng(9)
    a = rng.integers(0, 65537, size=64)
    b = rng.integers(0, 65537, size=64)
    ca = ctx.encrypt_sk(ctx.make_plaintext_rns(a), sk)
    cb = ctx.encrypt_sk(ctx.make_plaintext_rns(b), sk)
    prod = ctx.relinearize(ctx.ct_ct_mul_bridge(ca, cb), rlk)
    # pre-relin the product is BGV-form; relinearization Delta-lifts it
    assert prod.form == "bfv" and prod.scale != 1
    slots, _ = ctx.decrypt(prod, sk)
    np.testing.assert_array_equal(
        np.asarray([int(v) for v in slots]),
        np.asarray([int(v) for v in (a.astype(object) * b) % 65537]),
    )
