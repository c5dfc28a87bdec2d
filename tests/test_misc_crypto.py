"""Damgard-Jurik additive HE (reference TestDamgardJurik parity) and the
AES-CTR PRG reset contract."""

import numpy as np

from nested_hashing_psi_tpu.crypto.damgard_jurik import DamgardJurik
from nested_hashing_psi_tpu.utils.prg import AesCtrPrg


def test_damgard_jurik_roundtrip_and_homomorphism():
    dj = DamgardJurik(modulus_bits=256, s=1)
    for m in (0, 1, 42, dj.n_s - 1):
        assert dj.decrypt(dj.encrypt(m)) == m
    a, b = 1234, 98765
    assert dj.decrypt(dj.add(dj.encrypt(a), dj.encrypt(b))) == a + b
    assert dj.decrypt(dj.mult_by_const(dj.encrypt(a), 7)) == 7 * a


def test_damgard_jurik_s2():
    dj = DamgardJurik(modulus_bits=256, s=2)
    big = dj.n + 12345  # plaintext larger than N: needs s >= 2
    assert dj.decrypt(dj.encrypt(big)) == big
    assert dj.decrypt(dj.add(dj.encrypt(big), dj.encrypt(1))) == big + 1


def test_aes_ctr_prg_reset_reproduces_stream():
    prg = AesCtrPrg(b"0123456789abcdef")
    first = prg.get_bits(1000)
    more = prg.get_bits(64)
    prg.reset()
    again = np.concatenate([prg.get_bits(1000), prg.get_bits(64)])
    np.testing.assert_array_equal(np.concatenate([first, more]), again)
    # distinct keys -> distinct streams
    other = AesCtrPrg(b"fedcba9876543210").get_bits(1000)
    assert not np.array_equal(first, other)
