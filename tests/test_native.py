"""Native C++ host kernel tests: bit-exact vs Python reference models."""

import numpy as np
import pytest

from nested_hashing_psi_tpu.hashing import CuckooHashTable, TabulationHashing
from nested_hashing_psi_tpu.hashing.tabulation import items_from_ints
from nested_hashing_psi_tpu.ops import primes, refmodel
from nested_hashing_psi_tpu.utils import native

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable"
)


def test_native_ntt_small_prime_matches_refmodel():
    n = 128
    p = primes.ntt_primes(1, 31, 2 * n)[0]
    psi = primes.primitive_root_of_unity(p, 2 * n)
    rng = np.random.default_rng(0)
    a = rng.integers(0, p, size=(3, n), dtype=np.uint64)
    got = native.ntt_mod_t(a, p, psi, inverse=False)
    expected = refmodel.ntt_numpy(a, p, psi)
    np.testing.assert_array_equal(got, expected)
    back = native.ntt_mod_t(got, p, psi, inverse=True)
    np.testing.assert_array_equal(back, a)


def test_native_ntt_big_modulus_roundtrip():
    n = 64
    t = (1 << 48) + (1 << 22) + (1 << 20) + 1  # 49-bit plaintext modulus
    psi = primes.primitive_root_of_unity(t, 2 * n)
    rng = np.random.default_rng(1)
    a = rng.integers(0, t, size=(2, n), dtype=np.uint64)
    fwd = native.ntt_mod_t(a, t, psi, inverse=False)
    back = native.ntt_mod_t(fwd, t, psi, inverse=True)
    np.testing.assert_array_equal(back, a)
    # cross-check one row against exact object arithmetic
    from nested_hashing_psi_tpu.fhe.encoding import _ntt_object

    expected = _ntt_object(a.astype(object), t, psi, inverse=False)
    assert [int(v) for v in fwd[0]] == [int(v) for v in expected[0]]


def test_native_cuckoo_matches_reference_semantics():
    h = TabulationHashing(seed=99, n_hash_functions=2)
    items = items_from_ints(list(range(2, 120)))
    size = 160  # load factor 118/320 = 0.37, below the 2-choice threshold
    res = native.cuckoo_insert_seq(
        items, h.table, starting_hash_id=0, n_hf=2, size=size, max_pp=1,
        multi_table=True, stash_size=0, seed=7,
    )
    table, stash, failures = res
    assert failures == 0
    # all items present, each at one of its hashed positions
    stored = table.reshape(-1, 2)
    stored = {tuple(r) for r in stored[(stored != 0).any(axis=1)].tolist()}
    assert stored == {tuple(r) for r in items.tolist()}
    for t in range(2):
        for pos in range(size):
            it = table[t, 0, pos]
            if (it == 0).all():
                continue
            assert h.hash_index(it[None, :], t, size)[0] == pos


def test_big_t_encoder_uses_native():
    """48-bit plaintext modulus encode/decode roundtrip (native fast path)."""
    from nested_hashing_psi_tpu.fhe.encoding import PackedEncoder

    t = (1 << 40) + (1 << 22) + (1 << 20) + 1
    enc = PackedEncoder(32, t)
    rng = np.random.default_rng(2)
    vals = [int(v) for v in rng.integers(0, 2**39, size=32)]
    back = enc.decode(enc.encode(vals))
    assert [int(v) for v in back] == vals
