"""ElGamal track tests: primitives (reference TestElGamal.cpp), PIE engines
(TestElGamalPIE.cpp) and both protocols end-to-end over loopback."""

import numpy as np
import pytest

from nested_hashing_psi_tpu.config import HashTableParams, PSIParams
from nested_hashing_psi_tpu.crypto.ec import EcGroup
from nested_hashing_psi_tpu.crypto.elgamal import AddHomElGamal
from nested_hashing_psi_tpu.protocol.runner import run_in_process


@pytest.fixture(scope="module")
def eg():
    e = AddHomElGamal(EcGroup("P-192"))  # smaller curve: faster tests
    e.keygen()
    return e


def test_homomorphic_ops(eg):
    a, b = eg.encrypt(17), eg.encrypt(25)
    s = eg.add(a, b)
    assert eg.decrypts_to_zero(eg.add(s, eg.encrypt(-42)))
    d = eg.subtract(b, a)
    assert eg.decrypts_to_zero(eg.add(d, eg.encrypt(-8)))
    m = eg.mult_by_const(a, 3)
    assert eg.decrypts_to_zero(eg.add(m, eg.encrypt(-51)))


def test_xor_tricks(eg):
    # bit xor
    assert eg.decrypts_to_zero(eg.xor_by_const(eg.encrypt(1), True))
    assert not eg.decrypts_to_zero(eg.xor_by_const(eg.encrypt(0), True))
    # element xor: Enc(b*e) -> Enc((1-b)*e)
    assert eg.decrypts_to_zero(eg.element_xor_by_const(eg.encrypt(99), 99))


def test_randomized_equality_gadgets(eg):
    minus = eg.encrypt(-123)
    zero = eg.encrypt_zero()
    eq = eg.randomized_equality(minus, eg.encrypt(123), zero)
    assert eg.decrypts_to_zero(eq)
    neq = eg.randomized_equality(minus, eg.encrypt(124), zero)
    assert not eg.decrypts_to_zero(neq)
    # plain (stash) variant
    assert eg.decrypts_to_zero(eg.randomized_equality(minus, 123, zero))


def test_indexed_randomized_equality(eg):
    # one-hot selection of table value 55 at position 2, element 55
    idx = [eg.encrypt(0), eg.encrypt(0), eg.encrypt(1), eg.encrypt(0)]
    table = [10, 20, 55, 70]
    res = eg.indexed_randomized_equality(idx, table, eg.encrypt(-55), eg.encrypt_zero())
    assert eg.decrypts_to_zero(res)
    res2 = eg.indexed_randomized_equality(idx, table, eg.encrypt(-20), eg.encrypt_zero())
    assert not eg.decrypts_to_zero(res2)


def test_ct_serialization(eg):
    ct = eg.encrypt(777)
    back = eg.ct_from_bytes(eg.ct_to_bytes(ct))
    assert eg.decrypts_to_zero(eg.add(back, eg.encrypt(-777)))


def elgamal_params(**over):
    base = dict(
        server_set_size=60,
        client_set_size=4,
        intersection_set_size=2,
        bit_size=16,
        curve_name="P-192",
    )
    base.update(over)
    return PSIParams(**base)


def elgamal_ht(**over):
    base = dict(
        each_simple_table_size=8,
        each_cuckoo_table_size=6,
        n_simple_hash_functions=2,
        n_cuckoo_hash_functions=2,
        max_items_per_position=3,
    )
    base.update(over)
    return HashTableParams(**base)


def test_simple_elgamal_e2e():
    client, _, ok = run_in_process(elgamal_params(), elgamal_ht())
    assert ok
    assert len(client.intersection_calculated) == 2


def test_precomp_elgamal_e2e():
    client, _, ok = run_in_process(
        elgamal_params(precomp=True), elgamal_ht()
    )
    assert ok
    assert len(client.intersection_calculated) == 2


def test_simple_elgamal_with_stash():
    client, _, ok = run_in_process(
        elgamal_params(), elgamal_ht(server_stash_size=2)
    )
    assert ok


# ---------------------------------------------------------------------------
# combined-table modes (-s / -c; reference CuckooHashTable.cpp:169-180) and
# --nThreads (reference ElGamalPSIServer.hpp:62-80)
# ---------------------------------------------------------------------------

import pytest


@pytest.mark.parametrize("precomp", [False, True])
@pytest.mark.parametrize(
    "simple_multi,cuckoo_multi",
    [(False, True), (True, False), (False, False)],
    ids=["combined-simple", "combined-cuckoo", "combined-both"],
)
def test_elgamal_combined_tables_e2e(precomp, simple_multi, cuckoo_multi):
    """-s / -c / -s -c on both ElGamal protocols: one combined table shared
    by all hash functions instead of one table per hash function. (The FHE
    PIEs reject combined tables, like the reference BatchedFHEHIPPIE.cpp:18-21.)"""
    client, _, ok = run_in_process(
        elgamal_params(precomp=precomp),
        elgamal_ht(
            simple_multi_table=simple_multi,
            cuckoo_multi_table=cuckoo_multi,
            # a combined cuckoo table packs H hash functions into one table:
            # give it the headroom of the multi-table layout
            each_cuckoo_table_size=12 if not cuckoo_multi else 6,
            each_simple_table_size=16 if not simple_multi else 8,
        ),
    )
    assert ok
    assert len(client.intersection_calculated) == 2


@pytest.mark.parametrize("precomp", [False, True])
def test_elgamal_nthreads_e2e(precomp):
    """--nThreads > 1 runs the PIE cells on a worker pool; results and
    ordering are identical to the serial path (self-verifying client)."""
    client, server, ok = run_in_process(
        elgamal_params(precomp=precomp, number_of_threads=2),
        elgamal_ht(),
    )
    assert ok
    assert len(client.intersection_calculated) == 2


def test_fhe_pie_rejects_combined_tables():
    """The batched FHE PIE refuses combined tables, like the reference
    (BatchedFHEHIPPIE.cpp:18-21). Constructed directly: inside the protocol
    the server raises during its offline phase."""
    from nested_hashing_psi_tpu.fhe.bgv import BGVContext
    from nested_hashing_psi_tpu.fhe.params import SchemeParams
    from nested_hashing_psi_tpu.hashing import (
        HierarchicalCuckooHashTable,
        TabulationHashing,
    )
    from nested_hashing_psi_tpu.pie.batched_fhe import BatchedFHEPIE

    hasher = TabulationHashing(11, 4)
    hct = HierarchicalCuckooHashTable(
        hasher, each_simple_table_size=8, each_cuckoo_table_size=12,
        n_simple_hash_functions=2, n_cuckoo_hash_functions=2,
        max_items_per_position=3, cuckoo_multi_table=False, seed=1,
    )
    ctx = BGVContext(
        SchemeParams(ring_dim=32, plaintext_modulus=65537, num_limbs=3), seed=2
    )
    sk, _ = ctx.keygen()
    rlk = ctx.relin_keygen(sk)
    with pytest.raises(ValueError, match="combined"):
        BatchedFHEPIE(ctx, hct, rlk)
