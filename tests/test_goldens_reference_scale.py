"""Reference-scale golden tests: the production FHE regime (ring 16384,
33-bit plaintext modulus, real table geometry) executed under pytest.

These reproduce the semantics (scale, parameters, seeds and pass criteria)
of the reference's PIE-engine integration tests:
 - TestFHEPIE      (/root/reference/tests/TestFHEPIE.cpp:52-134):
   15,000 items, blocked cuckoo table 100x100, 3 hash functions, BFV with
   t = 2^32+2^20+2^19+1, ring 16384; client element drawn from the set;
   a decrypted result slot must be 0 ("Matches").
 - TestBatchedFHEPIE (/root/reference/tests/TestBatchedFHEPIE.cpp:54-150):
   nested table 1x10x20, 2+2 hash functions, 100 items, seeds
   122333444455555 / 12223222, batch slots carrying the same client element
   twice; exactly two (depth, slot) zeros ("Matches" exactly twice).
 - TestFHEInnerP   (/root/reference/tests/TestFHEInnerP.cpp:83-122):
   known 12-slot vectors, EvalInnerProduct + EvalMerge + serialization
   round-trip; expected merged slots [0, 1, 0, 1].

Marked `slow`: together they run minutes on the 2-vCPU CI sandbox (they
execute thousands of ring-16384 NTTs).
"""

import numpy as np
import pytest

from nested_hashing_psi_tpu.fhe.bfv import make_context
from nested_hashing_psi_tpu.fhe.bgv import Ciphertext
from nested_hashing_psi_tpu.fhe.params import SchemeParams, default_num_limbs
from nested_hashing_psi_tpu.hashing import (
    CuckooHashTable,
    HierarchicalCuckooHashTable,
    TabulationHashing,
)
from nested_hashing_psi_tpu.hashing.tabulation import items_from_ints
from nested_hashing_psi_tpu.pie.batched_fhe import BatchedFHEClientOps, BatchedFHEPIE
from nested_hashing_psi_tpu.pie.simple_fhe import SimpleFHEPIE

pytestmark = pytest.mark.slow

T_33 = (1 << 32) + (1 << 20) + (1 << 19) + 1  # reference 32-bit-items modulus
FIX_SEED = 122333444455555                    # reference test item seed
HASH_SEED = 12223222                          # reference test hasher seed
RING = 16384


def _random_items_mod_t(count: int, t: int, seed: int) -> list[int]:
    """Nonzero uniform draws mod t (semantics of the reference's
    randomBiginteger(mt) % n loop, TestFHEPIE.cpp:59-68)."""
    rng = np.random.default_rng(seed)
    out = []
    while len(out) < count:
        v = int(rng.integers(0, 1 << 63, dtype=np.uint64)) % t
        if v:
            out.append(v)
    return out


def test_golden_fhe_pie_15000_items_ring16384():
    """TestFHEPIE semantics: 15,000 items / 100x100 table / 3 HFs / 33-bit t."""
    n_items, table_size, bin_size, n_hf = 15000, 100, 100, 3
    items = _random_items_mod_t(n_items, T_33, FIX_SEED)
    client_elem = items[n_items // 2]

    hasher = TabulationHashing(HASH_SEED, 1 + n_hf)
    hct = HierarchicalCuckooHashTable(
        hasher,
        each_simple_table_size=1,          # bare cuckoo table (no outer split)
        each_cuckoo_table_size=table_size,
        n_simple_hash_functions=1,
        n_cuckoo_hash_functions=n_hf,
        max_items_per_position=bin_size,
        seed=5,
    )
    hct.insert_all(items_from_ints(items))
    stored = hct.table[..., 0]
    assert (stored != 0).sum() == n_items  # all 15,000 inserted, no stash

    limbs = default_num_limbs(T_33.bit_length(), 0, table_size, "bfv", eval_sum=True)
    ctx = make_context(
        SchemeParams(RING, T_33, num_limbs=limbs, scheme="bfv"), seed=11
    )
    ctx.params.validate_security()  # log2(q) under the HEStd_128 bound
    sk, _ = ctx.keygen()
    gks = {k: v for k, v in ctx.galois_keygen(sk, ctx.sum_ladder_elements()).items()}

    pie = SimpleFHEPIE(ctx, hct, gks, mask_seed=17)

    # client: one-hot(hash pos) || -elem per hash function (TestFHEPIE.cpp:94-113)
    vec = np.zeros((1, n_hf, table_size + 1), dtype=object)
    item = items_from_ints([client_elem])
    for h in range(n_hf):
        pos = int(hasher.hash_index(item, 1 + h, table_size)[0])
        vec[0, h, pos] = 1
    vec[0, :, table_size] = -client_elem
    pt = ctx.make_plaintext_rns(vec.reshape(n_hf, table_size + 1))
    idx_ct = Ciphertext(
        ctx.encrypt_sk(pt, sk).data.reshape(1, n_hf, 2, ctx.L, ctx.n)
    )

    result = pie.run(idx_ct)
    slots, noise = ctx.decrypt(result, sk, length=bin_size)
    assert noise < ctx.params.q.bit_length() - T_33.bit_length() - 2, (
        f"noise margin blown: {noise}"
    )

    zeros = np.array(
        [[int(v) == 0 for v in bins] for bins in np.asarray(slots).reshape(n_hf, -1)]
    )
    assert zeros.any(), "client element from the set must produce a 0 slot"
    # the element is stored at exactly one (hf, bin); masks are nonzero, so
    # with overwhelming probability there is exactly one zero
    assert zeros.sum() == 1


def test_golden_batched_fhe_pie_reference_geometry():
    """TestBatchedFHEPIE: 1x10x20 nested table, 2+2 HFs, 100 items, exact
    reference seeds, both batch slots carrying the client element."""
    n_items = 100
    n_simple_hf, n_cuckoo_hf = 2, 2
    simple_size, cuckoo_size, bin_size = 1, 10, 20
    items = _random_items_mod_t(n_items, T_33, FIX_SEED)
    client_elem = items[n_items // 2]

    hasher = TabulationHashing(HASH_SEED, n_simple_hf + n_cuckoo_hf)
    hct = HierarchicalCuckooHashTable(
        hasher,
        each_simple_table_size=simple_size,
        each_cuckoo_table_size=cuckoo_size,
        n_simple_hash_functions=n_simple_hf,
        n_cuckoo_hash_functions=n_cuckoo_hf,
        max_items_per_position=bin_size,
        seed=6,
    )
    hct.insert_all(items_from_ints(items))

    limbs = default_num_limbs(T_33.bit_length(), n_cuckoo_hf - 1, cuckoo_size)
    ctx = make_context(
        SchemeParams(RING, T_33, num_limbs=limbs, scheme="bfv"), seed=12
    )
    ctx.params.validate_security()
    sk, _ = ctx.keygen()
    rlk = ctx.relin_keygen(sk)
    pie = BatchedFHEPIE(ctx, hct, rlk, mask_seed=18)
    assert pie.batch_slots == n_simple_hf * simple_size == 2

    # index matrix: both slots carry the element (TestBatchedFHEPIE.cpp:103-125)
    item = items_from_ints([client_elem])
    index = np.zeros((n_cuckoo_hf, cuckoo_size, pie.batch_slots), dtype=object)
    for h in range(n_cuckoo_hf):
        pos = int(hasher.hash_index(item, n_simple_hf + h, cuckoo_size)[0])
        index[h, pos, :] = 1
    idx_pt = ctx.make_plaintext_rns(
        index.reshape(n_cuckoo_hf * cuckoo_size, pie.batch_slots)
    )
    idx_ct = Ciphertext(
        ctx.encrypt_sk(idx_pt, sk).data.reshape(
            n_cuckoo_hf, cuckoo_size, 2, ctx.L, ctx.n
        )
    )
    minus = np.full(pie.batch_slots, -client_elem, dtype=object)
    minus_ct = ctx.encrypt_sk(ctx.make_plaintext_rns(minus), sk)

    result = pie.run(idx_ct, minus_ct)
    slots, noise = ctx.decrypt(result, sk, length=pie.batch_slots)
    assert noise < ctx.params.q.bit_length() - T_33.bit_length() - 2, (
        f"noise margin blown: {noise}"
    )

    zeros = np.array([[int(v) == 0 for v in row] for row in np.asarray(slots)])
    assert zeros.shape == (bin_size, 2)
    # "Test should output matches twice": the element lives at exactly one
    # depth; both slots match there and nowhere else
    assert zeros.sum() == 2
    assert zeros.any(axis=0).all(), "both batch slots must match"


def test_golden_inner_product_known_vector_with_serialization():
    """TestFHEInnerP: known 12-slot vectors; EvalInnerProduct of (ct1,pt3)
    and (ct2,pt3) merged -> slots [0, 1, 0, 1]; ciphertext and key tensors
    survive a wire round-trip."""
    t = 65537
    v1 = [0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 123]
    v2 = [1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 654]
    v3 = [-653 + t, 243, 65536, -123, 432, 43, 25, 643, 31, 324, 31, 1]

    limbs = default_num_limbs(17, 0, 12)
    ctx = make_context(SchemeParams(RING, t, num_limbs=limbs, scheme="bfv"), seed=13)
    sk, pk = ctx.keygen()
    gks = ctx.galois_keygen(sk, ctx.sum_ladder_elements())

    # serialization round-trip (the reference serializes context/pk/cts)
    from nested_hashing_psi_tpu.protocol.channel import tensor_from_bytes, tensor_to_bytes

    pt3 = ctx.make_plaintext_mont(np.array(v3, dtype=object))
    ct1 = ctx.encrypt_pk(ctx.make_plaintext_rns(np.array(v1, dtype=object)), pk)
    ct2 = ctx.encrypt_pk(ctx.make_plaintext_rns(np.array(v2, dtype=object)), pk)
    ct1 = Ciphertext(
        np.asarray(tensor_from_bytes(tensor_to_bytes(np.asarray(ct1.data)))),
        ct1.form, ct1.scale,
    )

    def inner(ct):
        prod = Ciphertext(
            np.asarray(ctx.ct_pt_mul(ct, pt3).data), ct.form, ct.scale
        )
        return ctx.eval_sum_all_slots(prod, gks)

    r1, r2 = inner(ct1), inner(ct2)
    # EvalMerge equivalent: one-hot selectors place result i in slot i
    sel = ctx.make_plaintext_mont(np.eye(4, dtype=np.int64).astype(object))
    merged = None
    for i, r in enumerate([r1, r2, r1, r2]):
        part = ctx.ct_pt_mul(r, sel[i])
        merged = part if merged is None else ctx.ct_add(merged, part)

    slots, noise = ctx.decrypt(merged, sk, length=6)
    assert noise < ctx.params.q.bit_length() - 20
    got = [int(v) for v in np.asarray(slots)[:4]]
    assert got == [0, 1, 0, 1], got
