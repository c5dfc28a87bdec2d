"""Golden test for the batched FHE PIE, reproducing the semantics of the
reference's TestBatchedFHEPIE (/root/reference/tests/TestBatchedFHEPIE.cpp:54-150):
build a nested server table and a client cuckoo table over shared seeded
hashing, run the encrypted indexed-equality pipeline, and verify that exactly
the common items decrypt to zero slots.
"""

import numpy as np
import pytest

from nested_hashing_psi_tpu.fhe.bgv import BGVContext
from nested_hashing_psi_tpu.fhe.params import SchemeParams
from nested_hashing_psi_tpu.hashing import (
    CuckooHashTable,
    HierarchicalCuckooHashTable,
    TabulationHashing,
)
from nested_hashing_psi_tpu.hashing.tabulation import items_from_ints, items_to_ints
from nested_hashing_psi_tpu.pie.batched_fhe import BatchedFHEClientOps, BatchedFHEPIE

HASH_SEED = 122333444455555  # reference test seed (TestBatchedFHEPIE.cpp)
N_SIMPLE_HF = 2
N_CUCKOO_HF = 2
SIMPLE_SIZE = 16
CUCKOO_SIZE = 8
MAX_PP = 3
RING = 64  # batch_slots = 32 <= 64


@pytest.fixture(scope="module")
def pie_setup():
    hasher = TabulationHashing(HASH_SEED, N_SIMPLE_HF + N_CUCKOO_HF)
    server_items = items_from_ints(list(range(100, 160)))  # 60 items
    client_vals = [105, 131, 159, 4242, 9999]  # 3 hits, 2 misses
    client_items = items_from_ints(client_vals)

    hct = HierarchicalCuckooHashTable(
        hasher,
        each_simple_table_size=SIMPLE_SIZE,
        each_cuckoo_table_size=CUCKOO_SIZE,
        n_simple_hash_functions=N_SIMPLE_HF,
        n_cuckoo_hash_functions=N_CUCKOO_HF,
        max_items_per_position=MAX_PP,
        seed=7,
    )
    hct.insert_all(server_items)

    client_table = CuckooHashTable(
        hasher,
        each_table_size=SIMPLE_SIZE,
        n_hash_functions=N_SIMPLE_HF,
        starting_hash_id=0,
        max_items_per_position=1,
        seed=8,
    )
    client_table.insert_all(client_items)

    ctx = BGVContext(
        SchemeParams(ring_dim=RING, plaintext_modulus=65537, num_limbs=8), seed=4
    )
    sk, _ = ctx.keygen()
    rlk = ctx.relin_keygen(sk)
    return ctx, sk, rlk, hct, client_table, client_vals


def test_batched_pie_end_to_end(pie_setup):
    ctx, sk, rlk, hct, client_table, client_vals = pie_setup
    pie = BatchedFHEPIE(ctx, hct, rlk, mask_seed=99)
    client_ops = BatchedFHEClientOps(
        ctx, client_table, N_SIMPLE_HF, N_CUCKOO_HF, CUCKOO_SIZE
    )
    idx_ct, minus_ct = client_ops.encrypt_query(sk)
    result = pie.run(idx_ct, minus_ct)

    slots, noise = ctx.decrypt(result, sk, length=pie.batch_slots)
    assert noise < 8 * 31 - 10, f"noise budget blown: {noise}"
    intersection = client_ops.extract_intersection(np.asarray(slots))

    got = sorted(items_to_ints(intersection))
    expected = sorted(v for v in client_vals if 100 <= v < 160)
    assert got == expected


def test_batched_pie_no_matches(pie_setup):
    ctx, sk, rlk, hct, _, _ = pie_setup
    hasher = TabulationHashing(HASH_SEED, N_SIMPLE_HF + N_CUCKOO_HF)
    client_table = CuckooHashTable(
        hasher,
        each_table_size=SIMPLE_SIZE,
        n_hash_functions=N_SIMPLE_HF,
        starting_hash_id=0,
        max_items_per_position=1,
        seed=9,
    )
    client_table.insert_all(items_from_ints([777, 888]))
    pie = BatchedFHEPIE(ctx, hct, rlk, mask_seed=100)
    ops = BatchedFHEClientOps(ctx, client_table, N_SIMPLE_HF, N_CUCKOO_HF, CUCKOO_SIZE)
    idx_ct, minus_ct = ops.encrypt_query(sk)
    slots, _ = ctx.decrypt(pie.run(idx_ct, minus_ct), sk, length=pie.batch_slots)
    assert len(ops.extract_intersection(np.asarray(slots))) == 0


def test_host_table_pie_matches_device(pie_setup):
    """host_table=True (table beyond HBM at 2^28 scale): slab-encoded host
    tensor + streamed position slices produce bit-identical results."""
    ctx, sk, rlk, hct, client_table, client_vals = pie_setup
    import numpy as np

    dev = BatchedFHEPIE(ctx, hct, rlk, mask_seed=99)
    host = BatchedFHEPIE(ctx, hct, rlk, mask_seed=99, host_table=True,
                         encode_slab=7)
    assert isinstance(host.table_pt, np.ndarray)
    np.testing.assert_array_equal(np.asarray(dev.table_pt), host.table_pt)

    client_ops = BatchedFHEClientOps(
        ctx, client_table, N_SIMPLE_HF, N_CUCKOO_HF, CUCKOO_SIZE
    )
    idx_ct, minus_ct = client_ops.encrypt_query(sk)
    a = dev.run(idx_ct, minus_ct)
    b = host.run(idx_ct, minus_ct)
    np.testing.assert_array_equal(np.asarray(a.data), np.asarray(b.data))


def test_run_many_matches_run(pie_setup):
    """Q-batched single-dispatch path (run_many) is bit-identical to Q
    separate run() dispatches."""
    import jax.numpy as jnp

    ctx, sk, rlk, hct, client_table, client_vals = pie_setup
    pie = BatchedFHEPIE(ctx, hct, rlk, mask_seed=21)
    ops = BatchedFHEClientOps(
        ctx, client_table, N_SIMPLE_HF, N_CUCKOO_HF, CUCKOO_SIZE
    )
    idx_ct, minus_ct = ops.encrypt_query(sk)
    singles = [np.asarray(pie.run(idx_ct, minus_ct).data) for _ in range(3)]
    batch = pie.run_many(
        jnp.stack([idx_ct.data] * 3), jnp.stack([minus_ct.data] * 3)
    )
    got = np.asarray(batch)
    assert got.shape[0] == 3
    for q in range(3):
        assert np.array_equal(got[q], singles[q])
