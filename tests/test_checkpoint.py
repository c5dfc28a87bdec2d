"""Offline-artifact checkpoint/resume: a restored BatchedFHEPIE must produce
the same online results without rebuilding tables or re-encoding."""

import numpy as np

from nested_hashing_psi_tpu.utils.checkpoint import load_batched_pie, save_batched_pie


def test_batched_pie_checkpoint_roundtrip(tmp_path):
    import tests.test_batched_pie as tb
    from nested_hashing_psi_tpu.pie.batched_fhe import (
        BatchedFHEClientOps,
        BatchedFHEPIE,
    )
    from nested_hashing_psi_tpu.fhe.bgv import BGVContext
    from nested_hashing_psi_tpu.fhe.params import SchemeParams
    from nested_hashing_psi_tpu.hashing import (
        CuckooHashTable,
        HierarchicalCuckooHashTable,
        TabulationHashing,
    )
    from nested_hashing_psi_tpu.hashing.tabulation import items_from_ints

    hasher = TabulationHashing(77, 4)
    hct = HierarchicalCuckooHashTable(
        hasher, each_simple_table_size=8, each_cuckoo_table_size=8,
        n_simple_hash_functions=2, n_cuckoo_hash_functions=2,
        max_items_per_position=3, seed=1,
    )
    hct.insert_all(items_from_ints(list(range(10, 60))))
    ctx = BGVContext(SchemeParams(ring_dim=32, plaintext_modulus=65537, num_limbs=8), seed=2)
    sk, _ = ctx.keygen()
    rlk = ctx.relin_keygen(sk)
    pie = BatchedFHEPIE(ctx, hct, rlk, mask_seed=5)

    path = str(tmp_path / "pie.npz")
    save_batched_pie(path, pie)
    restored = load_batched_pie(path, ctx, rlk)

    ct_table = CuckooHashTable(hasher, 8, 2, max_items_per_position=1, seed=3)
    ct_table.insert_all(items_from_ints([12, 999]))
    ops = BatchedFHEClientOps(ctx, ct_table, 2, 2, 8)
    idx, minus = ops.encrypt_query(sk)

    r1 = np.asarray(pie.run(idx, minus).data)
    r2 = np.asarray(restored.run(idx, minus).data)
    np.testing.assert_array_equal(r1, r2)

    # self-contained resume: nothing but the file (ctx + rlk rebuilt from the
    # persisted scheme params / key material)
    solo = load_batched_pie(path)
    assert solo.ctx.params == ctx.params
    r3 = np.asarray(solo.run(idx, minus).data)
    np.testing.assert_array_equal(r1, r3)


def test_checkpoint_rejects_unknown_version(tmp_path):
    import pytest

    path = str(tmp_path / "old.npz")
    np.savez_compressed(path, version=1)
    with pytest.raises(ValueError, match="version 1"):
        load_batched_pie(path)
