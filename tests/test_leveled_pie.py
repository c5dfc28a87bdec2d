"""Leveled batched PIE: mod-switch down the cross-hash multiplication chain
(the reference's MultiplicativeDepth schedule, BatchedFHEPSIClient.cpp:44-57).

Checks: leveled and flat pipelines find the same intersection; the leveled
result ships with L - (H-1) limbs; noise stays within budget; and the
48-bit / 3-hash-function configuration -- impossible flat (VERDICT round 1:
17 limbs = 527 bits > the 438-bit HEStd_128 cap) -- fits under the cap with
the HPS BFV noise model.
"""

import numpy as np
import pytest

from nested_hashing_psi_tpu.fhe.bgv import BGVContext, Ciphertext
from nested_hashing_psi_tpu.fhe.params import (
    LIMB_BITS,
    MAX_LOG_Q_128,
    SchemeParams,
    default_num_limbs,
    plaintext_modulus_for_bit_size,
)
from nested_hashing_psi_tpu.hashing import (
    CuckooHashTable,
    HierarchicalCuckooHashTable,
    TabulationHashing,
)
from nested_hashing_psi_tpu.hashing.tabulation import items_from_ints, items_to_ints
from nested_hashing_psi_tpu.pie.batched_fhe import BatchedFHEClientOps, BatchedFHEPIE


def _setup(n_cuckoo_hf, ring=256, limbs=8):
    n_simple_hf, simple_size, cuckoo_size, max_pp = 2, 16, 8, 4
    hasher = TabulationHashing(31337, n_simple_hf + n_cuckoo_hf)
    server_items = items_from_ints(list(range(200, 260)))
    client_vals = [205, 231, 4242]
    hct = HierarchicalCuckooHashTable(
        hasher,
        each_simple_table_size=simple_size,
        each_cuckoo_table_size=cuckoo_size,
        n_simple_hash_functions=n_simple_hf,
        n_cuckoo_hash_functions=n_cuckoo_hf,
        max_items_per_position=max_pp,
        seed=3,
    )
    hct.insert_all(server_items)
    client_table = CuckooHashTable(
        hasher,
        each_table_size=simple_size,
        n_hash_functions=n_simple_hf,
        max_items_per_position=1,
        seed=4,
    )
    client_table.insert_all(items_from_ints(client_vals))
    ctx = BGVContext(
        SchemeParams(ring_dim=ring, plaintext_modulus=65537, num_limbs=limbs),
        seed=9,
    )
    sk, _ = ctx.keygen()
    rlk = ctx.relin_keygen(sk)
    ops = BatchedFHEClientOps(ctx, client_table, n_simple_hf, n_cuckoo_hf, cuckoo_size)
    idx_ct, minus_ct = ops.encrypt_query(sk)
    return ctx, sk, rlk, hct, ops, idx_ct, minus_ct


@pytest.mark.parametrize("n_cuckoo_hf", [2, 3])
def test_leveled_matches_flat(n_cuckoo_hf):
    ctx, sk, rlk, hct, ops, idx_ct, minus_ct = _setup(n_cuckoo_hf)

    flat_pie = BatchedFHEPIE(ctx, hct, rlk, mask_seed=7, leveled=False)
    lev_pie = BatchedFHEPIE(ctx, hct, rlk, mask_seed=7, leveled=True)
    assert flat_pie.leveled is False and lev_pie.leveled is True

    flat = flat_pie.run(idx_ct, minus_ct)
    lev = lev_pie.run(idx_ct, minus_ct)

    assert flat.data.shape[-2] == ctx.L
    Lf = ctx.L - (n_cuckoo_hf - 1)
    assert lev.data.shape[-2] == Lf, "leveled result must drop one limb per mult"

    expected = sorted([205, 231])

    slots_f, _ = ctx.decrypt(flat, sk, length=flat_pie.batch_slots)
    got_f = sorted(items_to_ints(ops.extract_intersection(np.asarray(slots_f))))
    assert got_f == expected

    dctx = ctx.context_for_limbs(Lf)
    dsk = ctx.shrink_key_to(sk, Lf)
    slots_l, noise = dctx.decrypt(lev, dsk, length=lev_pie.batch_slots)
    got_l = sorted(items_to_ints(ops.extract_intersection(np.asarray(slots_l))))
    assert got_l == expected
    assert noise < dctx.params.q.bit_length() - 10, f"leveled noise too high: {noise}"


def test_leveled_default_predicate():
    from nested_hashing_psi_tpu.fhe.params import leveled_default

    # the protocol enables leveling for BGV + device-sized t + H > 1
    assert leveled_default("bgv", 65537, 2) is True
    assert leveled_default("bfv", 65537, 2) is False  # HPS: additive noise
    assert leveled_default("bgv", (1 << 32) + 1, 2) is False  # t too big
    assert leveled_default("bgv", 65537, 1) is False  # no ct x ct mult


def test_leveled_limb_budget_smaller_at_depth():
    """The leveled budget undercuts the flat one once the chain is deep."""
    flat = default_num_limbs(17, 2, 500, "bgv")
    lev = default_num_limbs(17, 2, 500, "bgv", leveled=True)
    assert lev < flat


def test_48bit_3hf_fits_security_cap():
    """48-bit items with 3 cuckoo hash functions under HEStd_128 at 16384.

    Flat BGV budgeting needed 527 bits of modulus (> 438, impossible); the
    HPS BFV noise model fits comfortably.
    """
    t = plaintext_modulus_for_bit_size(48)
    limbs = default_num_limbs(t.bit_length(), 2, 5000, "bfv")
    assert limbs * LIMB_BITS <= MAX_LOG_Q_128[16384]
    sp = SchemeParams(16384, t, num_limbs=limbs, scheme="bfv")
    sp.validate_security()  # raises if over the cap


def test_mask_plaintext_limb_slice_is_child_encoding():
    """Plaintext RNS limbs are independent: slicing the first L' limbs of a
    full-modulus Montgomery plaintext equals encoding in the child context."""
    ctx = BGVContext(SchemeParams(64, 65537, num_limbs=5), seed=2)
    child = ctx.drop_limb_context()
    vals = np.arange(1, 33, dtype=np.int64).astype(object)
    full = np.asarray(ctx.make_plaintext_mont(vals))
    small = np.asarray(child.make_plaintext_mont(vals))
    np.testing.assert_array_equal(full[: child.L], small)
