"""BFV drop-limb rescale (RNS modulus switch) + the rescaled-mult PIE path.

The rescaled pipeline reassociates the batched PIE's product as
(mask * ip_0) * ip_1 * ... and modulus-switches the operands down to a small
mult basis before the HPS ct x ct + relinearization (fhe.params.bfv_mul_limbs
noise model). Decrypted slots must be identical to the full-basis pipeline;
the ciphertext bits legitimately differ.
"""

import numpy as np
import pytest

from nested_hashing_psi_tpu.fhe.bfv import BFVContext, make_context
from nested_hashing_psi_tpu.fhe.params import (
    SchemeParams,
    bfv_mul_limbs,
    bfv_ship_limbs,
)
from nested_hashing_psi_tpu.hashing import (
    CuckooHashTable,
    HierarchicalCuckooHashTable,
    TabulationHashing,
)
from nested_hashing_psi_tpu.hashing.tabulation import items_from_ints, items_to_ints
from nested_hashing_psi_tpu.ops.basis import RNSRescale
from nested_hashing_psi_tpu.ops.primes import crt_reconstruct, ntt_primes


def test_rns_rescale_oracle():
    """c' == (c - [c]_qd centered) / qd exactly (up to the documented +-1
    float boundary ulp) for random full-range values."""
    src = ntt_primes(5, 31, 2 * 64)
    rs = RNSRescale(src, 2)
    q = 1
    for p in src:
        q *= p
    qd = int(src[-2]) * int(src[-1])
    rng = np.random.default_rng(0)
    nbytes = (q.bit_length() + 15) // 8
    vals = [int.from_bytes(rng.bytes(nbytes), "little") % q for _ in range(61)]
    vals += [0, 1, q - 1]
    x = np.stack(
        [np.array([v % p for v in vals], np.uint32) for p in src]
    )  # (L, N)
    out = np.asarray(rs.rescale(x))
    keep = src[:-2]
    assert out.shape == (len(keep), len(vals))
    for j, v in enumerate(vals):
        got = crt_reconstruct([int(out[i, j]) for i in range(len(keep))], list(keep))
        r = v % qd
        if r > qd // 2:
            r -= qd
        want = (v - r) // qd
        qk = 1
        for p in keep:
            qk *= p
        assert (got - want) % qk in (0, 1, qk - 1), (v, got, want)


def test_rns_rescale_single_limb():
    src = ntt_primes(3, 31, 2 * 32)
    rs = RNSRescale(src, 1)
    q = int(src[0]) * int(src[1]) * int(src[2])
    qd = int(src[-1])
    rng = np.random.default_rng(1)
    vals = [int(v) % q for v in rng.integers(0, 1 << 62, size=32)]
    x = np.stack([np.array([v % p for v in vals], np.uint32) for p in src])
    out = np.asarray(rs.rescale(x))
    keep = src[:-1]
    qk = int(keep[0]) * int(keep[1])
    for j, v in enumerate(vals):
        got = crt_reconstruct([int(out[i, j]) for i in range(2)], list(keep))
        r = v % qd
        if r > qd // 2:
            r -= qd
        assert (got - (v - r) // qd) % qk in (0, 1, qk - 1)


@pytest.fixture(scope="module")
def bfv_ctx():
    ctx = make_context(
        SchemeParams(ring_dim=64, plaintext_modulus=65537, num_limbs=7, scheme="bfv"),
        seed=3,
    )
    assert isinstance(ctx, BFVContext)
    sk, pk = ctx.keygen()
    return ctx, sk, pk


def test_rescale_ct_preserves_message(bfv_ctx):
    ctx, sk, pk = bfv_ctx
    rng = np.random.default_rng(4)
    slots = rng.integers(0, 65537, size=64).astype(object)
    ct = ctx.encrypt_pk(ctx.make_plaintext_rns(slots), pk)
    for n_limbs in (5, 3, 2):
        down = ctx.rescale_ct(ct, n_limbs)
        assert down.data.shape[-2] == n_limbs
        got, noise = ctx.decrypt(down, sk, length=64)
        np.testing.assert_array_equal(
            np.asarray(got, dtype=np.uint64), np.asarray(slots, dtype=np.uint64)
        )
        # post-rescale noise sits at the t*small floor, far below budget
        assert noise < 31 * n_limbs - 17 - 2


def _pie_setup(n_cuckoo_hf, seed):
    hasher = TabulationHashing(424242, 2 + n_cuckoo_hf)
    hct = HierarchicalCuckooHashTable(
        hasher,
        each_simple_table_size=16,
        each_cuckoo_table_size=8,
        n_simple_hash_functions=2,
        n_cuckoo_hash_functions=n_cuckoo_hf,
        max_items_per_position=4,
        seed=seed,
    )
    hct.insert_all(items_from_ints(list(range(200, 280))))
    client_table = CuckooHashTable(
        hasher, 16, 2, starting_hash_id=0, max_items_per_position=1, seed=seed + 1
    )
    client_vals = [205, 231, 4040]
    client_table.insert_all(items_from_ints(client_vals))
    return hasher, hct, client_table, client_vals


@pytest.mark.parametrize("n_cuckoo_hf", [2, 3])
def test_rescaled_pie_matches_full_basis(n_cuckoo_hf):
    from nested_hashing_psi_tpu.pie.batched_fhe import (
        BatchedFHEClientOps,
        BatchedFHEPIE,
    )

    hasher, hct, client_table, client_vals = _pie_setup(n_cuckoo_hf, 31)
    ctx = make_context(
        SchemeParams(ring_dim=64, plaintext_modulus=65537, num_limbs=8, scheme="bfv"),
        seed=5,
    )
    sk, _ = ctx.keygen()
    rlk = ctx.relin_keygen(sk)

    flat = BatchedFHEPIE(ctx, hct, rlk, mask_seed=7, mul_limbs=0)
    resc = BatchedFHEPIE(ctx, hct, rlk, mask_seed=7)  # auto mul/ship limbs
    assert resc.mul_limbs is not None and resc.mul_limbs < ctx.L
    assert resc.ship_limbs <= resc.mul_limbs

    ops = BatchedFHEClientOps(ctx, client_table, 2, n_cuckoo_hf, 8)
    idx_ct, minus_ct = ops.encrypt_query(sk)

    r_flat = flat.run(idx_ct, minus_ct)
    r_resc = resc.run(idx_ct, minus_ct)
    assert r_resc.data.shape[-2] == resc.ship_limbs

    s_flat, _ = ctx.decrypt(r_flat, sk, length=flat.batch_slots)
    s_resc, noise = ctx.decrypt(r_resc, sk, length=resc.batch_slots)
    np.testing.assert_array_equal(
        np.asarray(s_flat, np.uint64), np.asarray(s_resc, np.uint64)
    )
    assert noise < 31 * resc.ship_limbs - 17 - 2

    got = sorted(items_to_ints(ops.extract_intersection(np.asarray(s_resc))))
    assert got == [205, 231]


def test_mul_limb_models():
    # 33-bit t at the sweep geometry: mult on 5 limbs, ship on 4
    assert bfv_mul_limbs(33, 7, 1) == 5
    assert bfv_ship_limbs(33, 5) == 4
    # 17-bit t
    assert bfv_mul_limbs(17, 8, 1) == 4
    assert bfv_ship_limbs(17, 4) == 3
    # chains (H = 3) need one more mult's worth of budget
    assert bfv_mul_limbs(33, 9, 2) == 7
    # never exceeds the context basis
    assert bfv_mul_limbs(49, 4, 1) == 4


def test_ring16384_l6_rescaled_margin():
    """Tightened client basis: 6 limbs at 32-bit t with the mask-first
    rescaled pipeline. The mask is paid on the full basis (model margin 15
    bits there), the mult on 5 limbs. Documented opt-in (--numLimbs 6);
    the default stays at the worst-case model's 7. Asserts the measured
    end-to-end noise leaves >= 10 bits at every stage."""
    import numpy as np

    from nested_hashing_psi_tpu.fhe.params import default_num_limbs
    from nested_hashing_psi_tpu.pie.batched_fhe import (
        BatchedFHEClientOps,
        BatchedFHEPIE,
    )

    t = (1 << 32) + (1 << 20) + (1 << 19) + 1
    assert default_num_limbs(t.bit_length(), 1, 12, "bfv") == 7  # the default
    hasher, hct, client_table, client_vals = _pie_setup(2, 77)
    ctx = make_context(
        SchemeParams(ring_dim=16384, plaintext_modulus=t, num_limbs=6,
                     scheme="bfv"),
        seed=9,
    )
    sk, _ = ctx.keygen()
    rlk = ctx.relin_keygen(sk)
    pie = BatchedFHEPIE(ctx, hct, rlk)
    assert pie.mul_limbs == 5 and pie.ship_limbs == 4
    ops = BatchedFHEClientOps(ctx, client_table, 2, 2, 8)
    idx_ct, minus_ct = ops.encrypt_query(sk)
    result = pie.run(idx_ct, minus_ct)
    slots, noise = ctx.decrypt(result, sk, length=pie.batch_slots)
    budget = 31 * pie.ship_limbs - t.bit_length() - 1
    assert noise < budget - 10, (noise, budget)
    got = sorted(items_to_ints(ops.extract_intersection(np.asarray(slots))))
    assert got == [205, 231]
