"""SimpleFHE (per-position) protocol tests: PIE golden semantics
(reference TestFHEPIE.cpp) and end-to-end loopback run."""

import numpy as np
import pytest

from nested_hashing_psi_tpu.config import HashTableParams, PSIParams
from nested_hashing_psi_tpu.protocol.runner import run_in_process


def params(**over):
    base = dict(
        server_set_size=200,
        client_set_size=8,
        intersection_set_size=4,
        bit_size=16,
        fhe=True,
        batched=False,
        ring_dim=64,
        num_limbs=8,
    )
    base.update(over)
    return PSIParams(**base)


def ht_params(**over):
    base = dict(
        each_simple_table_size=16,
        each_cuckoo_table_size=10,
        n_simple_hash_functions=2,
        n_cuckoo_hash_functions=2,
        max_items_per_position=6,
    )
    base.update(over)
    return HashTableParams(**base)


def test_simple_fhe_e2e_loopback():
    client, server, ok = run_in_process(params(), ht_params())
    assert ok
    assert len(client.intersection_calculated) == 4
    assert client.noise_bits < 8 * 31 - 10


def test_simple_fhe_e2e_empty():
    client, _, ok = run_in_process(
        params(intersection_set_size=0, client_set_size=5), ht_params()
    )
    assert ok
    assert len(client.intersection_calculated) == 0


def test_simple_fhe_bin_size_equals_table_size():
    """The reference's FHEHIPPIE geometry (binSize == tableSize)."""
    client, _, ok = run_in_process(
        params(), ht_params(each_cuckoo_table_size=8, max_items_per_position=8)
    )
    assert ok


def test_simple_fhe_bgv_default_limbs():
    """--bgv with the DEFAULT limb budget: the budget must model the EvalSum
    rotation-ladder key-switch noise for BGV too (its gadget error enters
    amplified by t), not just in the BFV branch."""
    client, server, ok = run_in_process(
        params(bgv=True, num_limbs=0), ht_params()
    )
    assert ok
    assert len(client.intersection_calculated) == 4
    budget = server.ctx.params.num_limbs * 31
    assert client.noise_bits < budget - 20


@pytest.mark.slow
def test_simple_fhe_bgv_default_limbs_ring16384():
    """The advisor's risk case at the production ring: BGV + EvalSum ladder
    (14 automorphism key-switches) with the default limb count. A budget miss
    silently mis-decrypts; the margin assertion makes it loud."""
    client, server, ok = run_in_process(
        params(bgv=True, num_limbs=0, ring_dim=16384),
        ht_params(each_simple_table_size=8),
    )
    assert ok
    assert len(client.intersection_calculated) == 4
    budget = server.ctx.params.num_limbs * 31
    assert client.noise_bits < budget - 20


@pytest.mark.slow
def test_simple_fhe_e2e_40bit_ring16384():
    """40-bit plaintext modulus on the SimpleFHE (EvalSum) path at ring
    16384 with default limbs: native __int128 decode end-to-end."""
    client, server, ok = run_in_process(
        params(bit_size=40, num_limbs=0, ring_dim=16384),
        ht_params(each_simple_table_size=8),
    )
    assert ok
    assert len(client.intersection_calculated) == 4
    budget = server.ctx.params.num_limbs * 31
    assert client.noise_bits < budget - 20


def test_simple_fhe_chunked_run_matches_single_shot():
    """Chunked pie execution (load-bearing at sweep geometries where the
    all-positions product tensor exceeds HBM) is bit-exact vs one shot,
    including the zero-padded final partial chunk."""
    client, server, ok = run_in_process(params(), ht_params())
    assert ok
    pie, idx = server.pie, client.idx_ct
    one = np.asarray(pie.run(idx).data)
    # a chunk width that does not divide nPies exercises the padding path
    assert pie.n_pies % 3 != 0
    chunked = np.asarray(pie.run(idx, pie_chunk=3).data)
    # the hf shuffle + masks are deterministic per PIE instance, so results
    # must agree exactly
    np.testing.assert_array_equal(one, chunked)
