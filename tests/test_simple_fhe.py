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
