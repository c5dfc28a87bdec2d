"""End-to-end protocol tests: self-verifying client over a loopback channel.

The reference's production binaries double as their own integration test
("Set matches!", /root/reference/src/Client/PSIClient.hpp:119-134); this
reproduces that harness in-process.
"""

import numpy as np
import pytest

from nested_hashing_psi_tpu.config import HashTableParams, PSIParams
from nested_hashing_psi_tpu.protocol.runner import run_in_process


def small_params(**over):
    base = dict(
        server_set_size=300,
        client_set_size=12,
        intersection_set_size=5,
        hash_seed=987654321,
        item_seed=123456789,
        bit_size=16,
        fhe=True,
        batched=True,
        ring_dim=128,
        num_limbs=8,
    )
    base.update(over)
    return PSIParams(**base)


def small_ht(**over):
    base = dict(
        each_simple_table_size=32,
        each_cuckoo_table_size=12,
        n_simple_hash_functions=2,
        n_cuckoo_hash_functions=2,
        max_items_per_position=4,
    )
    base.update(over)
    return HashTableParams(**base)


def test_batched_fhe_e2e_loopback():
    client, server, ok = run_in_process(small_params(), small_ht())
    assert ok, "client-side intersection verification failed"
    assert len(client.intersection_calculated) == 5
    assert client.noise_bits < 8 * 31 - 10
    # measurement schema populated
    assert set(client.measurements) == {"Setup", "Offline", "Online"}
    assert client.measurements["Online"].bytes_out > 0


def test_batched_fhe_e2e_empty_intersection():
    client, _, ok = run_in_process(
        small_params(intersection_set_size=0, client_set_size=8), small_ht()
    )
    assert ok
    assert len(client.intersection_calculated) == 0


def test_batched_fhe_e2e_full_client_in_server():
    client, _, ok = run_in_process(
        small_params(client_set_size=6, intersection_set_size=6), small_ht()
    )
    assert ok
    assert len(client.intersection_calculated) == 6


def test_batched_fhe_e2e_32bit_items():
    client, _, ok = run_in_process(small_params(bit_size=32, num_limbs=10), small_ht())
    assert ok
    assert len(client.intersection_calculated) == 5


def test_batched_fhe_e2e_three_cuckoo_hfs():
    client, _, ok = run_in_process(
        small_params(num_limbs=12),
        small_ht(n_cuckoo_hash_functions=3),
    )
    assert ok


def test_batched_fhe_e2e_streamed_upload():
    """stream_chunks > 1: chunked index upload with server-side overlapped
    partial position sums must match the monolithic result."""
    client, server, ok = run_in_process(
        small_params(stream_chunks=4), small_ht()
    )
    assert ok
    assert len(client.intersection_calculated) == 5


def test_batched_fhe_e2e_bgv_leveled():
    """--bgv route runs the leveled PIE: the result ships with one fewer limb
    per cross-hash mult and still verifies."""
    client, server, ok = run_in_process(small_params(bgv=True), small_ht())
    assert ok
    assert len(client.intersection_calculated) == 5
    # H=2 -> one mod switch -> result at L-1 limbs
    assert server.pie.leveled is True


def test_server_rejects_invalid_chunk_count():
    """The server validates the wire-read n_chunks (untrusted): a non-divisor
    of the inner position count must fail the session with a clear error, not
    mis-slice the table or hang on reads that never arrive."""
    from nested_hashing_psi_tpu.protocol.batched_fhe import BatchedFHEPSIServer
    from nested_hashing_psi_tpu.protocol.channel import LoopbackChannel

    peer, ours = LoopbackChannel.pair()
    peer.write_tensor(np.zeros((2, 2, 4), np.uint32))  # minus ciphertext
    peer.write_tensor(np.array([7], np.uint64))  # 7 does not divide P = 12
    srv = BatchedFHEPSIServer.__new__(BatchedFHEPSIServer)
    srv.channel = ours
    srv.ht = small_ht()
    with pytest.raises(ValueError, match="chunk count 7"):
        srv.run_online_phase()


@pytest.mark.slow
@pytest.mark.parametrize("bit_size", [40, 48])
def test_batched_fhe_e2e_big_t_ring16384(bit_size):
    """40/48-bit plaintext moduli at the production ring
    (reference SimpleFHEPSIClient.cpp:29-49 selects these at runtime):
    exercises the native __int128 big-t decode on the protocol path with the
    default limb budget, and asserts a real noise margin."""
    client, server, ok = run_in_process(
        small_params(bit_size=bit_size, ring_dim=16384, num_limbs=0),
        small_ht(),
    )
    assert ok
    assert len(client.intersection_calculated) == 5
    budget = server.ctx.params.num_limbs * 31
    assert client.noise_bits < budget - 20, (
        f"noise {client.noise_bits} too close to budget {budget}"
    )


def test_batched_fhe_multi_query_transaction():
    """--queries Q ships Q query sets in one exchange; server answers with
    ONE batched dispatch (run_many) and results still self-verify."""
    from nested_hashing_psi_tpu.config import HashTableParams, PSIParams
    from nested_hashing_psi_tpu.protocol.runner import run_in_process

    psi = PSIParams(
        server_set_size=300, client_set_size=12, intersection_set_size=5,
        bit_size=16, fhe=True, batched=True, ring_dim=128, num_limbs=8,
        num_queries=3,
    )
    ht = HashTableParams(
        each_simple_table_size=32, each_cuckoo_table_size=12,
        n_simple_hash_functions=2, n_cuckoo_hash_functions=2,
        max_items_per_position=4,
    )
    client, server, ok = run_in_process(psi, ht)
    assert ok
