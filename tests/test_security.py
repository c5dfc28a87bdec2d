"""Secret-material hygiene tests (round-2 VERDICT items).

1. The Precomp ElGamal client's random bit matrix must be unpredictable to
   the server: the online message is bits ^ one-hot(position), so any stream
   the server can regenerate (e.g. one keyed from the shared item_seed)
   reveals the client's positions. The reference draws a fresh client-private
   AES key per run (PrecompElGamalPSIClient.cpp:21-24).
2. FHE contexts that generate secret keys must be keyed from OS entropy, not
   from wall-clock time (31 bits, brute-forceable).
"""

import numpy as np

from nested_hashing_psi_tpu.config import HashTableParams, PSIParams
from nested_hashing_psi_tpu.data.input import RandomDataInput
from nested_hashing_psi_tpu.fhe.bfv import make_context
from nested_hashing_psi_tpu.fhe.params import SchemeParams
from nested_hashing_psi_tpu.protocol.channel import LoopbackChannel
from nested_hashing_psi_tpu.protocol.elgamal import PrecompElGamalPSIClient


def _fresh_precomp_client():
    params = PSIParams(
        server_set_size=20,
        client_set_size=2,
        intersection_set_size=1,
        bit_size=16,
        curve_name="P-192",
        precomp=True,
    )
    ht = HashTableParams(
        each_simple_table_size=4,
        each_cuckoo_table_size=4,
        n_simple_hash_functions=2,
        n_cuckoo_hash_functions=2,
        max_items_per_position=3,
    )
    data = RandomDataInput(20, 2, 1, params.item_seed, params.bit_size)
    ch, _ = LoopbackChannel.pair()
    client = PrecompElGamalPSIClient(data, params, ht, ch)
    client.run_setup_phase()
    return client


def test_precomp_bits_are_client_private():
    """Two runs with IDENTICAL shared parameters (incl. item_seed) must draw
    different bit matrices -- i.e. the bits derive from per-run OS entropy,
    not from any parameter the server also holds."""
    a = _fresh_precomp_client().random_bits
    b = _fresh_precomp_client().random_bits
    assert a.shape == b.shape and a.size >= 32
    assert not np.array_equal(a, b), "bit matrix is reproducible across runs"
    # sanity: actually bits
    assert set(np.unique(a)) <= {0, 1}


def test_fhe_context_default_entropy():
    """make_context(seed=None) keys the RNG from OS entropy: two contexts
    must produce different secret keys."""
    sp = SchemeParams(ring_dim=64, plaintext_modulus=257, num_limbs=2)
    c1 = make_context(sp, seed=None)
    c2 = make_context(sp, seed=None)
    s1, _ = c1.keygen()
    s2, _ = c2.keygen()
    assert not np.array_equal(np.asarray(s1.s_ntt), np.asarray(s2.s_ntt))


def test_no_wallclock_key_seeds():
    """Grep-level guard: no key-path module seeds a context from time."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / "nested_hashing_psi_tpu"
    for f in root.rglob("*.py"):
        src = f.read_text()
        assert "time.time_ns() % 2**31" not in src, f"weak key seed in {f}"
