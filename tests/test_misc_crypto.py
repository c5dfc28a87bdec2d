"""Damgard-Jurik additive HE (reference TestDamgardJurik parity) and the
AES-CTR PRG reset contract."""

import numpy as np

from nested_hashing_psi_tpu.crypto.damgard_jurik import DamgardJurik
from nested_hashing_psi_tpu.utils.prg import AesCtrPrg


def test_damgard_jurik_roundtrip_and_homomorphism():
    dj = DamgardJurik(modulus_bits=256, s=1)
    for m in (0, 1, 42, dj.n_s - 1):
        assert dj.decrypt(dj.encrypt(m)) == m
    a, b = 1234, 98765
    assert dj.decrypt(dj.add(dj.encrypt(a), dj.encrypt(b))) == a + b
    assert dj.decrypt(dj.mult_by_const(dj.encrypt(a), 7)) == 7 * a


def test_damgard_jurik_s2():
    dj = DamgardJurik(modulus_bits=256, s=2)
    big = dj.n + 12345  # plaintext larger than N: needs s >= 2
    assert dj.decrypt(dj.encrypt(big)) == big
    assert dj.decrypt(dj.add(dj.encrypt(big), dj.encrypt(1))) == big + 1


def test_aes_ctr_prg_reset_reproduces_stream():
    prg = AesCtrPrg(b"0123456789abcdef")
    first = prg.get_bits(1000)
    more = prg.get_bits(64)
    prg.reset()
    again = np.concatenate([prg.get_bits(1000), prg.get_bits(64)])
    np.testing.assert_array_equal(np.concatenate([first, more]), again)
    # distinct keys -> distinct streams
    other = AesCtrPrg(b"fedcba9876543210").get_bits(1000)
    assert not np.array_equal(first, other)


def test_dj_socket_pair_equality_protocol():
    """Two-party DJ equality over real localhost sockets (the reference's
    TestServerDJ/TestClientDJ message flow, tests/TestServerDJ.cpp:14-140):
    matching and differing cases, plus the timing CSV export."""
    import threading

    from nested_hashing_psi_tpu.protocol.channel import TCPChannel
    from nested_hashing_psi_tpu.protocol.dj_pair import (
        run_dj_client,
        run_dj_server,
    )

    def once(differ: bool, port: int, export=None) -> bool:
        out = {}

        def server():
            ch = TCPChannel.listen("127.0.0.1", port)
            try:
                run_dj_server(ch, 8, export_path=export)
            finally:
                ch.close()

        th = threading.Thread(target=server, daemon=True)
        th.start()
        ch = TCPChannel.connect("127.0.0.1", port)
        try:
            ok = run_dj_client(ch, 8, elem_index=3, differ=differ,
                               modulus_bits=256)
        finally:
            ch.close()
        th.join(timeout=60)
        return ok

    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        csv = os.path.join(d, "M_S8_K256.csv")
        assert once(differ=False, port=47211, export=csv) is True
        assert once(differ=True, port=47212) is False
        lines = open(csv).read().splitlines()
        assert [r.split(",")[0] for r in lines] == [
            "Send Index Vector", "Multiplication", "Addition",
        ]
