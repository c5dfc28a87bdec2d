"""Transport tests: tensor framing, loopback and TCP channels, byte counters."""

import threading

import numpy as np

from nested_hashing_psi_tpu.protocol.channel import (
    LoopbackChannel,
    TCPChannel,
    tensor_from_bytes,
    tensor_to_bytes,
)


def test_tensor_framing_roundtrip():
    # exactly the wire's element types (channel._ALLOWED_DTYPES); anything
    # else is rejected -- tests/test_wire_hardening.py
    for arr in (
        np.arange(12, dtype=np.uint32).reshape(3, 4),
        np.zeros((2, 0, 5), dtype=np.uint64),
        np.frombuffer(b"\x00\x07", dtype=np.uint8),
        np.array(7, dtype=np.int64).reshape(()),
    ):
        back = tensor_from_bytes(tensor_to_bytes(arr))
        assert back.dtype == arr.dtype
        np.testing.assert_array_equal(back, arr)


def test_loopback_counters():
    a, b = LoopbackChannel.pair()
    a.write_msg(b"hello")
    assert b.read_msg() == b"hello"
    assert a.bytes_out == 13 and b.bytes_in == 13
    b.write_tensor(np.ones((4, 4), np.uint32))
    t = a.read_tensor()
    assert t.shape == (4, 4)


def test_tcp_channel_roundtrip():
    port = 45071
    result = {}

    def server():
        ch = TCPChannel.listen("127.0.0.1", port)
        result["got"] = ch.read_tensor()
        ch.write_msg(b"ack")
        ch.close()

    th = threading.Thread(target=server)
    th.start()
    ch = TCPChannel.connect("127.0.0.1", port)
    payload = np.arange(1000, dtype=np.uint32)
    ch.write_tensor(payload)
    assert ch.read_msg() == b"ack"
    th.join(timeout=10)
    ch.close()
    np.testing.assert_array_equal(result["got"], payload)
    assert ch.bytes_out > 4000
