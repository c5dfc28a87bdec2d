"""Seeded pseudo-random generators.

The reference's Precomp protocol uses an AES-CTR PRG (libscapi
PrgFromOpenSSLAES, /root/reference/src/Client/ElGamal/PrecompElGamalPSIClient.cpp:22-24)
whose stream the client regenerates by re-seeding. Here:

 - AesCtrPrg: AES-128-CTR keystream (via the `cryptography` package),
   byte/bit-compatible with itself across processes -- the same contract.
 - The framework's hashing/data layers use numpy Philox streams instead
   (counter-based, identical guarantees, no AES dependency).
"""

from __future__ import annotations

import numpy as np


class AesCtrPrg:
    def __init__(self, key: bytes):
        assert len(key) == 16, "fixed 128-bit key (reference parity)"
        from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

        self._make = lambda: Cipher(
            algorithms.AES(key), modes.CTR(b"\x00" * 16)
        ).encryptor()
        self.reset()

    def reset(self) -> None:
        """Re-seed: restart the keystream (the reference's prg.setKey reset)."""
        self._enc = self._make()

    def get_bytes(self, count: int) -> bytes:
        return self._enc.update(b"\x00" * count)

    def get_bits(self, count: int) -> np.ndarray:
        """count 0/1 values, LSB-first per byte (dynamic_bitset layout)."""
        raw = np.frombuffer(self.get_bytes((count + 7) // 8), dtype=np.uint8)
        bits = np.unpackbits(raw, bitorder="little")
        return bits[:count]
