"""TPU-native unbalanced PSI framework.

A from-scratch re-design of the capabilities of SAP/nested-hashing-psi
(reference: /root/reference) for TPU hardware:

- ``ops``      -- modular-arithmetic substrate + negacyclic NTT kernels
                  (JAX/XLA + Pallas), the TPU-native replacement for the
                  reference's OpenFHE ``DCRTPoly`` backend.
- ``fhe``      -- RNS-BGV/BFV scheme layer (keygen, encrypt, decrypt,
                  ct x pt / ct x ct + relinearization, packed encoding),
                  replacing OpenFHE ``CryptoContext`` calls.
- ``hashing``  -- vectorized tabulation hashing, blocked cuckoo tables and
                  the hierarchical (nested) cuckoo structure as dense arrays
                  (reference: src/Common/Hashing/*).
- ``data``     -- deterministic PSI input-set generators
                  (reference: src/Common/DataInput/*).
- ``pie``      -- Private Indexed Equality engines as fused tensor pipelines
                  (reference: src/Common/Crypto/PrivateIndexedEqualityCheck/*).
- ``protocol`` -- 3-phase client/server orchestration, transport and
                  measurement export (reference: src/{Client,Server}/*).
- ``parallel`` -- device-mesh sharding (DP over bins, TP over RNS limbs,
                  SP over ring slots) via jax.sharding.
"""

__version__ = "0.1.0"
