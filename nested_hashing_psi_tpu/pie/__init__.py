"""Private Indexed Equality (PIE) engines as fused tensor pipelines
(reference: src/Common/Crypto/PrivateIndexedEqualityCheck/*)."""

from nested_hashing_psi_tpu.pie.batched_fhe import BatchedFHEPIE, BatchedFHEClientOps  # noqa: F401
