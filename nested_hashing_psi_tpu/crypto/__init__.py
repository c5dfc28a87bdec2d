"""Host-side ElGamal/EC backend (reference: libscapi DlogGroup + OpenSSL EC;
SURVEY.md section 2.2 places this below the FHE path in priority -- EC scalar
multiplication is not a TPU-shaped workload, so it stays on the host)."""

from nested_hashing_psi_tpu.crypto.ec import EcGroup, CURVES, ec_group  # noqa: F401
from nested_hashing_psi_tpu.crypto.ec2m import BinaryEcGroup, BINARY_CURVES  # noqa: F401
from nested_hashing_psi_tpu.crypto.elgamal import AddHomElGamal, ElGamalCiphertext  # noqa: F401
