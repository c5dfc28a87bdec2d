"""RNS-BGV/BFV scheme layer: the TPU-native replacement for OpenFHE.

The reference outsources all lattice crypto to OpenFHE CryptoContext calls
(SURVEY.md section 2.2); here the scheme is implemented from scratch over
uint32 RNS limb tensors with the ops/ NTT kernels.
"""

from nested_hashing_psi_tpu.fhe.params import SchemeParams  # noqa: F401
from nested_hashing_psi_tpu.fhe.bgv import BGVContext, Ciphertext  # noqa: F401
