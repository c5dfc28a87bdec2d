"""TPU compute kernels: modular arithmetic and negacyclic NTT over RNS limbs."""

from nested_hashing_psi_tpu.ops import modmath, ntt, primes  # noqa: F401
