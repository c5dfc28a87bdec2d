"""Benchmark: batched-PIE online step on real hardware at sweep configs.

Reference sweep rows (Performance-Evaluation/Parameters1.txt), e.g.
  1024 clients vs 2^20 server: nSimpleHF=2, simpleSize=4949, maxPP=14, cuckooSize=14
  4096 clients vs 2^24 server: nSimpleHF=2, simpleSize=13004 (too big for ring
  16384 with 2 simple tables; the 2^24/512 row: simpleSize=3053, maxPP=58).

Synthetic table/index values (hashing correctness is covered by tests; this
measures the homomorphic pipeline).

Usage: python benchmarks/bench_pie_online.py [--config small|2^20|2^24]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
from nested_hashing_psi_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()  # env var alone is dead under sitecustomize

import numpy as np

CONFIGS = {
    # name: (H, D=maxPP, P=cuckooSize, simple_size, n_simple, limbs)
    "small": (2, 6, 6, 442, 2, 7),
    "2^16": (2, 12, 12, 442, 2, 7),
    "2^20": (2, 14, 14, 4949, 2, 7),
    "2^24": (2, 58, 58, 3053, 2, 7),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="2^20", choices=CONFIGS)
    ap.add_argument("--limbs", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nested_hashing_psi_tpu.fhe.bgv import BGVContext, Ciphertext
    from nested_hashing_psi_tpu.fhe.params import SchemeParams

    H, D, P, simple, n_simple, limbs = CONFIGS[args.config]
    limbs = args.limbs or limbs
    N = 16384
    batch = simple * n_simple
    assert batch <= N

    ctx = BGVContext(
        SchemeParams(ring_dim=N, plaintext_modulus=65537, num_limbs=limbs), seed=1
    )
    sk, _ = ctx.keygen()
    rlk = ctx.relin_keygen(sk)

    rng = np.random.default_rng(0)
    print(f"config {args.config}: H={H} D={D} P={P} batch={batch} L={limbs} N={N}")
    table_bytes = H * D * P * limbs * N * 4
    print(f"table plaintext tensor: {table_bytes/1e9:.2f} GB")

    # synthetic NTT-domain Montgomery plaintexts / ciphertexts (values < p)
    pmin = min(ctx.q_primes)
    table_pt = jnp.asarray(
        rng.integers(0, pmin, size=(H, D, P, limbs, N), dtype=np.uint64), jnp.uint32
    )
    mask_pt = jnp.asarray(
        rng.integers(0, pmin, size=(D, limbs, N), dtype=np.uint64), jnp.uint32
    )
    idx = jnp.asarray(
        rng.integers(0, pmin, size=(H, P, 2, limbs, N), dtype=np.uint64), jnp.uint32
    )
    minus = jnp.asarray(
        rng.integers(0, pmin, size=(2, limbs, N), dtype=np.uint64), jnp.uint32
    )

    from nested_hashing_psi_tpu.pie.batched_fhe import BatchedFHEPIE

    pie = BatchedFHEPIE.__new__(BatchedFHEPIE)
    pie.ctx, pie.rlk, pie.H, pie.D, pie.P = ctx, rlk, H, D, P
    pie.batch_slots = batch
    pie.table_pt, pie.mask_pt, pie._run = table_pt, mask_pt, None

    out = pie.run(Ciphertext(idx), Ciphertext(minus))
    out.data.block_until_ready()
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        out = pie.run(Ciphertext(idx), Ciphertext(minus))
    out.data.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    modmuls = H * D * P * 2 * limbs * N
    print(f"online step: {dt*1000:.2f} ms  "
          f"({modmuls/dt/1e9:.1f} G ct*pt modmuls/s, "
          f"{table_bytes/dt/1e9:.0f} GB/s table stream)")


if __name__ == "__main__":
    main()
