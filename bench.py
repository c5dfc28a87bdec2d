"""Benchmark driver: prints ONE JSON line with the north-star metric.

Metric (BASELINE.json): NTT throughput at n = 2^14 over 6 RNS limbs on one
chip, reported as single-limb negacyclic transforms per second.

vs_baseline is measured throughput relative to the HBM speed-of-light for a
*fused* NTT (read + write each residue polynomial once: 2 * n * 4 bytes per
limb-transform at the chip's HBM bandwidth) -- the reference publishes no
numbers (BASELINE.md), so the roofline is the bar.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import numpy as np
import jax
import jax.numpy as jnp

N = 1 << 14
LIMBS = 6
BATCH = 16
HBM_BYTES_PER_SEC = 819e9  # TPU v5e ~819 GB/s


def main():
    from nested_hashing_psi_tpu.ops import primes
    from nested_hashing_psi_tpu.ops.ntt import NTTPlan, ntt

    plan = NTTPlan(N, primes.ntt_primes(LIMBS, 31, 2 * N))
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, min(plan.primes), size=(BATCH, LIMBS, N), dtype=np.uint64),
        jnp.uint32,
    )
    fn = jax.jit(lambda a: ntt(a, plan))
    fn(x).block_until_ready()  # compile

    # choose iters for ~2s of runtime
    t0 = time.perf_counter()
    fn(x).block_until_ready()
    per_call = time.perf_counter() - t0
    iters = max(3, int(2.0 / max(per_call, 1e-5)))
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = fn(y)
    y.block_until_ready()
    elapsed = time.perf_counter() - t0

    limb_ntts = BATCH * LIMBS * iters
    value = limb_ntts / elapsed
    roofline = HBM_BYTES_PER_SEC / (2 * N * 4)  # fused NTT: one read+write
    result = {
        "metric": "ntt_per_sec_per_chip_n16384",
        "value": round(value, 1),
        "unit": "limb-transforms/s",
        "vs_baseline": round(value / roofline, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
