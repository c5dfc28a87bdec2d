"""Micro-benchmark of the fused Pallas NTT kernel on the real TPU.

Chained-iteration timing with a single host fetch (the only honest barrier
through this sandbox's async relay -- see bench.py). Usage:

    python benchmarks/bench_ntt_kernel.py [tile_b ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
from nested_hashing_psi_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()  # env var alone is dead under sitecustomize

import numpy as np
import jax
import jax.numpy as jnp

from nested_hashing_psi_tpu.ops import primes
from nested_hashing_psi_tpu.ops.ntt_pallas import (
    SplitNTTPlan,
    intt_pallas,
    ntt_pallas,
)

N = 1 << 14
LIMBS = 6
HBM_BATCH = 512


def _sync(y):
    return int(np.asarray(jax.device_get(y.ravel()[0])))


def _rate(fn, x, unit_count, target_s=2.0):
    _sync(fn(x))
    t0 = time.perf_counter()
    _sync(fn(x))
    per = time.perf_counter() - t0
    iters = max(3, min(2000, int(target_s / max(per, 1e-5))))
    y = x
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(y)
    _sync(y)
    return unit_count * iters / (time.perf_counter() - t0)


def main():
    """argv: tile_b[:fuse] ... (e.g. `8 8:4 4:4 2:7`); default 8:4."""
    specs = []
    for a in sys.argv[1:]:
        tb, _, fz = a.partition(":")
        specs.append((int(tb), int(fz) if fz else 4))
    specs = specs or [(8, 4)]
    ps = primes.ntt_primes(LIMBS, 31, 2 * N)
    sp = SplitNTTPlan(N, ps)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, min(ps), size=(HBM_BATCH, LIMBS, N), dtype=np.uint64),
        jnp.uint32,
    )
    for tb, fz in specs:
        fwd = lambda a: ntt_pallas(a, sp, tile_b=tb, fuse=fz)
        inv = lambda a: intt_pallas(a, sp, tile_b=tb, fuse=fz)
        r_f = _rate(fwd, x, HBM_BATCH * LIMBS)
        r_i = _rate(inv, x, HBM_BATCH * LIMBS)
        print(
            f"tile_b={tb} fuse={fz}: fwd {r_f:,.0f} limb-NTT/s   inv {r_i:,.0f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
