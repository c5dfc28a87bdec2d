"""Raw VPU op-throughput probes (uint32) inside a Pallas kernel.

Measures achievable rates for the primitive op mixes the NTT butterfly is
built from -- add, mul, mulhi_u32, shoup_mul, add_mod -- by chaining K
dependent applications over a VMEM-resident tile. Establishes the per-op
cost model that decides which butterfly reformulation can reach the
BASELINE.json NTT target (VERDICT r2: "push the NTT kernel toward the VPU
ceiling ... with an op-count justification of wherever it lands").
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
from jax.experimental import pallas as pl

from nested_hashing_psi_tpu.ops.modmath import (
    add_mod,
    mulhi_u32,
    mont_mul,
    shoup_mul,
)

B, M, N = 64, 128, 128   # per-grid-step tile (8, 128, 128); grid of 8
TB = 8
K = 64                   # chained op applications per element


def _sync(y):
    return int(np.asarray(jax.device_get(y.ravel()[0])))


def _rate(fn, x, per_elem_ops, target_s=1.5):
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
    dt = time.perf_counter() - t0
    total = B * M * N * K * iters
    return total / dt  # applications of the op mix per second


OPS = {
    # name -> (fn(x, c, p), uint32-op estimate per application)
    "add": (lambda x, c, p: x + c, 1),
    "mul": (lambda x, c, p: x * c, 1),
    "addmul": (lambda x, c, p: x * c + c, 2),
    "where_ge": (lambda x, c, p: jnp.where(x >= p, x - p, x), 3),
    "mulhi": (lambda x, c, p: mulhi_u32(x, c), 16),
    "shoup": (lambda x, c, p: shoup_mul(x, c, c, p), 21),
    "shoup_lazy": (lambda x, c, p: x * c - mulhi_u32(x, c) * p, 18),
    "mont": (lambda x, c, p: mont_mul(x, c, p, c | jnp.uint32(1)), 34),
    "addmod": (lambda x, c, p: add_mod(x, c, p), 4),
    # float multiply (bitcast round-trips keep the chain uint32-typed)
    "fmul": (
        lambda x, c, p: jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(x, jnp.float32)
            * jax.lax.bitcast_convert_type(c, jnp.float32),
            jnp.uint32,
        ),
        1,
    ),
    # 4 independent muls per application (ILP probe: same mul count as
    # mulhi's partial products, no combine tree)
    "mul4_ilp": (
        lambda x, c, p: (x * c)
        ^ (x * (c + 1))
        ^ (x * (c + 2))
        ^ (x * (c + 3)),
        7,
    ),
}


def make(name):
    fn, _ = OPS[name]

    def kernel(x_ref, out_ref):
        x = x_ref[...]
        c = x + jnp.uint32(12345)
        p = jnp.uint32((1 << 31) - 2**20 + 1)
        for _ in range(K):
            x = fn(x, c, p)
        out_ref[...] = x

    def call(x):
        return pl.pallas_call(
            kernel,
            grid=(B // TB,),
            in_specs=[pl.BlockSpec((TB, M, N), lambda b: (b, 0, 0))],
            out_specs=pl.BlockSpec((TB, M, N), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, M, N), jnp.uint32),
        )(x)

    return jax.jit(call)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 31, (B, M, N), np.uint64), jnp.uint32)
    names = sys.argv[1:] or list(OPS)
    for name in names:
        r = _rate(make(name), x, OPS[name][1])
        est = OPS[name][1]
        print(
            f"{name:>10}: {r/1e9:8.2f} G applications/s "
            f"(~{est} ops -> {r*est/1e12:6.2f} T uint32-ops/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
