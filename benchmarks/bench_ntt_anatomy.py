"""Attribute fused-NTT kernel time: butterfly stages vs data movement.

Builds timing-only kernel variants (mathematically meaningless outputs, same
op mix) on the real TPU:

  stages   -- the 14 split-form butterfly stages only (no transposes, no
              regroups, no elementwise twiddle)
  moves    -- transposes + regroups + tw only (no butterflies)
  full     -- the real v2 kernel (oracle-correct), for reference

The difference full - stages ~ the cost of the movement plumbing; this
decides whether the next optimization is stage compute (radix-4, lazy
reduction) or layout (transpose elimination).
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
from jax.experimental.pallas import tpu as pltpu

from nested_hashing_psi_tpu.ops import primes
from nested_hashing_psi_tpu.ops.ntt_pallas import (
    SplitNTTPlan,
    _log2,
    _regroup,
    _ungroup,
    ct_stage,
    gs_stage,
    ntt_pallas,
)
from nested_hashing_psi_tpu.ops.modmath import shoup_mul

N = 1 << 14
LIMBS = 6
HBM_BATCH = 512
TB = 8


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


def make_variant(plan, which):
    m1, m2 = plan.m1, plan.m2

    def kernel(p_ref, x_ref, sa_ref, sb_ref, tw_ref, out_ref):
        l = pl.program_id(0)
        p = p_ref[l, 0]
        X = x_ref[:, 0]
        sa = sa_ref[0]
        sb = sb_ref[0]
        tw = tw_ref[0]
        if which == "stages":
            # 7 CT + 7 GS split stages, all along sublanes, tables reused
            # (t >= 8 via regrouped-table rows where needed): op mix of the
            # real kernel minus every transpose/regroup.
            for k in range(_log2(m1)):
                t = m1 >> (k + 1)
                te = t if t >= 8 else t * (m1 // 8)
                X = ct_stage(X, sa[0, k], sa[1, k], te, p)
            for k in range(_log2(m2)):
                t = m2 >> (k + 1)
                te = t if t >= 8 else t * (m2 // 8)
                X = gs_stage(X, sb[0, k], sb[1, k], te, p)
        else:  # moves
            X = _regroup(X)
            X = _ungroup(X)
            X = shoup_mul(X, tw[0], tw[1], p)
            X = jnp.swapaxes(X, -1, -2)
            X = _regroup(X)
            X = _ungroup(X)
            X = jnp.swapaxes(X, -1, -2)
        out_ref[:, 0] = X

    def call(x):
        B = x.shape[0]
        xb = x.reshape(B, LIMBS, m1, m2)
        out = pl.pallas_call(
            kernel,
            grid=(LIMBS, B // TB),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((TB, 1, m1, m2), lambda l, b: (b, l, 0, 0)),
                pl.BlockSpec(
                    (1, 2, plan.log1, m1, 1), lambda l, b: (l, 0, 0, 0, 0)
                ),
                pl.BlockSpec(
                    (1, 2, plan.log2, m2, 1), lambda l, b: (l, 0, 0, 0, 0)
                ),
                pl.BlockSpec((1, 2, m1, m2), lambda l, b: (l, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((TB, 1, m1, m2), lambda l, b: (b, l, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, LIMBS, m1, m2), jnp.uint32),
        )(
            jnp.asarray(plan.p_arr), xb, jnp.asarray(plan.s1_v2),
            jnp.asarray(plan.s2_v2), jnp.asarray(plan.tw),
        )
        return out.reshape(B, LIMBS, N)

    return jax.jit(call)


def main():
    ps = primes.ntt_primes(LIMBS, 31, 2 * N)
    plan = SplitNTTPlan(N, ps)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, min(ps), size=(HBM_BATCH, LIMBS, N), dtype=np.uint64),
        jnp.uint32,
    )
    u = HBM_BATCH * LIMBS
    for name in ("stages", "moves"):
        r = _rate(make_variant(plan, name), x, u)
        print(f"{name:>7}: {r:,.0f} /s  ({1e6 / r:.2f} us)", flush=True)
    r = _rate(lambda a: ntt_pallas(a, plan), x, u)
    print(f"   full: {r:,.0f} /s  ({1e6 / r:.2f} us)", flush=True)


if __name__ == "__main__":
    main()
