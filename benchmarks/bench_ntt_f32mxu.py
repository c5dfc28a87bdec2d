"""Float-MXU NTT candidate probe (VERDICT r4 item 4).

Question: can an f32 stage-matmul formulation of the four-step NTT beat the
VPU butterfly kernel (657.7k limb-NTT/s at n=2^14)?

Exactness constraint on f32 (24-bit mantissa): digit width b with contraction
length K needs K * 2^(2b) <= 2^24. At the four-step stage shape (m1 = m2 =
128), K = 128 forces b <= 8 -> four 8-bit digit planes, and digit pairs
CANNOT be stacked along the contraction axis (4*128 * 2^16 = 2^25 breaks
exactness), so a stage costs 16 separate (128,128)@(128,128) f32 matmuls per
poly-tile -- vs the int8 form's digit-stacked 5-plane products at 4x the
MXU rate. Wider digits (the "24-bit / 2-plane" sketch) force an exact
mod-2^k side computation for carry correction whose int8 decomposition is
>= 9 extra plane products per pair -- more work than the all-int8 form it
was meant to beat.

This probe measures the raw MXU throughput of both formulations' matmul
inner loops at exactly the stage shapes (chained, device-timed), giving an
UPPER BOUND on any f32 four-step NTT: if the f32 matmuls alone are slower
than the whole VPU kernel, no recombination scheme can save the candidate.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
from nested_hashing_psi_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax
import jax.numpy as jnp

N = 1 << 14
M = 128          # m1 = m2 = 128
TB = 64          # poly tiles per call (64 polys' worth of stage work)


def _sync(y):
    return float(np.asarray(jax.device_get(y.ravel()[0])))


def rate(fn, x, inner=20, reps=3):
    chain = jax.jit(
        lambda x0, k: jax.lax.fori_loop(0, k, lambda _, c: fn(c), x0),
        static_argnums=1,
    )
    _sync(chain(x, 2))
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(chain(x, inner))
        best = max(best, inner / (time.perf_counter() - t0))
    return best  # calls/s


def _mm_rate(mk_call, tok0, inner=30, reps=4):
    """Pure-matmul device rate: per iteration ONE batched dot_general; the
    loop dependency is a single scalar token folded into the operand (so the
    relay cannot elide iterations while the matmul cost stays >99.9% of the
    body)."""

    def body(_, tok):
        q = mk_call(tok)
        return q.ravel()[0]

    chain = jax.jit(
        lambda t0, k: jax.lax.fori_loop(0, k, body, t0), static_argnums=1
    )
    _sync(chain(tok0, 2))
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(chain(tok0, inner))
        best = max(best, inner / (time.perf_counter() - t0))
    return best


def main():
    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}")

    # --- f32 candidate: a stage = 16 separate digit-pair products; batched
    # over the 16 pairs AND the TB poly tiles in one dot_general.
    G8 = jnp.asarray(rng.integers(0, 255, size=(16, M, M)).astype(np.float32))
    X32 = jnp.asarray(
        rng.integers(0, 255, size=(16, TB * M, M)).astype(np.float32)
    )

    def f32_call(tok):
        return jax.lax.dot_general(
            X32 + tok, G8, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    r = _mm_rate(f32_call, jnp.float32(0))
    # one call = 16 digit-pair matmuls over TB polys = ONE stage; a full
    # transform needs 2 stages (+ twiddles + recombination, not counted)
    print(f"f32 4x8-bit digit-pair stage: {r:.1f} calls/s "
          f"-> <= {r * TB / 2:,.0f} limb-NTT/s upper bound (matmuls only)")

    # --- best-case f32 form: all 16 pair products as ONE dense matmul
    # (digit planes stacked on rows x digit matrices concatenated on cols)
    Xbig = jnp.asarray(
        rng.integers(0, 255, size=(4 * TB * M, M)).astype(np.float32)
    )
    Gbig = jnp.asarray(rng.integers(0, 255, size=(M, 4 * M)).astype(np.float32))

    def f32_big(tok):
        return jax.lax.dot_general(
            Xbig + tok, Gbig, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    rb = _mm_rate(f32_big, jnp.float32(0))
    print(f"f32 single dense (32768,128)@(128,512): {rb:.1f} calls/s "
          f"-> <= {rb * TB / 2:,.0f} limb-NTT/s upper bound (matmuls only)")

    # --- int8 stacked reference (the r2 probe's matmul inner loop)
    Gi = jnp.asarray(rng.integers(-127, 127, size=(5, M, 5 * M)).astype(np.int8))
    Xi = jnp.asarray(rng.integers(0, 127, size=(TB, 5 * M, M)).astype(np.int8))

    def int8_call(tok):
        return jax.lax.dot_general(
            Gi, Xi + tok.astype(jnp.int8), (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    ri = _mm_rate(int8_call, jnp.int32(0))
    print(f"int8 5x7-bit stacked stage:   {ri:.1f} calls/s "
          f"-> <= {ri * TB / 2:,.0f} limb-NTT/s upper bound (matmuls only)")

    print("VPU kernel baseline: 657,715 limb-NTT/s (BENCH_r04)")


if __name__ == "__main__":
    main()
