"""Timing-only probe: would Harvey-lazy butterflies (30-bit primes) pay?

Builds kernel variants with the op mix of (a) the current exact Shoup
butterfly (~30 uint32 ops), (b) the Harvey lazy butterfly (inputs in
[0, 4p), one conditional subtract, no per-op corrections, ~24 ops), and
(c) lazy + pre-split Shoup quotient tables (drops 2 ops from mulhi).
Outputs are mathematically meaningless with 31-bit primes (the lazy domain
needs 4p < 2**32); this measures only the achievable rate to decide whether
the 30-bit-prime migration is worth it.
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
from nested_hashing_psi_tpu.ops.modmath import MASK16, mulhi_u32, shoup_mul
from nested_hashing_psi_tpu.ops.ntt_pallas import (
    SplitNTTPlan,
    _log2,
    _regroup,
    _ungroup,
    _v_twiddle,
)
from nested_hashing_psi_tpu.ops.modmath import add_mod, sub_mod

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


def shoup_lazy(x, w, wq, p):
    q = mulhi_u32(x, wq)
    return x * w - q * p  # in [0, 2p)


def mulhi_presplit(x, wl, wh):
    """mulhi with the constant operand pre-split into 16-bit halves."""
    xl = x & MASK16
    xh = x >> 16
    ll = xl * wl
    lh = xl * wh
    hl = xh * wl
    hh = xh * wh
    mid = (ll >> 16) + (lh & MASK16) + (hl & MASK16)
    return hh + (lh >> 16) + (hl >> 16) + (mid >> 16)


def shoup_lazy_presplit(x, w, wql, wqh, p):
    q = mulhi_presplit(x, wql, wqh)
    return x * w - q * p


def make_variant(plan, which):
    m1, m2 = plan.m1, plan.m2
    p2c = None

    def ct_exact(X, sw, sq, t, p):
        g = X.shape[-2] // (2 * t)
        *lead, M, lanes = X.shape
        Xr = X.reshape(*lead, g, 2, t, lanes)
        u, v = Xr[..., 0, :, :], Xr[..., 1, :, :]
        w = shoup_mul(v, _v_twiddle(sw, M, t), _v_twiddle(sq, M, t), p)
        out = jnp.stack([add_mod(u, w, p), sub_mod(u, w, p)], axis=-3)
        return out.reshape(*lead, M, lanes)

    def ct_lazy(X, sw, sq, t, p):
        *lead, M, lanes = X.shape
        g = M // (2 * t)
        p2 = p + p
        Xr = X.reshape(*lead, g, 2, t, lanes)
        u, v = Xr[..., 0, :, :], Xr[..., 1, :, :]
        u = jnp.where(u >= p2, u - p2, u)        # [0, 2p)
        w = shoup_lazy(v, _v_twiddle(sw, M, t), _v_twiddle(sq, M, t), p)
        out = jnp.stack([u + w, u + p2 - w], axis=-3)
        return out.reshape(*lead, M, lanes)

    def ct_lazy_ps(X, sw, sq, t, p):
        *lead, M, lanes = X.shape
        g = M // (2 * t)
        p2 = p + p
        Xr = X.reshape(*lead, g, 2, t, lanes)
        u, v = Xr[..., 0, :, :], Xr[..., 1, :, :]
        u = jnp.where(u >= p2, u - p2, u)
        wv = _v_twiddle(sw, M, t)
        qv = _v_twiddle(sq, M, t)
        w = shoup_lazy_presplit(v, wv, qv & MASK16, qv >> 16, p)
        out = jnp.stack([u + w, u + p2 - w], axis=-3)
        return out.reshape(*lead, M, lanes)

    stage = {"exact": ct_exact, "lazy": ct_lazy, "lazy_ps": ct_lazy_ps}[which]

    def kernel(p_ref, x_ref, sa_ref, sb_ref, out_ref):
        l = pl.program_id(0)
        p = p_ref[l, 0]
        X = x_ref[:, 0]
        sa = sa_ref[0]
        sb = sb_ref[0]
        # 14 stages with the real stage structure (regroup for sub-tile)
        for k in range(_log2(m1)):
            t = m1 >> (k + 1)
            te = t if t >= 8 else t * (m1 // 8)
            X = stage(X, sa[0, k], sa[1, k], te, p)
        X = jnp.swapaxes(X, -1, -2)
        for k in range(_log2(m2)):
            t = m2 >> (k + 1)
            te = t if t >= 8 else t * (m2 // 8)
            X = stage(X, sb[0, k], sb[1, k], te, p)
        out_ref[:, 0] = jnp.swapaxes(X, -1, -2)

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
            ],
            out_specs=pl.BlockSpec((TB, 1, m1, m2), lambda l, b: (b, l, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, LIMBS, m1, m2), jnp.uint32),
        )(
            jnp.asarray(plan.p_arr), xb, jnp.asarray(plan.s1_v2),
            jnp.asarray(plan.s2_v2),
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
    for name in ("exact", "lazy", "lazy_ps"):
        r = _rate(make_variant(plan, name), x, u)
        print(f"{name:>8}: {r:,.0f} /s  ({1e6 / r:.2f} us)", flush=True)


if __name__ == "__main__":
    main()
