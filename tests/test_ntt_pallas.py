"""Fused split-NTT tests: jnp axis-split form and the Pallas kernel
(interpret mode on CPU) must be bit-exact vs the canonical ops.ntt."""

import numpy as np
import jax.numpy as jnp
import pytest

from nested_hashing_psi_tpu.ops import primes
from nested_hashing_psi_tpu.ops.ntt import NTTPlan, ntt, intt
from nested_hashing_psi_tpu.ops.ntt_pallas import (
    SplitNTTPlan,
    intt_pallas,
    intt_split,
    ntt_pallas,
    ntt_split,
)


def _data(n, ps, batch, seed=3):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        np.stack([[rng.integers(0, p, n) for p in ps] for _ in range(batch)]),
        jnp.uint32,
    )


@pytest.mark.parametrize("n", [256, 1024, 2048])
def test_split_matches_canonical(n):
    ps = primes.ntt_primes(3, 31, 2 * n)
    plan, sp = NTTPlan(n, ps), SplitNTTPlan(n, ps)
    x = _data(n, ps, 4)
    want = np.asarray(ntt(x, plan))
    np.testing.assert_array_equal(np.asarray(ntt_split(x, sp)), want)
    np.testing.assert_array_equal(
        np.asarray(intt_split(jnp.asarray(want), sp)), np.asarray(x)
    )
    np.testing.assert_array_equal(
        np.asarray(intt(jnp.asarray(want), plan)), np.asarray(x)
    )


@pytest.mark.parametrize("n", [1024, 4096])
def test_pallas_kernel_matches_canonical(n):
    """Interpret-mode kernel (CPU) vs canonical; includes batch padding."""
    ps = primes.ntt_primes(2, 31, 2 * n)
    plan, sp = NTTPlan(n, ps), SplitNTTPlan(n, ps)
    x = _data(n, ps, 3)  # 3 % tile_b != 0: exercises the pad path
    want = np.asarray(ntt(x, plan))
    got = np.asarray(ntt_pallas(x, sp, tile_b=2))
    np.testing.assert_array_equal(got, want)
    back = np.asarray(intt_pallas(jnp.asarray(want), sp, tile_b=2))
    np.testing.assert_array_equal(back, np.asarray(x))


def test_pallas_kernel_single_poly_and_odd_log():
    """n with odd log2 (m1 = 2*m2) and a no-batch (L, n) input."""
    n = 512
    ps = primes.ntt_primes(2, 31, 2 * n)
    plan, sp = NTTPlan(n, ps), SplitNTTPlan(n, ps)
    assert sp.m1 == 2 * sp.m2
    x = _data(n, ps, 1)[0]
    want = np.asarray(ntt(x, plan))
    np.testing.assert_array_equal(np.asarray(ntt_pallas(x, sp)), want)
    np.testing.assert_array_equal(np.asarray(ntt_split(x, sp)), want)


@pytest.mark.parametrize("fuse", [2, 3, 7])
def test_pallas_kernel_fused_levels(fuse):
    """Multi-level fused butterfly executor (_fused_block) bit-exact vs
    canonical for several grouping widths, fwd and inv."""
    n = 1024
    ps = primes.ntt_primes(2, 31, 2 * n)
    plan, sp = NTTPlan(n, ps), SplitNTTPlan(n, ps)
    x = _data(n, ps, 2)
    want = np.asarray(ntt(x, plan))
    got = np.asarray(ntt_pallas(x, sp, tile_b=2, fuse=fuse))
    np.testing.assert_array_equal(got, want)
    back = np.asarray(intt_pallas(jnp.asarray(want), sp, tile_b=2, fuse=fuse))
    np.testing.assert_array_equal(back, np.asarray(x))


def test_relabeled_domain_sandwich():
    """relabeled=True (exit transpose + ungroup skipped) is exact inside a
    closed fwd -> pointwise -> inv sandwich, and the roundtrip matches the
    canonical path bit-for-bit. Measured on v5e: 1.03x vs canonical -- a
    recorded negative against the ~13% hypothesis (BENCH_NOTES round 4)."""
    import numpy as np
    import jax.numpy as jnp

    from nested_hashing_psi_tpu.ops.modmath import (
        mont_constants,
        mont_mul,
        to_mont,
    )
    from nested_hashing_psi_tpu.ops.ntt_pallas import (
        SplitNTTPlan,
        intt_pallas,
        ntt_pallas,
    )
    from nested_hashing_psi_tpu.ops.primes import ntt_primes

    n = 1024
    ps = ntt_primes(2, 31, 2 * n)
    plan = SplitNTTPlan(n, ps)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.integers(0, min(ps), (3, 2, n), dtype=np.int64), jnp.uint32)
    y = jnp.asarray(rng.integers(0, min(ps), (3, 2, n), dtype=np.int64), jnp.uint32)
    p = jnp.asarray(plan.p_arr)
    pinv = jnp.asarray(
        np.array([mont_constants(q)[0] for q in ps], np.uint32).reshape(2, 1)
    )
    r2 = jnp.asarray(
        np.array([mont_constants(q)[1] for q in ps], np.uint32).reshape(2, 1)
    )

    fx, fy = ntt_pallas(x, plan), ntt_pallas(y, plan)
    can = np.asarray(
        intt_pallas(mont_mul(fx, to_mont(fy, p, pinv, r2), p, pinv), plan)
    )
    gx = ntt_pallas(x, plan, relabeled=True)
    gy = ntt_pallas(y, plan, relabeled=True)
    rel = np.asarray(
        intt_pallas(
            mont_mul(gx, to_mont(gy, p, pinv, r2), p, pinv),
            plan,
            relabeled=True,
        )
    )
    np.testing.assert_array_equal(can, rel)
    rt = np.asarray(intt_pallas(ntt_pallas(x, plan, relabeled=True), plan, relabeled=True))
    np.testing.assert_array_equal(rt, np.asarray(intt_pallas(ntt_pallas(x, plan), plan)))
