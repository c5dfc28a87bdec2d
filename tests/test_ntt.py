"""NTT kernel tests: roundtrip, numpy-model bit-exactness, convolution property."""

import numpy as np
import jax.numpy as jnp

import pytest

from nested_hashing_psi_tpu.ops import ntt as ntt_mod
from nested_hashing_psi_tpu.ops import primes, refmodel


@pytest.mark.parametrize("n", [16, 256, 4096])
def test_roundtrip(n):
    ps = primes.ntt_primes(3, 31, 2 * n)
    plan = ntt_mod.NTTPlan(n, ps)
    rng = np.random.default_rng(42)
    a = np.stack([rng.integers(0, p, size=n, dtype=np.uint64) for p in ps])
    aj = jnp.asarray(a, jnp.uint32)
    back = plan.intt_jit(plan.ntt_jit(aj))
    np.testing.assert_array_equal(np.asarray(back, np.uint64), a)


@pytest.mark.parametrize("n", [64, 1024])
def test_matches_numpy_model(n):
    """Device NTT must be bit-exact vs the numpy model (same twiddle tables)."""
    ps = primes.ntt_primes(2, 31, 2 * n)
    plan = ntt_mod.NTTPlan(n, ps)
    rng = np.random.default_rng(7)
    for l, p in enumerate(ps):
        psi = primes.primitive_root_of_unity(p, 2 * n)
        a = rng.integers(0, p, size=n, dtype=np.uint64)
        expected = refmodel.ntt_numpy(a, p, psi)
        full = np.stack([a % q for q in ps]).astype(np.uint64)
        got = np.asarray(plan.ntt_jit(jnp.asarray(full, jnp.uint32)), np.uint64)
        np.testing.assert_array_equal(got[l], expected)


def test_pointwise_mult_is_negacyclic_convolution():
    n = 32
    ps = primes.ntt_primes(1, 31, 2 * n)
    p = ps[0]
    plan = ntt_mod.NTTPlan(n, ps)
    rng = np.random.default_rng(9)
    a = rng.integers(0, p, size=n, dtype=np.uint64)
    b = rng.integers(0, p, size=n, dtype=np.uint64)
    expected = refmodel.negacyclic_mul_naive(a, b, p)

    from nested_hashing_psi_tpu.ops.modmath import mont_constants, mont_mul, to_mont

    pinv, r2 = mont_constants(p)
    aj = plan.ntt_jit(jnp.asarray(a[None], jnp.uint32))
    bj = plan.ntt_jit(jnp.asarray(b[None], jnp.uint32))
    prod = mont_mul(
        aj,
        to_mont(bj, jnp.uint32(p), jnp.uint32(pinv), jnp.uint32(r2)),
        jnp.uint32(p),
        jnp.uint32(pinv),
    )
    got = np.asarray(plan.intt_jit(prod), np.uint64)[0]
    np.testing.assert_array_equal(got, expected)


def test_batched_shapes():
    n = 64
    ps = primes.ntt_primes(2, 31, 2 * n)
    plan = ntt_mod.NTTPlan(n, ps)
    rng = np.random.default_rng(3)
    a = rng.integers(0, min(ps), size=(4, 3, 2, n), dtype=np.uint64)
    aj = jnp.asarray(a, jnp.uint32)
    out = plan.ntt_jit(aj)
    assert out.shape == a.shape
    back = plan.intt_jit(out)
    np.testing.assert_array_equal(np.asarray(back, np.uint64), a)
