"""Pallas PIE kernel vs jnp reference formulation (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from nested_hashing_psi_tpu.ops import primes
from nested_hashing_psi_tpu.ops.modmath import mont_constants
from nested_hashing_psi_tpu.ops.pie_kernels import (
    indexed_inner_product,
    indexed_inner_product_jnp,
)


def test_indexed_inner_product_matches_reference():
    H, D, P, L, N = 2, 3, 5, 2, 256
    ps = primes.ntt_primes(L, 31, 2 * N)
    p = jnp.asarray(np.array(ps, np.uint32).reshape(L, 1))
    pinv = jnp.asarray(
        np.array([mont_constants(q)[0] for q in ps], np.uint32).reshape(L, 1)
    )
    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        rng.integers(0, min(ps), size=(H, P, 2, L, N), dtype=np.uint64), jnp.uint32
    )
    pt = jnp.asarray(
        rng.integers(0, min(ps), size=(H, D, P, L, N), dtype=np.uint64), jnp.uint32
    )
    expected = indexed_inner_product_jnp(idx, pt, p, pinv)
    got = indexed_inner_product(idx, pt, p, pinv, tile_n=128)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))


def test_indexed_inner_product_tile_shrink():
    """Exercises the automatic tile_n shrink that bounds the double-buffered
    table block: an oversized explicit tile (32768) exceeds the 8 MB budget
    at D = P = 12, so the while-loop must halve it down to 2048 and the
    N % tile_n == 0 path is genuinely covered. (Keeping D small keeps the
    interpret-mode XLA program compilable in CI -- a D = 48 unroll was
    measured to blow the CPU compile up to an hour.)"""
    H, D, P, L, N = 1, 12, 12, 1, 32768
    tile_req = N
    assert D * P * tile_req * 4 > (8 << 20), "geometry must force a shrink"
    ps = primes.ntt_primes(L, 31, 2 * N)
    p = jnp.asarray(np.array(ps, np.uint32).reshape(L, 1))
    pinv = jnp.asarray(
        np.array([mont_constants(q)[0] for q in ps], np.uint32).reshape(L, 1)
    )
    rng = np.random.default_rng(7)
    idx = jnp.asarray(
        rng.integers(0, min(ps), size=(H, P, 2, L, N), dtype=np.uint64), jnp.uint32
    )
    pt = jnp.asarray(
        rng.integers(0, min(ps), size=(H, D, P, L, N), dtype=np.uint64), jnp.uint32
    )
    expected = indexed_inner_product_jnp(idx, pt, p, pinv)
    got = indexed_inner_product(idx, pt, p, pinv, tile_n=tile_req)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))
