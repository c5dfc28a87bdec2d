"""MXU four-step NTT (int8-digit matmuls): bit-exact vs the canonical NTT,
both the jnp/XLA path and the fused Pallas kernel (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nested_hashing_psi_tpu.ops import primes
from nested_hashing_psi_tpu.ops.ntt import NTTPlan, ntt
from nested_hashing_psi_tpu.ops.ntt_mxu import (
    MxuNTTPlan,
    intt_mxu,
    intt_mxu_pallas,
    ntt_mxu,
    ntt_mxu_pallas,
)


def _data(n, ps, batch, seed=5):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        np.stack([[rng.integers(0, p, n) for p in ps] for _ in range(batch)]),
        jnp.uint32,
    )


@pytest.mark.parametrize("n", [256, 1024])
def test_mxu_matches_canonical(n):
    ps = primes.ntt_primes(2, 31, 2 * n)
    plan, mp = NTTPlan(n, ps), MxuNTTPlan(n, ps)
    x = _data(n, ps, 3)
    want = np.asarray(ntt(x, plan))
    np.testing.assert_array_equal(np.asarray(ntt_mxu(x, mp)), want)
    np.testing.assert_array_equal(
        np.asarray(intt_mxu(jnp.asarray(want), mp)), np.asarray(x)
    )


def test_mxu_pallas_matches_canonical():
    n = 512  # odd log2: m1 = 2 * m2
    ps = primes.ntt_primes(2, 31, 2 * n)
    plan, mp = NTTPlan(n, ps), MxuNTTPlan(n, ps)
    assert mp.m1 == 2 * mp.m2
    x = _data(n, ps, 3)  # 3 % tile_b != 0 exercises padding
    want = np.asarray(ntt(x, plan))
    np.testing.assert_array_equal(np.asarray(ntt_mxu_pallas(x, mp, tile_b=2)), want)
    back = np.asarray(intt_mxu_pallas(jnp.asarray(want), mp, tile_b=2))
    np.testing.assert_array_equal(back, np.asarray(x))


def test_digit_bounds_exact():
    """The int8 digit contraction bound: 5 digits of 7 bits, products
    accumulated over 5*m rows stay far below 2^31 for m <= 2048."""
    m = 2048
    assert 5 * m * 127 * 127 < 2**31
