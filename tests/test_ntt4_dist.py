"""Four-step NTT (single-chip) and distributed SP-sharded NTT: both must be
bit-exact with the canonical butterfly NTT."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nested_hashing_psi_tpu.ops import primes
from nested_hashing_psi_tpu.ops.ntt import NTTPlan, ntt, intt
from nested_hashing_psi_tpu.ops.ntt4 import FourStepPlan, intt4, ntt4


@pytest.mark.parametrize("n,m1", [(64, 8), (256, 16), (1024, 32)])
def test_four_step_matches_canonical(n, m1):
    ps = primes.ntt_primes(2, 31, 2 * n)
    plan = NTTPlan(n, ps)
    plan4 = FourStepPlan(n, ps, m1=m1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, min(ps), size=(3, len(ps), n), dtype=np.uint64), jnp.uint32
    )
    expected = np.asarray(plan.ntt_jit(x))
    got = np.asarray(jax.jit(lambda a: ntt4(a, plan4))(x))
    np.testing.assert_array_equal(got, expected)

    back = np.asarray(jax.jit(lambda a: intt4(a, plan4))(jnp.asarray(got)))
    np.testing.assert_array_equal(back, np.asarray(x))


def test_dist_ntt_sharded_matches_canonical():
    from jax.sharding import Mesh
    from nested_hashing_psi_tpu.parallel.dist_ntt import dist_ntt_fns

    n, m1 = 256, 16
    ps = primes.ntt_primes(2, 31, 2 * n)
    plan = NTTPlan(n, ps)
    plan4 = FourStepPlan(n, ps, m1=m1)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), ("sp",))
    fwd, inv = dist_ntt_fns(plan4, mesh, "sp", ndim=3)

    rng = np.random.default_rng(1)
    x = rng.integers(0, min(ps), size=(len(ps), n), dtype=np.uint64)
    x2d = jnp.asarray(x.reshape(len(ps), m1, n // m1), jnp.uint32)

    out = np.asarray(fwd(x2d)).reshape(len(ps), n)
    expected = np.asarray(plan.ntt_jit(jnp.asarray(x, jnp.uint32)))
    np.testing.assert_array_equal(out, expected)

    back = np.asarray(inv(jnp.asarray(out.reshape(len(ps), m1, n // m1), jnp.uint32)))
    np.testing.assert_array_equal(back.reshape(len(ps), n), x)


@pytest.mark.parametrize("ndev,ndim", [(4, 2), (8, 3)])
def test_dist_ntt_ring_exchange_matches_canonical(ndev, ndim):
    """CP / ring-exchange layout (ppermute butterfly super-stages)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from nested_hashing_psi_tpu.parallel.dist_ntt import dist_ntt_ring_fns

    n = 256
    ps = primes.ntt_primes(3, 31, 2 * n)
    plan = NTTPlan(n, ps)
    mesh = Mesh(np.array(jax.devices()[:ndev]).reshape(ndev), ("sp",))
    fwd, inv = dist_ntt_ring_fns(plan, mesh, "sp", ndim=ndim)

    rng = np.random.default_rng(7)
    bshape = (2,) if ndim == 3 else ()
    x = rng.integers(0, min(ps), size=bshape + (len(ps), n), dtype=np.uint64)
    spec = P(*(None,) * (ndim - 1), "sp")
    xd = jax.device_put(jnp.asarray(x, jnp.uint32), NamedSharding(mesh, spec))

    out = np.asarray(fwd(xd))
    expected = np.asarray(plan.ntt_jit(jnp.asarray(x, jnp.uint32)))
    np.testing.assert_array_equal(out, expected)

    back = np.asarray(inv(jnp.asarray(out)))
    np.testing.assert_array_equal(back, x)
