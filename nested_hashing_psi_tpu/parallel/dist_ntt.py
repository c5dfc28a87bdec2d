"""Distributed NTT: ring/slot (SP) axis sharded across chips.

The sequence-parallel analogue from SURVEY.md section 2.3: the n ring
coefficients are sharded over a mesh axis. Using the four-step factorization
(ops.ntt4):

  stage 1 (contract over k1 < m1) is chip-local when the m2 axis is sharded;
  ONE all-to-all re-shards from m2-split to m1-split (the Ulysses-style
  relayout, riding ICI);
  stage 2 (contract over k2 < m2) is then chip-local.

Layouts (x viewed as (..., L, m1, m2)):
  forward:  input sharded on m2, output sharded on m1 (canonical order rows);
  inverse:  mirror schedule, so NTT-domain pointwise algebra (sharded on m1)
  composes with iNTT without extra relayouts.

Results are bit-exact with ops.ntt (tests/test_dist_ntt.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from nested_hashing_psi_tpu.ops.modmath import mont_mul
from nested_hashing_psi_tpu.ops.ntt4 import FourStepPlan, _matmul_left, _matmul_right


def dist_ntt_fns(plan: FourStepPlan, mesh: Mesh, axis: str, ndim: int = 3):
    """Jitted (fwd, inv) for inputs of rank `ndim` ending in (L, m1, m2).

    fwd: x sharded on the m2 axis -> output sharded on the m1 axis.
    inv: y sharded on the m1 axis -> output sharded on the m2 axis.
    """
    n_shards = mesh.shape[axis]
    assert plan.m2 % n_shards == 0 and plan.m1 % n_shards == 0

    p = jnp.asarray(plan.p_arr)
    pinv = jnp.asarray(plan.pinv_arr)
    M1 = jnp.asarray(plan.M1)
    M2T = jnp.asarray(plan.M2T)
    iM1 = jnp.asarray(plan.iM1)
    iM2T = jnp.asarray(plan.iM2T)
    T = jnp.asarray(plan.T)
    iT = jnp.asarray(plan.iT)

    from jax import shard_map

    lead = (None,) * (ndim - 2)  # batch... + L axes replicated
    spec_m2 = P(*lead, None, axis)  # sharded on m2 (last axis)
    spec_m1 = P(*lead, axis, None)  # sharded on m1
    spec_tm2 = P(None, None, axis)  # twiddle matrices sliced on m2 columns

    def fwd_local(x_local, t_local):
        c = _matmul_left(M1, x_local, p, pinv)     # local: contract m1
        d = mont_mul(c, t_local, p, pinv)
        d = jax.lax.all_to_all(
            d, axis, split_axis=d.ndim - 2, concat_axis=d.ndim - 1, tiled=True
        )
        return _matmul_right(d, M2T, p, pinv)      # local: contract m2

    def inv_local(y_local, it_local):
        d = _matmul_right(y_local, iM2T, p, pinv)  # local: contract m2
        d = jax.lax.all_to_all(
            d, axis, split_axis=d.ndim - 1, concat_axis=d.ndim - 2, tiled=True
        )
        c = mont_mul(d, it_local, p, pinv)
        return _matmul_left(iM1, c, p, pinv)       # local: contract m1

    fwd = jax.jit(
        shard_map(
            fwd_local,
            mesh=mesh,
            in_specs=(spec_m2, spec_tm2),
            out_specs=spec_m1,
        )
    )
    inv = jax.jit(
        shard_map(
            inv_local,
            mesh=mesh,
            in_specs=(spec_m1, spec_tm2),
            out_specs=spec_m2,
        )
    )

    def fwd_fn(x):
        return fwd(x, T)

    def inv_fn(y):
        return inv(y, iT)

    return fwd_fn, inv_fn
