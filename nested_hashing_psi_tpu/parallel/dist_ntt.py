"""Distributed NTT: ring/slot (SP) axis sharded across chips.

Two layouts, mirroring SURVEY.md section 2.3's CP/SP rows:

 1. Ulysses-style (``dist_ntt_fns``): four-step factorization with ONE
    all-to-all relayout between the two locally-dense matmul stages.
 2. Ring-exchange / block-cyclic (``dist_ntt_ring_fns``): the butterfly NTT
    with each chip holding a contiguous coefficient block; every one of the
    first log2(D) butterfly super-stages exchanges whole blocks with the
    XOR-partner chip via ``ppermute`` (the ring-attention analogue for
    FFT-like dataflow), after which all remaining stages are chip-local.

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

Results are bit-exact with ops.ntt (tests/test_ntt4_dist.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from nested_hashing_psi_tpu.ops.modmath import add_mod, mont_mul, shoup_mul, sub_mod
from nested_hashing_psi_tpu.ops.ntt import NTTPlan
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


def ring_ntt_local_fns(plan: NTTPlan, axis: str, D: int):
    """Per-shard bodies (fwd_local, inv_local) of the ring-exchange NTT,
    for composing INSIDE a larger ``shard_map`` over mesh axis ``axis``
    (e.g. the SP-sharded PIE step in parallel.mesh). Each takes/returns a
    local block (..., L, n/D) of a coefficient-axis-sharded (..., L, n)
    tensor; they call ``axis_index``/``ppermute`` on ``axis`` internally.
    """
    n, L = plan.n, plan.L
    assert D & (D - 1) == 0 and n % (2 * D) == 0
    logD = D.bit_length() - 1
    logn = plan.logn
    block = n // D

    psi = jnp.asarray(plan.psi_rev)           # (L, 2, n) Shoup pairs
    ipsi = jnp.asarray(plan.psi_inv_rev)
    n_inv = jnp.asarray(plan.n_inv)           # (L, 2, 1)
    p2 = jnp.asarray(plan.p_arr)              # (L, 1)
    p3 = p2[:, :, None]                       # (L, 1, 1) for (..., L, m, t)

    def _tw_scalar(table, idx):
        # (L, 1) twiddle pair for one group; idx is traced.
        s = jax.lax.dynamic_slice(table, (0, 0, idx), (L, 2, 1))
        return s[:, 0], s[:, 1]

    def _tw_block(table, idx, count):
        s = jax.lax.dynamic_slice(table, (0, 0, idx), (L, 2, count))
        return s[:, 0, :, None], s[:, 1, :, None]

    def fwd_local(x):
        d = jax.lax.axis_index(axis)
        bshape = x.shape[:-2]
        for s in range(logD):  # super-stages: cross-chip butterflies
            m = 1 << s
            mask = D >> (s + 1)
            perm = [(i, i ^ mask) for i in range(D)]
            other = jax.lax.ppermute(x, axis, perm)
            is_lower = (d & mask) == 0
            u = jnp.where(is_lower, x, other)
            v_in = jnp.where(is_lower, other, x)
            tww, twq = _tw_scalar(psi, m + (d >> (logD - s)))
            v = shoup_mul(v_in, tww, twq, p2)
            x = jnp.where(is_lower, add_mod(u, v, p2), sub_mod(u, v, p2))
        for s in range(logD, logn):  # local stages on the block
            m = 1 << s
            t = n >> (s + 1)
            m_loc = m >> logD
            tww, twq = _tw_block(psi, m + d * m_loc, m_loc)
            xr = x.reshape(*bshape, L, m_loc, 2, t)
            u = xr[..., 0, :]
            v = shoup_mul(xr[..., 1, :], tww, twq, p3)
            x = jnp.stack(
                [add_mod(u, v, p3), sub_mod(u, v, p3)], axis=-2
            ).reshape(*bshape, L, block)
        return x

    def inv_local(x):
        d = jax.lax.axis_index(axis)
        bshape = x.shape[:-2]
        for s in range(logn - 1, logD - 1, -1):  # local stages first
            h = 1 << s
            t = n >> (s + 1)
            h_loc = h >> logD
            tww, twq = _tw_block(ipsi, h + d * h_loc, h_loc)
            xr = x.reshape(*bshape, L, h_loc, 2, t)
            u = xr[..., 0, :]
            v = xr[..., 1, :]
            x = jnp.stack(
                [
                    add_mod(u, v, p3),
                    shoup_mul(sub_mod(u, v, p3), tww, twq, p3),
                ],
                axis=-2,
            ).reshape(*bshape, L, block)
        for s in range(logD - 1, -1, -1):  # cross-chip super-stages
            h = 1 << s
            mask = D >> (s + 1)
            perm = [(i, i ^ mask) for i in range(D)]
            other = jax.lax.ppermute(x, axis, perm)
            is_lower = (d & mask) == 0
            u = jnp.where(is_lower, x, other)
            v = jnp.where(is_lower, other, x)
            tww, twq = _tw_scalar(ipsi, h + (d >> (logD - s)))
            x = jnp.where(
                is_lower,
                add_mod(u, v, p2),
                shoup_mul(sub_mod(u, v, p2), tww, twq, p2),
            )
        return shoup_mul(x, n_inv[:, 0], n_inv[:, 1], p2)

    return fwd_local, inv_local


def dist_ntt_ring_fns(plan: NTTPlan, mesh: Mesh, axis: str, ndim: int = 2):
    """Block-cyclic / ring-exchange distributed butterfly NTT (the CP row of
    SURVEY.md section 2.3 -- the structural analogue of ring attention).

    Input (..., L, n) with the coefficient axis sharded into D contiguous
    blocks. Forward (Cooley-Tukey, natural -> bit-reversed array order, same
    convention as ops.ntt): the first log2(D) super-stages pair coefficients
    i and i+t with t >= block, so each chip swaps its whole block with the
    XOR-partner chip (distance D >> (s+1) around the ring) via ``ppermute``
    and keeps its own output half; the remaining log2(n/D) stages are
    chip-local. Inverse (Gentleman-Sande) mirrors the schedule: local stages
    first, then log2(D) exchange super-stages. Bit-exact vs ops.ntt.

    Comm volume: log2(D) block-exchanges of n/D coefficients per limb, all
    pairwise over ICI -- vs the four-step layout's single all-to-all.
    """
    from jax import shard_map

    fwd_local, inv_local = ring_ntt_local_fns(plan, axis, mesh.shape[axis])
    lead = (None,) * (ndim - 1)
    spec = P(*lead, axis)  # shard the trailing (coefficient) axis
    fwd = jax.jit(shard_map(fwd_local, mesh=mesh, in_specs=spec, out_specs=spec))
    inv = jax.jit(shard_map(inv_local, mesh=mesh, in_specs=spec, out_specs=spec))
    return fwd, inv
