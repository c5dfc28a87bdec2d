"""Fused Pallas NTT/iNTT: all butterfly stages VMEM-resident, one HBM pass.

TPU-native replacement for OpenFHE's NTT inside ``DCRTPoly`` (every Eval*
call in the reference, e.g.
/root/reference/src/Common/Crypto/PrivateIndexedEqualityCheck/BatchedFHEHIPPIE.cpp:101-126).
The jnp butterfly in ``ops.ntt`` emits log2(n) elementwise stages; once the
working set exceeds VMEM each stage round-trips HBM (2*log2(n) passes). This
kernel loads a tile of residue polynomials into VMEM once, runs every stage
on-chip, and writes the result once -- the fused-HBM speed of light.

Algorithm (axis-split / four-step, matching ``ops.ntt4``'s factorization and
therefore bit-exact with ``ops.ntt``'s canonical bit-reversed order):

    view x as (m1, m2), n = m1*m2
    1. negacyclic length-m1 NTT down the m1 axis  (root phi = psi^m2),
       merged-twiddle Cooley-Tukey, natural -> bit-reversed
    2. elementwise twiddle  T'[a, k2] = psi^k2 * omega^(rev_m1(a)*k2)
    3. cyclic length-m2 NTT along the m2 axis (root w = omega^m1),
       Gentleman-Sande decimation-in-frequency, natural -> bit-reversed,
       executed down the sublane axis after an on-chip transpose

Each butterfly stage is a roll-based full-tile update (one twiddle multiply
+ two sublane rolls + select) -- no minor-dim reshapes, so Mosaic never
relayouts. Per-stage twiddles are precomputed as per-ROW vectors (m, 1): the
CT stage's twiddle depends only on the group index (row // 2t), the GS
stage's only on the within-group offset (row mod h), so both broadcast
along lanes.

Twiddle multiplies use SHOUP precomputation (modmath.shoup_mul): every
multiplicand here is a host-precomputed constant, so each table carries a
(value, floor(value*2^32/p)) pair and the butterfly pays one mulhi + two
low multiplies (~19 VPU ops) instead of Montgomery's two mulhi (~29) --
the standard NTT fast path (cf. NTL/SEAL), ~25% fewer ops per butterfly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nested_hashing_psi_tpu.ops import primes as primes_mod
from nested_hashing_psi_tpu.ops.modmath import (
    add_mod,
    shoup_host,
    shoup_mul,
    sub_mod,
)
from nested_hashing_psi_tpu.ops.ntt import bit_reverse_indices

DEFAULT_TILE_B = 8


def _log2(x: int) -> int:
    assert x & (x - 1) == 0 and x > 0
    return x.bit_length() - 1


def _pow_table(base: int, count: int, p: int) -> list[int]:
    out = [1] * count
    for i in range(1, count):
        out[i] = out[i - 1] * base % p
    return out


@dataclass(eq=False)  # identity hash: used as a static jit argument
class SplitNTTPlan:
    """Host-precomputed per-stage row-twiddle tables for the split NTT.

    Tables (numpy uint32); axis 1 packs the Shoup pair [value, quotient]:
      s1  (L, 2, log_m1, m1, 1)  CT stage k: row r -> phi^rev[m + r//(2t)]
      s2  (L, 2, log_m2, m2, 1)  GS stage k: row r -> w^((m2/t) * (r mod h))
      tw  (L, 2, m1, m2)         psi^k2 * omega^(rev_m1(a) * k2)
      is1 (L, 2, log_m1, m1, 1)  inverse of s1 stage tables (GS replay)
      is2 (L, 2, log_m2, m2, 1)  inverse of s2 stage tables (CT replay)
      itw (L, 2, m1, m2)         inverse twiddle * m1^-1 * m2^-1 (scaling)
    """

    n: int
    primes: tuple[int, ...]
    m1: int = 0

    def __post_init__(self):
        n = self.n
        if self.m1 == 0:
            self.m1 = 1 << ((_log2(n) + 1) // 2)
        self.m2 = n // self.m1
        m1, m2 = self.m1, self.m2
        assert m1 * m2 == n and m1 >= 2 and m2 >= 2
        L = len(self.primes)
        log1, log2_ = _log2(m1), _log2(m2)
        rev1 = bit_reverse_indices(m1)

        s1 = np.zeros((L, 2, log1, m1, 1), np.uint32)
        s2 = np.zeros((L, 2, log2_, m2, 1), np.uint32)
        tw = np.zeros((L, 2, m1, m2), np.uint32)
        is1 = np.zeros((L, 2, log1, m1, 1), np.uint32)
        is2 = np.zeros((L, 2, log2_, m2, 1), np.uint32)
        itw = np.zeros((L, 2, m1, m2), np.uint32)
        p_arr = np.zeros((L, 1), np.uint32)

        def pair(dst, idx, val, p):
            dst[(idx[0], 0) + idx[1:]] = val
            dst[(idx[0], 1) + idx[1:]] = shoup_host(val, p)

        for l, p in enumerate(self.primes):
            psi = primes_mod.primitive_root_of_unity(p, 2 * n)
            omega = psi * psi % p
            phi = pow(psi, m2, p)          # primitive 2*m1-th root
            w = pow(omega, m1, p)          # primitive m2-th root
            phi_pows = _pow_table(phi, m1, p)
            t1_full = [phi_pows[int(rev1[i])] for i in range(m1)]
            iphi = pow(phi, -1, p)
            iphi_pows = _pow_table(iphi, m1, p)
            it1_full = [iphi_pows[int(rev1[i])] for i in range(m1)]
            w_inv = pow(w, -1, p)

            # stage-1 CT (negacyclic, natural -> bitrev): stage k has
            # m = 2^k groups of span 2t, t = m1 >> (k+1); twiddle per group.
            for k in range(log1):
                m = 1 << k
                t = m1 >> (k + 1)
                for r in range(m1):
                    g = r // (2 * t)
                    pair(s1, (l, k, r, 0), t1_full[m + g], p)
                    # inverse replays stages reversed as GS with s^-1
                    pair(is1, (l, k, r, 0), it1_full[m + g], p)

            # stage-2 GS (cyclic, natural -> bitrev): stage k has block size
            # t = m2 >> k, half h = t//2; twiddle w^((m2/t) * (r mod h)).
            for k in range(log2_):
                t = m2 >> k
                h = t // 2
                stride = m2 // t
                for r in range(m2):
                    j = r % h
                    pair(s2, (l, k, r, 0), pow(w, stride * j, p), p)
                    pair(is2, (l, k, r, 0), pow(w_inv, stride * j, p), p)

            inv_m = pow(m1 * m2, -1, p)
            psi_inv = pow(psi, -1, p)
            omega_inv = pow(omega, -1, p)
            for a in range(m1):
                ja = int(rev1[a])
                for k2 in range(m2):
                    pair(
                        tw,
                        (l, a, k2),
                        pow(psi, k2, p) * pow(omega, ja * k2, p) % p,
                        p,
                    )
                    pair(
                        itw,
                        (l, a, k2),
                        pow(psi_inv, k2, p)
                        * pow(omega_inv, ja * k2, p)
                        * inv_m
                        % p,
                        p,
                    )
            p_arr[l, 0] = p

        self.s1, self.s2, self.tw = s1, s2, tw
        self.is1, self.is2, self.itw = is1, is2, itw
        self.p_arr = p_arr
        self.log1, self.log2 = log1, log2_

        # v2 ("no-roll") kernel tables: sub-tile stages (pair distance
        # t < SPLIT_MIN_T) run in REGROUPED row space -- rows (blk*8 + off)
        # relocated to (off*(M/8) + blk) by one reshape/swap -- which scales
        # every pair distance by M/8, so all butterflies stay tile-aligned
        # split-form (no sublane rolls, no selects). The per-row twiddle
        # tables for those stages are permuted to match here, on host.
        def v2_tables(tab, M):
            out = tab.copy()
            if not _use_regroup(M):
                return out
            idx = _regroup_perm(M)
            for k in range(tab.shape[2]):
                if (M >> (k + 1)) < SPLIT_MIN_T:
                    out[:, :, k] = tab[:, :, k][:, :, idx]
            return out

        self.s1_v2 = v2_tables(s1, m1)
        self.is1_v2 = v2_tables(is1, m1)
        self.s2_v2 = v2_tables(s2, m2)
        self.is2_v2 = v2_tables(is2, m2)

    @property
    def L(self) -> int:
        return len(self.primes)


# ---------------------------------------------------------------------------
# Shared stage primitives (trace inside Pallas kernels AND plain jnp).
# X: (..., M, lanes); s_row: broadcastable (..., M, 1); p/pinv broadcastable.
# ---------------------------------------------------------------------------

def _rows_mask(M: int, span: int, ndim: int):
    """(..., M, 1) bool: True on the first half of each span-pair block."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    mask = (rows // span) % 2 == 0
    return mask.reshape((1,) * (ndim - 2) + (M, 1))


# Minimum pair distance for the reshape (u/v-split) form: below a sublane
# tile the split view forces sub-tile relayouts, so fall back to rolls.
SPLIT_MIN_T = 8


def _use_regroup(M: int) -> bool:
    """Whether the v2 kernel lifts the sub-tile stages of an M-point half
    into regrouped row space: M/8 >= 8 guarantees every scaled pair distance
    t*(M/8) >= SPLIT_MIN_T (t >= 1)."""
    return M >= 64


def _regroup_perm(M: int) -> np.ndarray:
    """idx such that regrouped_row[r'] = natural_row[idx[r']]: the regroup
    sends row blk*8 + off to off*(M/8) + blk."""
    R = M // 8
    rp = np.arange(M)
    return (rp % R) * 8 + rp // R


def _regroup(X):
    """Rows (..., M, lanes): blk*8 + off -> off*(M/8) + blk (one sub-block
    transpose on the sublane axis; lifts sub-tile pair strides by M/8)."""
    *lead, M, lanes = X.shape
    Xr = X.reshape(*lead, M // 8, 8, lanes)
    return jnp.swapaxes(Xr, -3, -2).reshape(*lead, M, lanes)


def _ungroup(X):
    """Inverse of _regroup."""
    *lead, M, lanes = X.shape
    Xr = X.reshape(*lead, 8, M // 8, lanes)
    return jnp.swapaxes(Xr, -3, -2).reshape(*lead, M, lanes)


def _v_twiddle(s_row, M: int, t: int):
    """Per-row table (..., M, 1) -> v-half values (..., g, t, 1) (the table
    stores the same twiddle on u and v rows; the split form consumes v's)."""
    g = M // (2 * t)
    lead = s_row.shape[:-2]
    sv = s_row.reshape(*lead, g, 2, t, 1)
    return sv[..., 1, :, :]


def _bcast_p(p, ndim_extra: int = 1):
    return p[..., None, :, :] if hasattr(p, "ndim") and p.ndim > 1 else p


def _ct_stage_roll(X, sw, sq, t: int, p):
    W = shoup_mul(X, sw, sq, p)
    W_up = jnp.roll(W, -t, axis=-2)
    X_dn = jnp.roll(X, t, axis=-2)
    is_u = _rows_mask(X.shape[-2], t, X.ndim)
    return jnp.where(is_u, add_mod(X, W_up, p), sub_mod(X_dn, W, p))


def _gs_stage_roll(X, sw, sq, h: int, p):
    X_up = jnp.roll(X, -h, axis=-2)
    X_dn = jnp.roll(X, h, axis=-2)
    is_u = _rows_mask(X.shape[-2], h, X.ndim)
    return jnp.where(
        is_u,
        add_mod(X, X_up, p),
        shoup_mul(sub_mod(X_dn, X, p), sw, sq, p),
    )


def _ct_stage_split(X, sw, sq, t: int, p):
    *lead, M, lanes = X.shape
    g = M // (2 * t)
    Xr = X.reshape(*lead, g, 2, t, lanes)
    u, v = Xr[..., 0, :, :], Xr[..., 1, :, :]
    pb = _bcast_p(p)
    w = shoup_mul(v, _v_twiddle(sw, M, t), _v_twiddle(sq, M, t), pb)
    out = jnp.stack([add_mod(u, w, pb), sub_mod(u, w, pb)], axis=-3)
    return out.reshape(*lead, M, lanes)


def _gs_stage_split(X, sw, sq, h: int, p):
    *lead, M, lanes = X.shape
    g = M // (2 * h)
    Xr = X.reshape(*lead, g, 2, h, lanes)
    u, v = Xr[..., 0, :, :], Xr[..., 1, :, :]
    pb = _bcast_p(p)
    out = jnp.stack(
        [
            add_mod(u, v, pb),
            shoup_mul(
                sub_mod(u, v, pb),
                _v_twiddle(sw, M, h),
                _v_twiddle(sq, M, h),
                pb,
            ),
        ],
        axis=-3,
    )
    return out.reshape(*lead, M, lanes)


def ct_stage(X, sw, sq, t: int, p):
    """u' = u + s*v ; v' = u - s*v with pair distance t down axis -2."""
    if t >= SPLIT_MIN_T:
        return _ct_stage_split(X, sw, sq, t, p)
    return _ct_stage_roll(X, sw, sq, t, p)


# ---------------------------------------------------------------------------
# Multi-level fused blocks: apply r consecutive butterfly levels in ONE pass
# over the tile, removing full-tile materializations between stages. Built on
# the hypothesis that those round-trips were the binder; the measured sweep
# (benchmarks/bench_ntt_kernel.py, fuse in {1,2,4,7} all within ~5%) showed
# they are NOT -- the kernel is bound by VPU instruction ISSUE (a chained
# mulhi runs as fast as a chained add, benchmarks/bench_vpu_ops.py, so op
# *count* reductions below ~25% measure flat; see BENCH_NOTES.md). The fused
# executor is kept for experiments; bit-exact with the per-stage path:
# identical butterfly arithmetic, identical order.
# ---------------------------------------------------------------------------

def _split2(A):
    """(..., B, lanes_or_1) -> halves ((..., B/2, w), (..., B/2, w))."""
    *lead, B, w = A.shape
    Ar = A.reshape(*lead, 2, B // 2, w)
    return Ar[..., 0, :, :], Ar[..., 1, :, :]


def _join2(u, v):
    *lead, h, w = u.shape
    return jnp.stack([u, v], axis=-3).reshape(*lead, 2 * h, w)


def _fused_block(X, tabs, p, kind: str, topdown: bool):
    """Apply len(tabs) butterfly levels inside one block (axis -2).

    tabs: [(sw, sq), ...] coarsest level first; each table row-aligned with
    X's axis -2. topdown=True applies coarse -> fine (forward order),
    False applies fine -> coarse (inverse replay). kind: 'ct' | 'gs'.
    """
    if not tabs:
        return X
    sw, sq = tabs[0]
    sw_u, sw_v = _split2(sw)
    sq_u, sq_v = _split2(sq)
    u, v = _split2(X)
    rest = [(a, b) for a, b in tabs[1:]]

    def rec(y, half):
        sub = [( _split2(a)[half], _split2(b)[half]) for a, b in rest]
        return _fused_block(y, sub, p, kind, topdown)

    if not topdown:
        u, v = rec(u, 0), rec(v, 1)
    if kind == "ct":
        w = shoup_mul(v, sw_v, sq_v, p)
        u, v = add_mod(u, w, p), sub_mod(u, w, p)
    else:  # gs
        u, v = add_mod(u, v, p), shoup_mul(sub_mod(u, v, p), sw_v, sq_v, p)
    if topdown:
        u, v = rec(u, 0), rec(v, 1)
    return _join2(u, v)


def _run_group(X, tab, ks, t_eff, p, kind: str, topdown: bool):
    """Run the consecutive stages ``ks`` (with effective pair distances
    ``t_eff``, coarsest first) as one fused pass. All stages must live in the
    same row space (natural or regrouped)."""
    *lead, M, lanes = X.shape
    B = 2 * t_eff[0]                     # block size = 2 * coarsest distance
    g = M // B
    Xb = X.reshape(*lead, g, B, lanes)
    tabs = []
    for k in ks:
        sw = tab[0, k].reshape(*tab[0, k].shape[:-2], g, B, 1)
        sq = tab[1, k].reshape(*tab[1, k].shape[:-2], g, B, 1)
        tabs.append((sw, sq))
    out = _fused_block(Xb, tabs, p, kind, topdown)
    return out.reshape(*lead, M, lanes)


def gs_stage(X, sw, sq, h: int, p):
    """u' = u + v ; v' = (u - v) * s with pair distance h down axis -2."""
    if h >= SPLIT_MIN_T:
        return _gs_stage_split(X, sw, sq, h, p)
    return _gs_stage_roll(X, sw, sq, h, p)


def _fwd_stages(X, s1, s2, tw, p, m1: int, m2: int):
    """X: (..., m1, m2) -> canonical bit-reversed NTT, still (..., m1, m2).

    Tables carry the Shoup pair on axis -4/-3 (see SplitNTTPlan):
    s1: (..., 2, log1, m1, 1), s2: (..., 2, log2, m2, 1), tw: (..., 2, m1, m2).
    """
    for k in range(_log2(m1)):
        X = ct_stage(
            X, s1[..., 0, k, :, :], s1[..., 1, k, :, :], m1 >> (k + 1), p
        )
    X = shoup_mul(X, tw[..., 0, :, :], tw[..., 1, :, :], p)
    X = jnp.swapaxes(X, -1, -2)          # (..., m2, m1)
    for k in range(_log2(m2)):
        X = gs_stage(
            X, s2[..., 0, k, :, :], s2[..., 1, k, :, :], m2 >> (k + 1), p
        )
    return jnp.swapaxes(X, -1, -2)       # (..., m1, m2) = (a, b)


def _run_half_v2(X, tab, M: int, p, kind: str, ks, fuse: int = 1,
                 enter_rg: bool = False, exit_rg: bool = False):
    """One half of the split NTT: iterate stage indices ``ks`` (pair
    distance t = M >> (k+1)); contiguous runs of sub-tile stages execute in
    regrouped row space with distance t*(M/8) using the plan's permuted
    tables (tab = (2, log, M, 1) v2 tables). ``fuse`` > 1 bundles up to that
    many consecutive same-row-space stages into one multi-level pass
    (_fused_block); measured flat vs fuse=1 -- the kernel is VPU
    instruction-issue-bound, not tile-materialization-bound (see the
    DEFAULT_FUSE note below and BENCH_NOTES.md)."""
    ks = list(ks)
    topdown = ks == sorted(ks)           # forward order = coarse -> fine
    R = M // 8
    stage_fn = ct_stage if kind == "ct" else gs_stage

    def space(k):
        t = M >> (k + 1)
        if t >= SPLIT_MIN_T:
            return "nat"
        return "rg" if _use_regroup(M) else "roll"

    runs: list[tuple[str, list[int]]] = []
    for k in ks:
        sp = space(k)
        if runs and runs[-1][0] == sp and sp != "roll":
            runs[-1][1].append(k)
        else:
            runs.append((sp, [k]))

    for ri, (sp, run) in enumerate(runs):
        if sp == "roll":
            k = run[0]
            X = stage_fn(X, tab[0, k], tab[1, k], M >> (k + 1), p)
            continue
        if sp == "rg" and not (enter_rg and ri == 0):
            X = _regroup(X)
        scale = R if sp == "rg" else 1
        for i in range(0, len(run), max(1, fuse)):
            grp = sorted(run[i : i + max(1, fuse)])   # coarsest first
            te = [(M >> (k + 1)) * scale for k in grp]
            if len(grp) == 1:
                X = stage_fn(X, tab[0, grp[0]], tab[1, grp[0]], te[0], p)
            else:
                X = _run_group(X, tab, grp, te, p, kind, topdown)
        if sp == "rg" and not (exit_rg and ri == len(runs) - 1):
            X = _ungroup(X)
    return X


def _fwd_stages_v2(X, s1, s2, tw, p, m1: int, m2: int, fuse: int = 1,
                   relabeled_out: bool = False):
    """Bit-exact with _fwd_stages; sub-tile stages run regrouped (v2 tables).
    Table axes here: s1/s2 = (2, log, M, 1), tw = (2, m1, m2).

    relabeled_out=True leaves the result in the RELABELED evaluation domain:
    the (m2, m1)-transposed, regrouped row space the final GS run naturally
    ends in -- skipping the exit ungroup + transpose. Pointwise algebra
    between a relabeled forward and a relabeled inverse is unchanged (the
    evaluation points are merely renumbered, identically on both sides);
    only closed fwd -> pointwise -> inv sandwiches may use it. Requires
    m1 == m2 (the transposed tile keeps its shape)."""
    X = _run_half_v2(X, s1, m1, p, "ct", range(_log2(m1)), fuse)
    X = shoup_mul(X, tw[..., 0, :, :], tw[..., 1, :, :], p)
    X = jnp.swapaxes(X, -1, -2)
    X = _run_half_v2(X, s2, m2, p, "gs", range(_log2(m2)), fuse,
                     exit_rg=relabeled_out)
    if relabeled_out:
        return X
    return jnp.swapaxes(X, -1, -2)


def _inv_stages_v2(X, is1, is2, itw, p, m1: int, m2: int, fuse: int = 1,
                   relabeled_in: bool = False):
    """Bit-exact with _inv_stages; sub-tile stages run regrouped.
    relabeled_in accepts input in the relabeled evaluation domain
    (see _fwd_stages_v2)."""
    if not relabeled_in:
        X = jnp.swapaxes(X, -1, -2)
    X = _run_half_v2(X, is2, m2, p, "ct", reversed(range(_log2(m2))), fuse,
                     enter_rg=relabeled_in)
    X = jnp.swapaxes(X, -1, -2)
    X = shoup_mul(X, itw[..., 0, :, :], itw[..., 1, :, :], p)
    X = _run_half_v2(X, is1, m1, p, "gs", reversed(range(_log2(m1))), fuse)
    return X


def _inv_stages(X, is1, is2, itw, p, m1: int, m2: int):
    """Inverse of _fwd_stages (bit-reversed in -> natural out)."""
    X = jnp.swapaxes(X, -1, -2)          # (..., m2, m1)
    for k in reversed(range(_log2(m2))):
        X = ct_stage(
            X, is2[..., 0, k, :, :], is2[..., 1, k, :, :], m2 >> (k + 1), p
        )
    X = jnp.swapaxes(X, -1, -2)
    X = shoup_mul(X, itw[..., 0, :, :], itw[..., 1, :, :], p)  # incl. 1/(m1*m2)
    for k in reversed(range(_log2(m1))):
        X = gs_stage(
            X, is1[..., 0, k, :, :], is1[..., 1, k, :, :], m1 >> (k + 1), p
        )
    return X


# ---------------------------------------------------------------------------
# Pure-jnp entry points (CPU fallback / sharded paths / oracle for the kernel)
# ---------------------------------------------------------------------------

def _split_call(x, plan: SplitNTTPlan, inverse: bool):
    L, n, m1, m2 = plan.L, plan.n, plan.m1, plan.m2
    bshape = x.shape[:-2]
    assert x.shape[-2:] == (L, n), (x.shape, L, n)
    X = x.reshape(*bshape, L, m1, m2)
    p = jnp.asarray(plan.p_arr)[:, :, None]        # (L, 1, 1)
    if inverse:
        out = _inv_stages(
            X, jnp.asarray(plan.is1), jnp.asarray(plan.is2),
            jnp.asarray(plan.itw), p, m1, m2,
        )
    else:
        out = _fwd_stages(
            X, jnp.asarray(plan.s1), jnp.asarray(plan.s2),
            jnp.asarray(plan.tw), p, m1, m2,
        )
    return out.reshape(*bshape, L, n)


def ntt_split(x, plan: SplitNTTPlan):
    """Forward split NTT, bit-exact with ops.ntt.ntt. x: (..., L, n)."""
    return _split_call(x, plan, inverse=False)


def intt_split(x, plan: SplitNTTPlan):
    """Inverse split NTT, bit-exact with ops.ntt.intt."""
    return _split_call(x, plan, inverse=True)


# ---------------------------------------------------------------------------
# Pallas kernel: grid (L, B/TB); the whole stage pipeline runs on one
# VMEM-resident (TB, m1, m2) tile.
# ---------------------------------------------------------------------------

def _make_kernel(m1: int, m2: int, inverse: bool, fuse: int,
                 relabeled: bool = False):
    def kernel(p_ref, x_ref, sa_ref, sb_ref, tw_ref, out_ref):
        l = pl.program_id(0)
        p = p_ref[l, 0]
        X = x_ref[:, 0]                      # (TB, m1, m2)
        sa = sa_ref[0]                       # (2, log1, m1, 1) v2 tables
        sb = sb_ref[0]                       # (2, log2, m2, 1) v2 tables
        tw = tw_ref[0]                       # (2, m1, m2)
        if inverse:
            out = _inv_stages_v2(X, sa, sb, tw, p, m1, m2, fuse,
                                 relabeled_in=relabeled)
        else:
            out = _fwd_stages_v2(X, sa, sb, tw, p, m1, m2, fuse,
                                 relabeled_out=relabeled)
        out_ref[:, 0] = out

    return kernel


@partial(jax.jit, static_argnames=("plan", "inverse", "tile_b", "interpret",
                                   "fuse", "relabeled"))
def _pallas_call(x, plan: SplitNTTPlan, inverse: bool, tile_b: int,
                 interpret: bool, fuse: int, relabeled: bool = False):
    if relabeled:
        assert plan.m1 == plan.m2, "relabeled domain needs a square split"
    L, n, m1, m2 = plan.L, plan.n, plan.m1, plan.m2
    bshape = x.shape[:-2]
    B = int(np.prod(bshape)) if bshape else 1
    xb = x.reshape(B, L, m1, m2)
    pad = (-B) % tile_b
    if pad:
        xb = jnp.concatenate([xb, jnp.zeros((pad, L, m1, m2), x.dtype)], axis=0)
    Bp = B + pad

    if inverse:
        sa, sb, tw = plan.is1_v2, plan.is2_v2, plan.itw
    else:
        sa, sb, tw = plan.s1_v2, plan.s2_v2, plan.tw

    grid = (L, Bp // tile_b)
    out = pl.pallas_call(
        _make_kernel(m1, m2, inverse, fuse, relabeled),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, 1, m1, m2), lambda l, b: (b, l, 0, 0)),
            pl.BlockSpec(
                (1, 2, sa.shape[2], m1, 1), lambda l, b: (l, 0, 0, 0, 0)
            ),
            pl.BlockSpec(
                (1, 2, sb.shape[2], m2, 1), lambda l, b: (l, 0, 0, 0, 0)
            ),
            pl.BlockSpec((1, 2, m1, m2), lambda l, b: (l, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_b, 1, m1, m2), lambda l, b: (b, l, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, L, m1, m2), jnp.uint32),
        interpret=interpret,
    )(
        jnp.asarray(plan.p_arr),
        xb,
        jnp.asarray(sa),
        jnp.asarray(sb),
        jnp.asarray(tw),
    )
    out = out[:B].reshape(*bshape, L, n) if bshape else out[0].reshape(L, n)
    return out


# Measured on v5e (benchmarks/bench_ntt_kernel.py sweep): fuse in {1,2,4,7}
# all land within ~5% -- the kernel is VPU-compute-bound, so collapsing
# stage passes does not move it. Default to 1 (the round-2-proven layout);
# the fused executor remains available for experiments.
DEFAULT_FUSE = 1


def ntt_pallas(x, plan: SplitNTTPlan, tile_b: int = DEFAULT_TILE_B,
               interpret: bool | None = None, fuse: int = DEFAULT_FUSE,
               relabeled: bool = False):
    """Fused forward NTT. x: (..., L, n) uint32 -> bit-reversed NTT domain.

    relabeled=True returns the RELABELED evaluation domain (exit transpose
    + ungroup skipped; see _fwd_stages_v2): valid only inside closed
    fwd -> pointwise -> inv sandwiches whose inverse also passes
    relabeled=True."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _pallas_call(x, plan, False, tile_b, interpret, fuse, relabeled)


def intt_pallas(x, plan: SplitNTTPlan, tile_b: int = DEFAULT_TILE_B,
                interpret: bool | None = None, fuse: int = DEFAULT_FUSE,
                relabeled: bool = False):
    """Fused inverse NTT. x: (..., L, n) bit-reversed -> natural order.
    relabeled=True accepts relabeled-domain input (see ntt_pallas)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _pallas_call(x, plan, True, tile_b, interpret, fuse, relabeled)
