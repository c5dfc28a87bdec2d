"""Multi-chip sharding of the batched PIE online step.

The reference's only parallelism is OpenMP/boost::thread pools on one node
(SURVEY.md section 2.3); here scale-out is a jax.sharding Mesh:

 - dp axis: server bin depths (maxPP) -- embarrassingly parallel rows of the
   result, the analogue of the reference's per-thread PIE collections.
 - tp axis: RNS limbs -- limb-wise ops are local; relinearization's digit
   decomposition mixes limbs, and GSPMD inserts the all-gather over ICI.

The ring/slot (SP) axis joins in the distributed-NTT milestone.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nested_hashing_psi_tpu.fhe.bgv import BGVContext, RelinKey
from nested_hashing_psi_tpu.pie.batched_fhe import batched_pie_forward


def make_mesh(n_devices: int, tp: int | None = None) -> Mesh:
    devs = jax.devices()[:n_devices]
    if len(devs) < n_devices:
        raise ValueError(f"need {n_devices} devices, have {len(devs)}")
    if tp is None:
        tp = 2 if n_devices % 2 == 0 else 1
    dp = n_devices // tp
    return Mesh(np.array(devs).reshape(dp, tp), ("dp", "tp"))


def pie_shardings(mesh: Mesh) -> dict[str, NamedSharding]:
    """PartitionSpecs for batched_pie_forward operands/results.

    Tensor layouts: idx (H,P,2,L,N), minus (2,L,N), table (H,D,P,L,N),
    mask (D,L,N), rlk (L_dig,L,N), out (D,2,L,N).
    """
    ns = lambda *spec: NamedSharding(mesh, P(*spec))
    return dict(
        idx=ns(None, None, None, "tp", None),
        minus=ns(None, "tp", None),
        table=ns(None, "dp", None, "tp", None),
        mask=ns("dp", "tp", None),
        rlk=ns(None, "tp", None),
        out=ns("dp", None, "tp", None),
    )


def sharded_simple_pie_step(pie, mesh: Mesh):
    """SimpleFHE PIE online step sharded over positions (outer cells).

    This is the bucket-affinity (EP-analogue) axis from SURVEY section 2.3:
    each device owns the inner tables of its outer-cell slice and processes
    the matching client index ciphertexts locally; no collectives needed
    (results concatenate by construction). Uses the full ('dp','tp')-flattened
    mesh as one axis.
    """
    devices = mesh.devices.reshape(-1)
    flat = Mesh(devices, ("pies",))
    ns = lambda *spec: NamedSharding(flat, P(*spec))
    sh = dict(
        idx=ns("pies", None, None, None, None),     # (nPies, H, 2, L, N)
        table=ns("pies", None, None, None, None),   # (nPies, H, B, L, N)
        mask=ns("pies", None, None, None),          # (nPies, H, L, N)
        out=ns("pies", None, None, None, None),
    )

    import jax.numpy as jnp

    from nested_hashing_psi_tpu.fhe.bgv import Ciphertext

    table = jax.device_put(pie.table_pt, sh["table"])
    mask = jax.device_put(pie.mask_pt, sh["mask"])
    hf_perm = jax.device_put(jnp.asarray(pie.hf_perm), ns("pies", None))

    def step(idx_data):
        ctx = pie.ctx
        from nested_hashing_psi_tpu.ops.modmath import modsum, mont_mul

        prod = mont_mul(
            idx_data[:, :, None], table[:, :, :, None], ctx.p, ctx.pinv
        )
        summed = ctx.eval_sum_all_slots(Ciphertext(prod), pie.gks).data
        sel = mont_mul(summed, jnp.asarray(pie.sel_pt)[:, None], ctx.p, ctx.pinv)
        merged = modsum(sel, ctx.p, axis=2)
        masked = mont_mul(merged, mask[:, :, None], ctx.p, ctx.pinv)
        return jnp.take_along_axis(masked, hf_perm[:, :, None, None, None], axis=1)

    fn = jax.jit(step, in_shardings=(sh["idx"],), out_shardings=sh["out"])
    return fn, sh


def sp_sharded_pie_step(
    ctx: BGVContext, mesh: Mesh, axis: str = "sp", pos_chunk: int | None = None
):
    """Batched-PIE online step with the ring/slot (SP) axis sharded.

    The full SURVEY section 2.3 SP integration: every tensor keeps its
    trailing ring axis N split into contiguous blocks across ``axis``. All
    pointwise ciphertext algebra (ct x pt products, position sums, adds,
    the cross-hash tensor product, masking) is chip-local; the only
    cross-chip traffic is inside the NTT/iNTT transforms, which run as the
    ring-exchange distributed butterfly (dist_ntt.ring_ntt_local_fns):
    log2(D) block ppermutes per transform over ICI. For BGV contexts that
    means relinearization only; for BFV contexts the textbook HPS ct x ct
    (fhe.bfv._hps_mul_impl) runs here too -- its base conversions
    (extend/scale-round/exact Shenoy-Kumaresan) are pointwise per ring
    coefficient and therefore chip-local, with the q- and aux-base
    transforms distributed. Bit-exact vs the unsharded pipeline either way.

    Returns (jitted_fn, shardings). fn(idx, minus, table, mask, rlk_b,
    rlk_a) -> result data (D_depth, 2, L, N); wrap in Ciphertext with
    ``sp_result_form_scale(ctx, H)`` for decryption bookkeeping.
    """
    from jax import shard_map

    from nested_hashing_psi_tpu.fhe.bgv import tensor_product
    from nested_hashing_psi_tpu.ops.modmath import (
        add_mod,
        modsum,
        mont_mul,
        sub_mod,
        to_mont,
    )
    from nested_hashing_psi_tpu.parallel.dist_ntt import ring_ntt_local_fns

    D = mesh.shape[axis]
    fwd_l, inv_l = ring_ntt_local_fns(ctx.plan, axis, D)
    p, pinv, r2 = ctx.p, ctx.pinv, ctx.r2
    q_half, qk_mod_qj = ctx.q_half, ctx.qk_mod_qj
    is_bfv = ctx.default_form == "bfv"
    if is_bfv:
        mc = ctx.mulconv  # numpy-stored constants; build outside the trace
        fwd_aux, inv_aux = ring_ntt_local_fns(mc.plan_aux, axis, D)
        p_aux = jnp.asarray(mc.plan_aux.p_arr)
        pinv_aux = jnp.asarray(mc.plan_aux.pinv_arr)
        r2_aux = jnp.asarray(mc.plan_aux.r2_arr)

    def relin_local(d0, d1, d2, rb, ra):
        coeffs = inv_l(d2)                        # distributed iNTT
        dk = coeffs[..., :, None, :]
        big = dk > q_half[:, None, :]
        r = dk % p[None]
        digits = jnp.where(big, sub_mod(r, qk_mod_qj, p[None]), r)
        dig = fwd_l(digits)                       # distributed NTT
        ks0 = modsum(mont_mul(dig, rb, p, pinv), p, axis=-3)
        ks1 = modsum(mont_mul(dig, ra, p, pinv), p, axis=-3)
        return add_mod(d0, ks0, p), add_mod(d1, ks1, p)

    def hps_mul_local(a, b):
        """Distributed HPS ct x ct (mirrors fhe.bfv._hps_mul_impl): the base
        conversions are pointwise per ring coefficient (chip-local); the
        q- and aux-base transforms run ring-exchange distributed."""
        ea = fwd_aux(mc.extend_q_to_aux(inv_l(a)))
        eb = fwd_aux(mc.extend_q_to_aux(inv_l(b)))
        d_q = tensor_product(a, b, p, pinv, r2)
        d_aux = tensor_product(ea, eb, p_aux, pinv_aux, r2_aux)
        y = mc.scale_round(inv_l(d_q), inv_aux(d_aux))
        return fwd_l(mc.exact_to_q(y))            # (..., 3, L, Nloc)

    def step_local(idx, minus, table, mask, rb, ra):
        from nested_hashing_psi_tpu.pie.batched_fhe import position_sum

        H = idx.shape[0]
        ip = position_sum(
            ctx, idx, table, pos_chunk=pos_chunk
        )                                         # (H, D_depth, 2, L, Nloc)
        # mask folding (pie.batched_fhe.combine_ip): the masks live in hash
        # 0's table plaintexts; hash 0 takes the per-depth MASKED minus
        # (pointwise, chip-local), the others plain minus; no final mask.
        minus_masked = mont_mul(minus[None], mask[:, None], p, pinv)
        acc = add_mod(ip[0], minus_masked, p)
        for h in range(1, H):
            op = add_mod(ip[h], minus[None], p)
            if is_bfv:
                d = hps_mul_local(acc, op)
                d0, d1, d2 = d[..., 0, :, :], d[..., 1, :, :], d[..., 2, :, :]
            else:
                a0, a1 = acc[..., 0, :, :], acc[..., 1, :, :]
                b0 = to_mont(op[..., 0, :, :], p, pinv, r2)
                b1 = to_mont(op[..., 1, :, :], p, pinv, r2)
                d0 = mont_mul(a0, b0, p, pinv)
                d1 = add_mod(
                    mont_mul(a0, b1, p, pinv), mont_mul(a1, b0, p, pinv), p
                )
                d2 = mont_mul(a1, b1, p, pinv)
            k0, k1 = relin_local(d0, d1, d2, rb, ra)
            acc = jnp.stack([k0, k1], axis=-3)
        return acc

    s = lambda nd: P(*(None,) * (nd - 1), axis)  # trailing (N) axis sharded
    ns = lambda nd: NamedSharding(mesh, s(nd))
    sh = dict(idx=ns(5), minus=ns(3), table=ns(5), mask=ns(3), rlk=ns(3), out=ns(4))
    fn = jax.jit(
        shard_map(
            step_local,
            mesh=mesh,
            in_specs=(s(5), s(3), s(5), s(3), s(3), s(3)),
            out_specs=s(4),
        )
    )
    return fn, sh


def pp_pipelined_pie_step(
    ctx: BGVContext,
    mesh: Mesh,
    axis: str = "pp",
    leveled: bool = False,
    n_hash: int | None = None,
):
    """Cross-chip PIPELINE-parallel batched-PIE online step (SURVEY 2.3 PP).

    The SURVEY defines PP as staging the NTT -> pointwise mult -> iNTT ->
    accumulate pipeline ACROSS CHIPS (the round-2 implementation only
    overlapped client->server chunk streaming on one chip). Here the k chips
    of the ``axis`` ring each own a 1/k position slice of the packed table
    and of the index ciphertexts; the online step runs as a PIPELINED RING
    REDUCE-SCATTER over bin depths:

      step s: chip e computes the ct x pt position-sum of its local
      positions for depth chunk (e - s - 1 mod k) WHILE the partial
      accumulator for that chunk ppermutes in from the left neighbor; the
      two meet in an add. After k steps chip e holds the complete position
      sum for depth chunk e -- every hop's collective-permute is overlapped
      with the next chunk's ct x pt compute (the 'ppermute handoff of the
      accumulator while the next chunk's ct x pt runs').

    The finish (cross-hash ct x ct + relin + mask) is depth-local by
    construction, so it runs without further communication on each chip's
    depth chunk; the output is depth-sharded. Bit-exact vs the single-chip
    forward (modular sums reassociate exactly).

    Requires P % k == 0 and D % k == 0. Returns (jitted_fn, shardings);
    result form/scale match batched_pie_forward's.
    """
    from jax import shard_map

    from nested_hashing_psi_tpu.ops.modmath import add_mod
    from nested_hashing_psi_tpu.pie.batched_fhe import combine_ip, position_sum

    k = mesh.shape[axis]
    ring = [(i, (i + 1) % k) for i in range(k)]

    def step_local(idx, minus, table, mask, rb, ra):
        # idx (H, P/k, 2, L, N); table (H, D, P/k, L, N); mask (D/k, L, N)
        D = table.shape[1]
        assert D % k == 0, (D, k)
        Dl = D // k
        e = jax.lax.axis_index(axis)
        acc = None
        for s in range(k):
            g = (e - s - 1) % k
            tbl_g = jax.lax.dynamic_slice_in_dim(table, g * Dl, Dl, axis=1)
            part = position_sum(ctx, idx, tbl_g)
            if acc is None:
                acc = part
            else:
                moved = jax.lax.ppermute(acc, axis, ring)
                acc = add_mod(moved, part, ctx.p)
        ct = combine_ip(
            ctx,
            RelinKey(b_mont=rb, a_mont=ra),
            acc,
            minus,
            mask,
            leveled=leveled,
        )
        return ct.data

    if leveled:
        # build the drop-limb chain eagerly (trace constants); combine_ip
        # only ever descends n_hash - 1 levels, so bound the chain there
        # when the caller says how many hash functions it runs
        c = ctx
        lo = 2 if n_hash is None else max(2, ctx.L - (n_hash - 1))
        while c.L > lo:
            c = c.drop_limb_context()

    s_pos5 = P(None, axis, None, None, None)   # idx: positions sharded
    s_tbl = P(None, None, axis, None, None)    # table: positions sharded
    s_depth3 = P(axis, None, None)             # mask / per-depth outputs
    s_rep3 = P(None, None, None)
    s_out = P(axis, None, None, None)          # result: depths sharded
    ns = lambda spec: NamedSharding(mesh, spec)
    sh = dict(
        idx=ns(s_pos5), minus=ns(s_rep3), table=ns(s_tbl),
        mask=ns(s_depth3), rlk=ns(s_rep3), out=ns(s_out),
    )
    fn = jax.jit(
        shard_map(
            step_local,
            mesh=mesh,
            in_specs=(s_pos5, s_rep3, s_tbl, s_depth3, s_rep3, s_rep3),
            out_specs=s_out,
        )
    )
    return fn, sh


def sp_result_form_scale(ctx: BGVContext, n_hash: int) -> tuple[str, int]:
    """(form, scale) of sp_sharded_pie_step's result ciphertext, matching
    batched_pie_forward's host-side tracking (BFV operands multiply via HPS,
    which preserves form and the unit message scale)."""
    return ctx.default_form, 1


def sharded_pie_step(
    ctx: BGVContext,
    mesh: Mesh,
    leveled: bool = False,
    n_hash: int | None = None,
    pos_chunk: int | None = None,
):
    """Returns (jitted_fn, shardings): the full online PIE step jitted over
    the mesh with input/output shardings applied.

    ``leveled`` must match the (BGV) PIE's own setting so the mesh path runs
    the same circuit the limb budget was provisioned for (a flat run of a
    leveled-budgeted config would exceed its noise budget). When leveled,
    pass ``n_hash`` so the drop-limb context chain is built eagerly (its
    constants must exist before tracing)."""
    sh = pie_shardings(mesh)
    if leveled:
        assert n_hash is not None, (
            "leveled sharded_pie_step needs n_hash: the drop-limb context "
            "chain must be built eagerly before tracing"
        )
        c = ctx
        for _ in range(n_hash - 1):
            c = c.drop_limb_context()

    def step(idx, minus, table, mask, rlk_b, rlk_a):
        return batched_pie_forward(
            ctx, RelinKey(b_mont=rlk_b, a_mont=rlk_a), idx, minus, table, mask,
            leveled=leveled, pos_chunk=pos_chunk,
        ).data

    fn = jax.jit(
        step,
        in_shardings=(
            sh["idx"], sh["minus"], sh["table"], sh["mask"], sh["rlk"], sh["rlk"]
        ),
        out_shardings=sh["out"],
    )
    return fn, sh
