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


def sharded_pie_step(ctx: BGVContext, mesh: Mesh):
    """Returns (jitted_fn, shardings): the full online PIE step jitted over
    the mesh with input/output shardings applied."""
    sh = pie_shardings(mesh)

    def step(idx, minus, table, mask, rlk_b, rlk_a):
        return batched_pie_forward(
            ctx, RelinKey(b_mont=rlk_b, a_mont=rlk_a), idx, minus, table, mask
        ).data

    fn = jax.jit(
        step,
        in_shardings=(
            sh["idx"], sh["minus"], sh["table"], sh["mask"], sh["rlk"], sh["rlk"]
        ),
        out_shardings=sh["out"],
    )
    return fn, sh
