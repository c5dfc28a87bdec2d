"""Worker process for tests/test_multihost.py: joins a 2-process JAX
distributed runtime (4 virtual CPU devices each), runs the globally-sharded
batched-PIE online step over the 8-device DCN-spanning mesh, and verifies
bit-exactness against the locally-computed unsharded result.

Usage: python multihost_worker.py <coordinator> <num_procs> <proc_id>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from nested_hashing_psi_tpu.parallel import multihost


def main():
    coordinator, num_procs, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    multihost.init_distributed(coordinator, num_procs, proc_id)
    assert jax.process_count() == num_procs, jax.process_count()
    assert len(jax.devices()) == 4 * num_procs

    # deterministic small PIE inputs: every process builds identical host data
    from __graft_entry__ import _build_small_pie
    from nested_hashing_psi_tpu.fhe.bgv import Ciphertext
    from nested_hashing_psi_tpu.parallel.mesh import pie_shardings, sharded_pie_step

    ctx, sk, rlk, pie, ops, idx_ct, minus_ct = _build_small_pie(
        ring=256, limbs=8, H=2, P=8, D=8, simple=32
    )

    # ground truth: unsharded single-device run (identical on every process)
    truth = np.asarray(pie.run(idx_ct, minus_ct).data)

    mesh = multihost.global_mesh(dp=4, tp=2)  # dp spans the two processes
    fn, sh = sharded_pie_step(ctx, mesh)
    args = dict(
        idx=np.asarray(idx_ct.data),
        minus=np.asarray(minus_ct.data),
        table=np.asarray(pie.table_pt),
        mask=np.asarray(pie.mask_pt),
    )
    specs = pie_shardings(mesh)
    g = lambda k, a: multihost.host_to_global(mesh, specs[k].spec, a)
    out = fn(
        g("idx", args["idx"]),
        g("minus", args["minus"]),
        g("table", args["table"]),
        g("mask", args["mask"]),
        g("rlk", np.asarray(rlk.b_mont)),
        g("rlk", np.asarray(rlk.a_mont)),
    )
    got = multihost.global_to_host(out)
    assert np.array_equal(got, truth), "multi-host sharded PIE differs"

    # decrypt-level check on process 0
    if proc_id == 0:
        slots, _ = ctx.decrypt(Ciphertext(got), sk, length=pie.batch_slots)
        inter = ops.extract_intersection(np.asarray(slots))
        vals = sorted(int(lo) for lo, hi in inter)
        assert vals == [105, 131], vals
    print(f"MULTIHOST_OK proc={proc_id}", flush=True)


if __name__ == "__main__":
    main()
