"""Scaling-efficiency report: ciphertext-ops/s at 1 chip / 1 host / N hosts.

The BASELINE.json north star asks for near-linear scaling of the batched-PIE
online step across the mesh. This harness measures the jitted step at
(a) one device, (b) the full single-host mesh (dp x tp), and -- when run
under `jax.distributed` (pass --coordinator/--num-processes/--process-id on
every host) -- (c) the global multi-host mesh, and prints a JSON table with
throughput and parallel efficiency. "ciphertext-op" = one depth-row of the
PIE online pipeline (the unit the reference executes as maxPP sequential
EvalMult chains, BatchedFHEHIPPIE.cpp:88-128).

CPU example (harness check, 8 virtual devices):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python benchmarks/scaling_report.py --ring 256 --depths 8

TPU example (one host):
    python benchmarks/scaling_report.py --ring 16384 --limbs 8 --depths 16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(y):
    """True execution barrier: one device->host element fetch. Through this
    sandbox's async TPU relay, block_until_ready resolves when an op is
    ENQUEUED remotely, not when it has executed (bench.py, BENCH_NOTES.md);
    timing loops gated on it measure dispatch, 30-600x over the roofline."""
    import jax
    import numpy as np

    return int(np.asarray(jax.device_get(y.ravel()[0])))


def _bench(fn, args, depths: int, iters: int | None = None) -> float:
    """Chained timing: every iteration's first input is data-dependent on
    the previous output (optimization_barrier token), so each step is on the
    critical path and the relay cannot elide repeats; ONE host fetch ends
    the timed region."""
    import jax

    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    out = fn(*args)
    _sync(out)
    per = time.perf_counter() - t0
    it = iters or max(3, int(1.5 / max(per, 1e-5)))
    if jax.default_backend() == "cpu":
        # On CPU there is no async relay to fool: device_get IS a real
        # barrier, and queueing unsynced iterations oversubscribes the
        # virtual-device collectives on few host cores (rendezvous
        # starvation aborts). Sync every iteration instead of chaining.
        t0 = time.perf_counter()
        for _ in range(it):
            _sync(fn(*args))
        return depths * it / (time.perf_counter() - t0)
    mix = jax.jit(
        lambda first, o: jax.lax.optimization_barrier((first, o.ravel()[0]))[0]
    )
    t0 = time.perf_counter()
    for _ in range(it):
        out = fn(mix(args[0], out), *args[1:])
    _sync(out)
    el = time.perf_counter() - t0
    return depths * it / el


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ring", type=int, default=256)
    ap.add_argument("--limbs", type=int, default=8)
    ap.add_argument("--depths", type=int, default=8)
    ap.add_argument("--positions", type=int, default=8)
    ap.add_argument("--hashes", type=int, default=2)
    ap.add_argument("--tp", type=int, default=2)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument(
        "--cpu",
        action="store_true",
        help="force the virtual CPU mesh (the sandbox's sitecustomize "
        "registers the TPU plugin before JAX_PLATFORMS is read, so the "
        "env var alone does not stick -- set jax_platforms explicitly)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.coordinator:
        from nested_hashing_psi_tpu.parallel import multihost

        multihost.init_distributed(
            args.coordinator, args.num_processes, args.process_id
        )

    import numpy as np

    from __graft_entry__ import _build_small_pie
    from nested_hashing_psi_tpu.parallel.mesh import pie_shardings, sharded_pie_step
    from nested_hashing_psi_tpu.parallel.multihost import global_mesh, host_to_global

    ctx, sk, rlk, pie, ops, idx_ct, minus_ct = _build_small_pie(
        ring=args.ring,
        limbs=args.limbs,
        H=args.hashes,
        P=args.positions,
        D=args.depths,
        simple=min(32, args.ring // 4),
    )
    host_args = dict(
        idx=np.asarray(idx_ct.data),
        minus=np.asarray(minus_ct.data),
        table=np.asarray(pie.table_pt),
        mask=np.asarray(pie.mask_pt),
        rlk_b=np.asarray(rlk.b_mont),
        rlk_a=np.asarray(rlk.a_mont),
    )

    report = {
        "metric": "pie_depth_rows_per_sec",
        "config": {
            "ring": args.ring,
            "limbs": args.limbs,
            "depths": args.depths,
            "positions": args.positions,
            "hashes": args.hashes,
        },
        "backend": jax.default_backend(),
        "rows": [],
    }

    def measure(n_dev: int, tp: int, label: str):
        if n_dev < len(jax.devices()):
            from jax.sharding import Mesh

            devs = np.array(jax.devices()[:n_dev]).reshape(n_dev // tp, tp)
            mesh = Mesh(devs, ("dp", "tp"))
        else:
            mesh = global_mesh(dp=n_dev // tp, tp=tp)
        fn, _ = sharded_pie_step(ctx, mesh)
        specs = pie_shardings(mesh)
        g = lambda k, a: host_to_global(mesh, specs[k].spec, a)
        rate = _bench(
            fn,
            (
                g("idx", host_args["idx"]),
                g("minus", host_args["minus"]),
                g("table", host_args["table"]),
                g("mask", host_args["mask"]),
                g("rlk", host_args["rlk_b"]),
                g("rlk", host_args["rlk_a"]),
            ),
            args.depths,
            args.iters,
        )
        report["rows"].append({"devices": n_dev, "label": label, "rate": round(rate, 2)})

    n_local = len(jax.local_devices())
    n_total = len(jax.devices())
    measure(1, 1, "1 device")
    if n_local > 1:
        measure(n_local if args.num_processes == 1 else n_local, args.tp, "1 host")
    if args.num_processes > 1:
        measure(n_total, args.tp, f"{jax.process_count()} hosts")

    base = report["rows"][0]["rate"]
    for row in report["rows"]:
        row["efficiency"] = round(row["rate"] / (base * row["devices"]), 3)
    if args.process_id == 0:
        print(json.dumps(report))


if __name__ == "__main__":
    main()
