"""Benchmark sweep driver: replays Performance-Evaluation/Parameters1.txt rows.

Equivalent of the reference's runEval1.py (launches ServerMain+ClientMain
pairs per config row); here each row runs in-process over a loopback channel
by default (use --tcp for the two-process form) and CSV measurements land in
--outdir with the reference's file-naming scheme.

Usage:
  python benchmarks/run_eval.py --params Parameters1.txt --rows 0:6 \
      --bitSize 16 --runs 3 --fhe --batched
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
from nested_hashing_psi_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()  # env var alone is dead under sitecustomize

REFERENCE_PARAMS = "/root/reference/Performance-Evaluation/Parameters1.txt"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", default=REFERENCE_PARAMS)
    ap.add_argument("--rows", default="0:6", help="row slice start:stop")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--bitSize", type=int, default=16)
    ap.add_argument(
        "--protocol",
        choices=["batched", "simple", "elgamal", "precomp"],
        default="batched",
        help="batched/simple FHE or simple/precomp ElGamal "
        "(the reference's -F/--batched/--precomp dispatch)",
    )
    ap.add_argument("--bgv", action="store_true")
    ap.add_argument("--curve", default="P-256")
    ap.add_argument("--outdir", default="eval_results")
    ap.add_argument("--nThreads", type=int, default=1)
    args = ap.parse_args()

    from nested_hashing_psi_tpu.config import HashTableParams, PSIParams
    from nested_hashing_psi_tpu.protocol.runner import run_in_process

    os.makedirs(args.outdir, exist_ok=True)
    start, stop = (int(v) for v in args.rows.split(":"))

    with open(args.params) as f:
        rows = list(csv.DictReader(f, delimiter="\t"))[start:stop]

    for row in rows:
        psi = PSIParams(
            server_set_size=int(row["serverSetSize"]),
            client_set_size=int(row["clientSetSize"]),
            intersection_set_size=int(row["intersectionSetSize"]),
            bit_size=args.bitSize,
            fhe=args.protocol in ("batched", "simple"),
            batched=args.protocol == "batched",
            precomp=args.protocol == "precomp",
            bgv=args.bgv,
            curve_name=args.curve,
            number_of_threads=args.nThreads,
            export_performance=True,
        )
        ht = HashTableParams(
            each_simple_table_size=int(row["eachSimpleTableSize"]),
            each_cuckoo_table_size=int(row["eachCuckooTableSize"]),
            n_simple_hash_functions=int(row["nSimpleHF"]),
            n_cuckoo_hash_functions=2,
            max_items_per_position=int(row["maxPP"]),
        )
        if args.protocol == "batched" and ht.batch_slots > psi.ring_dim:
            print(f"skip row (batch {ht.batch_slots} > ring {psi.ring_dim}): {row}")
            continue
        print(f"run {dict(row)} x{args.runs}", flush=True)
        for _ in range(args.runs):
            client, server, ok = run_in_process(psi, ht, export_dir=args.outdir)
            if not psi.export_performance:
                client.export_path = type(client.export_path)(
                    os.path.join(args.outdir, client.export_path.name)
                )
                client.export_measurements()
            status = "OK" if ok else "MISMATCH"
            m = client.measurements
            print(
                f"  [{status}] setup {m['Setup'].duration_us/1e6:.2f}s  "
                f"offline {m['Offline'].duration_us/1e6:.2f}s  "
                f"online {m['Online'].duration_us/1e6:.2f}s  "
                f"(server online compute {server.online_computation_us/1e3:.1f}ms)",
                flush=True,
            )


if __name__ == "__main__":
    main()
