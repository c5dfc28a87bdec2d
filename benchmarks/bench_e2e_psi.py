"""End-to-end PSI wall-clock: the BASELINE.json north-star configuration
(2^24-item server set vs 2^12-item client set, batched FHE protocol,
bit-exact intersection), run in-process with the server pipeline on TPU.

Geometry: client cuckoo 2 simple tables x 4505 (slack 2.2, batch 9010 slots
<= ring 16384); server nested table with inner 2 x (depth 50 x size 50)
(inner slack ~1.2 over ~4100 expected items/cell).

Usage: python benchmarks/bench_e2e_psi.py [--server-log2 24] [--client-log2 12]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
from nested_hashing_psi_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()  # env var alone is dead under sitecustomize


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--server-log2", type=int, default=24)
    ap.add_argument("--client-log2", type=int, default=12)
    ap.add_argument("--bitSize", type=int, default=32)
    ap.add_argument("--bgv", action="store_true")
    ap.add_argument("--streamChunks", type=int, default=1)
    ap.add_argument(
        "--checkpoint",
        default=None,
        help="path: persist the server's offline artifact after the run, "
        "resume a fresh PIE from the file alone and re-verify one online "
        "query bit-exactly (VERDICT r2 task #1)",
    )
    ap.add_argument(
        "--simpleSize", type=int, default=0,
        help="override eachSimpleTableSize (use exact Parameters1.txt rows)",
    )
    ap.add_argument(
        "--inner", type=int, default=0,
        help="override maxPP = eachCuckooTableSize",
    )
    ap.add_argument("--intersection", type=int, default=0)
    args = ap.parse_args()

    from nested_hashing_psi_tpu.config import HashTableParams, PSIParams
    from nested_hashing_psi_tpu.protocol.runner import run_in_process
    from nested_hashing_psi_tpu.utils.profiling import batched_pie_op_counts

    server_n = 1 << args.server_log2
    client_n = 1 << args.client_log2
    inter_n = args.intersection or client_n // 2

    simple_size = args.simpleSize or int(client_n * 2.2 / 2)
    if args.inner:
        inner = args.inner
    else:
        per_cell = 2 * server_n / (2 * simple_size)  # placements per cell
        inner = 1
        while 2 * inner * inner < per_cell * 1.2:
            inner += 1

    psi = PSIParams(
        server_set_size=server_n,
        client_set_size=client_n,
        intersection_set_size=inter_n,
        bit_size=args.bitSize,
        fhe=True,
        batched=True,
        bgv=args.bgv,
        stream_chunks=args.streamChunks,
        verbose=True,
    )
    ht = HashTableParams(
        each_simple_table_size=simple_size,
        each_cuckoo_table_size=inner,
        n_simple_hash_functions=2,
        n_cuckoo_hash_functions=2,
        max_items_per_position=inner,
    )
    print(
        f"server 2^{args.server_log2}, client 2^{args.client_log2}, "
        f"simpleSize={simple_size} (batch {ht.batch_slots}), inner {inner}x{inner}"
    )
    t0 = time.time()
    client, server, ok = run_in_process(psi, ht)
    total = time.time() - t0
    m = client.measurements
    print(f"RESULT: {'Set matches!' if ok else 'MISMATCH'}")
    print(
        f"total {total:.1f}s | setup {m['Setup'].duration_us/1e6:.1f}s | "
        f"offline {m['Offline'].duration_us/1e6:.1f}s | "
        f"online {m['Online'].duration_us/1e6:.1f}s"
    )
    print(
        f"server offline compute {server.offline_computation_us/1e6:.1f}s | "
        f"server ONLINE compute {server.online_computation_us/1e3:.1f}ms"
    )
    print(
        f"client noise margin: {client.noise_bits:.0f} bits used of "
        f"{client.ctx.params.q.bit_length()}"
    )
    up = m["Online"].bytes_out / 1e6
    down = m["Online"].bytes_in / 1e6
    print(f"online wire: {up:.1f} MB up, {down:.1f} MB down")
    counts = batched_pie_op_counts(2, inner, inner, client.ctx.L, client.ctx.n)
    print(f"op counts: {counts}")

    if args.checkpoint:
        import numpy as np

        from nested_hashing_psi_tpu.utils.checkpoint import (
            load_batched_pie,
            save_batched_pie,
        )

        t0 = time.time()
        save_batched_pie(args.checkpoint, server.pie)
        save_s = time.time() - t0
        size_mb = os.path.getsize(args.checkpoint) / 1e6
        t0 = time.time()
        resumed = load_batched_pie(args.checkpoint)  # file only: ctx+rlk inside
        load_s = time.time() - t0
        t0 = time.time()
        r1 = np.asarray(server.pie.run(client.idx_ct, client.minus_ct).data)
        r2 = np.asarray(resumed.run(client.idx_ct, client.minus_ct).data)
        q_s = time.time() - t0
        match = np.array_equal(r1, r2)
        print(
            f"checkpoint: save {save_s:.1f}s ({size_mb:.0f} MB), "
            f"self-contained load {load_s:.1f}s, resumed online query "
            f"{'bit-exact' if match else 'MISMATCH'} ({q_s:.1f}s for both runs)"
        )
        assert match


if __name__ == "__main__":
    main()
