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

if os.environ.get("JAX_PLATFORMS"):  # sitecustomize pre-registers the TPU
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


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
    ap.add_argument(
        "--perf", action="store_true",
        help="export reference-schema measurement CSVs to eval_results/",
    )
    ap.add_argument(
        "--buildOnly", action="store_true",
        help="with --checkpoint: run only the Setup+Offline phases of the "
        "protocol pair (table build + encode + client query encryption), "
        "save the v3 artifact + sidecar and exit WITHOUT the online phase "
        "-- the fresh-process --resume then performs the online query and "
        "verification. Avoids paying the large online-program compile "
        "twice at flagship scale.",
    )
    ap.add_argument(
        "--saveOnly", action="store_true",
        help="with --checkpoint: write the artifact + sidecar and skip the "
        "same-process reload/re-verify (a fresh-process --resume is the "
        "stronger check and avoids holding two table-size PIEs in RAM)",
    )
    ap.add_argument(
        "--resume", default=None,
        help="FRESH-PROCESS resume: skip build entirely, load the PIE from "
        "this checkpoint plus its .client.npz sidecar (written by "
        "--checkpoint), answer one online query and verify the extracted "
        "intersection against the seeded generator ground truth",
    )
    args = ap.parse_args()

    if args.resume:
        return resume_main(args)

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
        export_performance=args.perf,
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
    if args.buildOnly:
        return build_only_main(args, psi, ht)

    t0 = time.time()
    client, server, ok = run_in_process(psi, ht, export_dir="eval_results")
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
    if client.noise_bits is not None:
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
        # sidecar for FRESH-PROCESS resume verification (--resume): the
        # client's query cts, secret key and cuckoo table (the PIE artifact
        # itself is client-key-free except for the relin key it embeds)
        np.savez_compressed(
            args.checkpoint + ".client.npz",
            idx=np.asarray(client.idx_ct.data),
            minus=np.asarray(client.minus_ct.data),
            s_mont=np.asarray(client.sk.s_mont),
            s_ntt=np.asarray(client.sk.s_ntt),
            client_table=np.asarray(client.client_table.table),
            expected=np.asarray(client.data.get_intersection_set()),
        )
        if args.saveOnly:
            print(
                f"checkpoint: save {save_s:.1f}s ({size_mb:.0f} MB), "
                f"same-process re-verify skipped (--saveOnly; run --resume "
                f"in a fresh process)"
            )
            return
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


def build_only_main(args, psi, ht):
    """Setup+Offline only: build the server artifact + client query, persist
    the v3 checkpoint + sidecar, exit. The online query (and its large
    program compile) runs once, in the fresh-process --resume."""
    import threading

    import numpy as np

    from nested_hashing_psi_tpu.data.input import RandomDataInput
    from nested_hashing_psi_tpu.protocol.channel import LoopbackChannel
    from nested_hashing_psi_tpu.protocol.runner import make_protocol_pair
    from nested_hashing_psi_tpu.utils.checkpoint import save_batched_pie

    assert args.checkpoint, "--buildOnly requires --checkpoint"
    client_cls, server_cls = make_protocol_pair("BatchedFHE")

    def factory():
        return RandomDataInput(
            psi.server_set_size,
            psi.client_set_size,
            psi.intersection_set_size,
            psi.item_seed,
            psi.bit_size,
        )

    ch_client, ch_server = LoopbackChannel.pair(pass_device_arrays=True)
    client = client_cls(factory(), psi, ht, ch_client)
    server = server_cls(factory(), psi, ht, ch_server)
    errors: list = []

    def server_run():
        try:
            server.run_setup_phase()
            server._signal_phase_over()
            server.run_offline_phase()
            server._signal_phase_over()
        except BaseException as e:
            errors.append(e)
            ch_server.poison()

    th = threading.Thread(target=server_run, daemon=True)
    t0 = time.time()
    th.start()
    client.run_setup_phase()
    client._read_phase_over()
    print(f"setup done {time.time() - t0:.1f}s", flush=True)
    t1 = time.time()
    client.run_offline_phase()
    client._read_phase_over()
    th.join()
    if errors:
        raise errors[0]
    print(f"offline done {time.time() - t1:.1f}s", flush=True)
    t1 = time.time()
    save_batched_pie(args.checkpoint, server.pie)
    np.savez_compressed(
        args.checkpoint + ".client.npz",
        idx=np.asarray(client.idx_ct.data),
        minus=np.asarray(client.minus_ct.data),
        s_mont=np.asarray(client.sk.s_mont),
        s_ntt=np.asarray(client.sk.s_ntt),
        client_table=np.asarray(client.client_table.table),
        expected=np.asarray(client.data.get_intersection_set()),
    )
    size_gb = os.path.getsize(args.checkpoint) / 1e9
    print(
        f"checkpoint saved {time.time() - t1:.1f}s ({size_gb:.1f} GB v3 + "
        f"client sidecar) -- verify with --resume in a fresh process",
        flush=True,
    )
    return 0


def resume_main(args):
    """Fresh-process resume (VERDICT r4 item 3): nothing from the build
    process except the checkpoint + sidecar files."""
    import types

    import numpy as np
    import jax.numpy as jnp

    from nested_hashing_psi_tpu.fhe.bgv import Ciphertext, SecretKey
    from nested_hashing_psi_tpu.pie.batched_fhe import BatchedFHEClientOps
    from nested_hashing_psi_tpu.utils.checkpoint import load_batched_pie

    t0 = time.time()
    pie = load_batched_pie(args.resume)
    load_s = time.time() - t0
    z = np.load(args.resume + ".client.npz")
    idx_ct = Ciphertext(jnp.asarray(z["idx"]))
    minus_ct = Ciphertext(jnp.asarray(z["minus"]))
    sk = SecretKey(jnp.asarray(z["s_mont"]), jnp.asarray(z["s_ntt"]))
    t0 = time.time()
    out = pie.run(idx_ct, minus_ct)
    out.data.block_until_ready()
    q_s = time.time() - t0
    t0 = time.time()
    slots, noise = pie.ctx.decrypt(out, sk, length=pie.batch_slots)
    dec_s = time.time() - t0
    ops = BatchedFHEClientOps(
        pie.ctx,
        types.SimpleNamespace(table=z["client_table"]),
        0, pie.H, pie.P,
    )
    got = {tuple(r) for r in ops.extract_intersection(np.asarray(slots)).tolist()}
    want = {tuple(r) for r in z["expected"].tolist()}
    ok = got == want
    print(
        f"RESUME RESULT: {'Set matches!' if ok else 'MISMATCH'} "
        f"(load {load_s:.1f}s, online query {q_s:.1f}s, decrypt {dec_s:.1f}s, "
        f"noise {noise:.0f} bits, |intersection| {len(got)})"
    )
    assert ok
    return 0


if __name__ == "__main__":
    main()
