"""Profile the server offline build (nested-cuckoo + packed encode) to size
the 2^28 run.

Round-3 recorded 2479 s for the 2^24 build on this sandbox's 2 vCPUs without
attribution; 2^28 is 16x the items, so knowing WHERE the time goes decides
whether streaming alone gets there or the hot loop must move. Usage:

    python benchmarks/profile_build.py [log2_items] [--row24]

Profiles, at the chosen scale (default 2^22):
  gen     -- RandomDataInput server-set generation
  hash    -- tabulation hashing of every (item, simpleHF) pair
  insert  -- CuckooBuilder chunked rounds (includes hash)
  encode  -- packed encode of the resulting table at ring 16384 (native path)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    log2_items = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n = 1 << log2_items
    # Parameters1.txt row 24 geometry (2048 x 2^28), inner tables scaled so
    # the load factor matches the chosen item count:
    simple, H = 8022, 2
    load = n / (2 * simple)  # items per outer cell (x2 simple hash fns)
    # keep the reference's slack: maxPP = cuckooSize ~ 1.28 * sqrt(load)...
    # row 24 has maxPP=139 at load ~16.7k items/cell (2^28): 139*139/16730 = 1.155
    inner = max(8, int((load * 1.16) ** 0.5 + 1))
    print(f"n=2^{log2_items} simple={simple} inner={inner}x{inner}", flush=True)

    from nested_hashing_psi_tpu.data.input import RandomDataInput
    from nested_hashing_psi_tpu.hashing import (
        HierarchicalCuckooHashTable,
        TabulationHashing,
    )

    t0 = time.perf_counter()
    data = RandomDataInput(n, 2048, 1025, 123456789, 32)
    server = data.get_server_set()
    t_gen = time.perf_counter() - t0
    print(f"gen: {t_gen:.1f}s ({n/t_gen/1e6:.2f} M items/s)", flush=True)

    hasher = TabulationHashing(987654321, 4)
    t0 = time.perf_counter()
    for h in range(2):
        hasher.hash_index(server, h, simple)
    t_hash = time.perf_counter() - t0
    print(f"hash(2 simple hf): {t_hash:.1f}s ({2*n/t_hash/1e6:.2f} M hashes/s)", flush=True)

    hct = HierarchicalCuckooHashTable(
        hasher,
        each_simple_table_size=simple,
        each_cuckoo_table_size=inner,
        n_simple_hash_functions=2,
        n_cuckoo_hash_functions=H,
        max_items_per_position=inner,
        seed=7,
    )
    t0 = time.perf_counter()
    import cProfile, pstats

    prof = cProfile.Profile()
    prof.enable()
    hct.insert_all(server)
    prof.disable()
    t_ins = time.perf_counter() - t0
    print(f"insert_all: {t_ins:.1f}s ({2*n/t_ins/1e6:.2f} M pairs/s)", flush=True)
    stats = pstats.Stats(prof)
    stats.sort_stats("cumulative").print_stats(14)

    # encode a SLICE of the table (extrapolate: cost is linear in polys)
    from nested_hashing_psi_tpu.fhe.encoding import PackedEncoder

    t_mod = (1 << 32) + (1 << 20) + (1 << 19) + 1
    enc = PackedEncoder(16384, t_mod)
    vals = hct.table[..., 0]  # (S, O, H, D, P)
    slots = vals.transpose(2, 3, 4, 0, 1).reshape(H, inner, inner, -1)
    n_polys_total = H * inner * inner
    sample = min(64, inner)
    t0 = time.perf_counter()
    enc.encode(slots[0, :sample, 0].astype(object))
    per = (time.perf_counter() - t0) / sample
    print(
        f"encode: {per*1e3:.1f} ms/poly -> full table {n_polys_total} polys "
        f"= {per*n_polys_total:.0f}s",
        flush=True,
    )


if __name__ == "__main__":
    main()
