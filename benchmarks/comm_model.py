"""Per-strategy communication-volume model for the batched-PIE online step.

The 8-device CPU dryrun (__graft_entry__.dryrun_multichip) validates that the
dp x tp / sp / pp shardings are CORRECT; this model quantifies what they
would COST on a real multi-chip slice, so the v5e-16 scaling claim is a
prediction, not an assertion (VERDICT r3 task #9).

Volumes are derived from the sharded implementations in parallel/mesh.py and
parallel/dist_ntt.py (per device, per query):

  dp x tp  -- position sums and tensor products are limb/depth-local; the
              HPS base conversions and the relin gadget decompose need every
              limb of a coefficient, so the operand/digit coefficients are
              all-gathered over tp:
                  ag_bytes = polys * n * 4 * L * (tp-1)/tp
              with polys = D * (2 ops * 2 comps + 3 product comps + 2).
  sp       -- the ring axis is sharded; every NTT/iNTT runs ring-exchange
              butterflies: log2(sp) block exchanges of the local n/sp block
              per limb transform (parallel/dist_ntt.py:108-199):
                  pp_bytes = T * (n/sp) * 4 * log2(sp)
              with T = limb transforms per query (rescaled pipeline count).
  pp       -- positions sharded; the partial position-sum accumulator rides
              a pipelined ring reduce-scatter (parallel/mesh.py:204-297):
                  ring_bytes = D * 2 * L * n * 4 * (pp-1)/pp

Efficiency model: t_N = t_1/N + net_bytes / ICI_BW, overlap ignored (the pp
path overlaps its ppermutes with the next chunk's ct x pt, so its prediction
is a lower bound). Assumed ICI bandwidth per chip is printed with the table.

Usage: python benchmarks/comm_model.py [--t1-ms 6.21]
"""

from __future__ import annotations

import argparse
import json
import math

ICI_GBPS = 100.0  # v5e per-chip effective ICI bandwidth assumption (GB/s)


def transforms_per_query(D, L, L_mul, KA_mul, L_ship):
    """Limb-transform count of the rescaled pipeline (fhe.bfv), per query."""
    per_mult = (
        4 * L            # operand iNTT at the full basis
        + 4 * L_mul      # forward NTT on the mult basis
        + 4 * KA_mul     # aux-base forward
        + 3 * L_mul      # product iNTT over q'
        + 3 * KA_mul     # product iNTT over aux
        + 2 * L_mul      # d01 forward
        + L_mul * L_mul  # relin digit NTTs
        + 2 * L_mul      # ship rescale iNTT
        + 2 * L_ship     # ship forward
    )
    return D * per_mult


def model(name, H, D, P, L, n, L_mul=5, KA_mul=8, L_ship=4, t1_ms=None):
    polys = D * (2 * 2 + 3 + 2)
    T = transforms_per_query(D, L, L_mul, KA_mul, L_ship)
    rows = []
    for strat, devs in (("dp2xtp2", 4), ("dp4xtp2", 8), ("sp8", 8),
                        ("pp8", 8), ("dp8xtp2", 16)):
        if strat.startswith("dp"):
            dp = int(strat[2:strat.index("x")])
            tp = int(strat[strat.index("tp") + 2:])
            N = dp * tp
            net = polys * n * 4 * L * (tp - 1) / tp / dp
        elif strat.startswith("sp"):
            N = int(strat[2:])
            net = T * (n / N) * 4 * math.log2(N)
        else:
            N = int(strat[2:])
            net = D * 2 * L * n * 4 * (N - 1) / N
        row = {"strategy": strat, "devices": N, "net_MB_per_query": round(net / 1e6, 2)}
        if t1_ms:
            t_n = t1_ms / N + net / (ICI_GBPS * 1e9) * 1e3
            row["modeled_ms"] = round(t_n, 3)
            row["efficiency"] = round(t1_ms / (N * t_n), 3)
        rows.append(row)
    return {"geometry": name, "H": H, "D": D, "P": P, "L": L, "n": n,
            "transforms_per_query": T, "ici_GBps": ICI_GBPS, "rows": rows}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t1-ms", type=float, default=6.21,
                    help="measured single-chip ms/query at the 2^20 geometry")
    ap.add_argument("--t1-ns-ms", type=float, default=101.0,
                    help="measured single-chip ms/query at the north star")
    args = ap.parse_args()
    out = [
        model("2^20 x 2048 (Parameters1 row 12)", 2, 12, 12, 7, 16384,
              t1_ms=args.t1_ms),
        model("north star 2^24 x 2^12", 2, 48, 48, 9, 16384,
              L_mul=5, KA_mul=8, L_ship=4, t1_ms=args.t1_ns_ms),
    ]
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
