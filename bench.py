"""Benchmark driver: prints ONE JSON line with the north-star metric.

Metric (BASELINE.json): NTT throughput at n = 2^14 over 31-bit RNS limbs on
one chip, reported as single-limb negacyclic transforms per second.

Honesty rules (VERDICT round 1 "benchmark honesty"):
 - the headline number is HBM-RESIDENT: the batch working set (~192 MB in +
   192 MB out) far exceeds VMEM, so every byte really crosses HBM. It runs
   the fused Pallas kernel (ops/ntt_pallas.py) that keeps each tile resident
   across all butterfly stages.
 - `vs_baseline` is measured against the fused-NTT HBM speed of light
   (read + write each residue poly once at ~819 GB/s). The kernel is
   VPU-compute-bound (~34 uint32 ops per Montgomery butterfly), so this
   ratio is honestly far below 1; `vmem_resident` preserves the round-1
   cache-resident number for continuity, and `jnp_hbm` shows the unfused
   baseline the kernel beats.
 - `pie_online` times the COMPLETE batched-PIE online step (the reference's
   BatchedFHEHIPPIE::run hot loop) at the Parameters1.txt 2^20-server /
   2048-client geometry (H=2, D=12, P=12, batch 16044 slots, ring 16384),
   with modmul-throughput accounting from profiling.batched_pie_op_counts.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
from nested_hashing_psi_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()  # env var alone is dead under sitecustomize

import numpy as np

N = 1 << 14
LIMBS = 6
HBM_BYTES_PER_SEC = 819e9  # TPU v5e ~819 GB/s
VMEM_BATCH = 16
HBM_BATCH = 512  # 512 * 6 * 64 KiB = 192 MiB working set per direction


def _sync(y):
    """True execution barrier. Through the sandbox's async TPU relay,
    block_until_ready resolves when the op is ENQUEUED remotely, not when it
    has executed (measured: it passes 30-600x over the HBM roofline on
    192 MB working sets). Fetching one element to the host is the only
    barrier that provably forces the whole dependency chain to run."""
    import jax

    return int(np.asarray(jax.device_get(y.ravel()[0])))


def _rate(fn, x, unit_count, target_s=2.0, max_iters=2000):
    """Chained timing: each iteration consumes the previous output, so every
    transform is on the critical path; one host fetch at the end forces the
    chain (round-1 bench overstated throughput because independent
    same-input calls let the lazy relay skip dead work)."""
    _sync(fn(x))  # compile
    t0 = time.perf_counter()
    _sync(fn(x))
    per = time.perf_counter() - t0
    iters = max(3, min(max_iters, int(target_s / max(per, 1e-5))))
    y = x
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(y)
    _sync(y)
    return unit_count * iters / (time.perf_counter() - t0)


def _rate_device(fn, x, unit_count, inner=40, reps=3):
    """Device-only rate: the whole chain runs inside ONE lax.fori_loop
    dispatch (each iteration consumes the previous output), so a starved
    host cannot distort the measurement -- the per-dispatch _rate above was
    observed 90x low when heavy host jobs ran concurrently. One element is
    fetched at the end to force execution through the async relay."""
    import jax

    chain = jax.jit(
        lambda x0, k: jax.lax.fori_loop(0, k, lambda _, cur: fn(cur), x0),
        static_argnums=1,
    )
    _sync(chain(x, 2))  # compile
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(chain(x, inner))
        rate = unit_count * inner / (time.perf_counter() - t0)
        best = max(best, rate)
    return best


def bench_ntt():
    import jax
    import jax.numpy as jnp

    from nested_hashing_psi_tpu.ops import primes
    from nested_hashing_psi_tpu.ops.ntt import NTTPlan, ntt
    from nested_hashing_psi_tpu.ops.ntt_pallas import SplitNTTPlan, ntt_pallas

    ps = primes.ntt_primes(LIMBS, 31, 2 * N)
    plan = NTTPlan(N, ps)
    sp = SplitNTTPlan(N, ps)
    rng = np.random.default_rng(0)

    def data(batch):
        return jnp.asarray(
            rng.integers(0, min(ps), size=(batch, LIMBS, N), dtype=np.uint64),
            jnp.uint32,
        )

    jnp_fn = jax.jit(lambda a: ntt(a, plan))
    pallas_fn = lambda a: ntt_pallas(a, sp)

    x_small, x_big = data(VMEM_BATCH), data(HBM_BATCH)
    vmem_rate = _rate(jnp_fn, x_small, VMEM_BATCH * LIMBS)
    jnp_hbm_rate = _rate_device(jnp_fn, x_big, HBM_BATCH * LIMBS, inner=10)
    pallas_rate = _rate_device(pallas_fn, x_big, HBM_BATCH * LIMBS)
    return vmem_rate, jnp_hbm_rate, pallas_rate


def bench_pie_online():
    """Full batched-PIE online step at the Parameters1.txt 2^20 x 2048 row."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_small_pie
    from nested_hashing_psi_tpu.fhe.params import bfv_batched_client_limbs
    from nested_hashing_psi_tpu.utils.profiling import batched_pie_op_counts

    H, D, P, simple = 2, 12, 12, 8022
    t = (1 << 32) + (1 << 20) + (1 << 19) + 1  # 32-bit items
    L = bfv_batched_client_limbs(t.bit_length(), P, H)  # production default
    ctx, sk, rlk, pie, ops, idx_ct, minus_ct = _build_small_pie(
        ring=N, limbs=L, H=H, P=P, D=D, simple=simple, t=t, scheme="bfv"
    )

    t0 = time.perf_counter()
    out = pie.run(idx_ct, minus_ct)
    _sync(out.data)
    compile_s = time.perf_counter() - t0
    # Host-fetch every iteration: successive runs share inputs, so without a
    # true barrier the async relay elides repeats (see _sync). This number
    # therefore includes one relay round-trip per query (an honest
    # client-visible latency in this sandbox).
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pie.run(idx_ct, minus_ct)
        _sync(out.data)
    ms = (time.perf_counter() - t0) / iters * 1e3

    # Steady-state device throughput: chain iterations through an
    # optimization_barrier token (one output element feeds the next query's
    # barrier), so the device executes back-to-back with ONE final host
    # fetch -- no relay round-trip per query, no elision possible.
    from nested_hashing_psi_tpu.pie.batched_fhe import batched_pie_forward

    # table/mask/keys as jit ARGUMENTS (not closures): a closed-over packed
    # table becomes a literal constant of the lowered program, which this
    # sandbox's relay re-validates per dispatch (~45 ms/call measured).
    def step_impl(idx_data, minus_data, tbl, msk, rk, token):
        m2, _ = jax.lax.optimization_barrier((minus_data, token))
        return batched_pie_forward(
            ctx, rk, idx_data, m2, tbl, msk,
            use_kernel=jax.default_backend() == "tpu",
            # production defaults: the rescaled-mult pipeline (masks folded
            # into the table; HPS+relin on pie.mul_limbs, ship pie.ship_limbs)
            mul_limbs=pie.mul_limbs, ship_limbs=pie.ship_limbs,
        ).data

    step = jax.jit(step_impl)
    sargs = (idx_ct.data, minus_ct.data, pie.table_pt, pie.mask_pt, rlk)
    o = step(*sargs, jnp.uint32(0))
    _sync(o)
    chain_iters = 20
    t0 = time.perf_counter()
    for _ in range(chain_iters):
        o = step(*sargs, o[0, 0, 0, 0])
    _sync(o)
    steady_ms = (time.perf_counter() - t0) / chain_iters * 1e3

    # Device-only number: the same chain run by lax.fori_loop inside ONE
    # dispatch, removing the per-iteration relay/dispatch overhead that
    # steady_ms still contains.
    @jax.jit
    def chain(idx_data, minus_data, tbl, msk, rk, k):
        def body(_, tok):
            return step_impl(idx_data, minus_data, tbl, msk, rk, tok[0, 0, 0, 0])

        return jax.lax.fori_loop(
            0, k, body, step_impl(idx_data, minus_data, tbl, msk, rk, jnp.uint32(0))
        )

    _sync(chain(*sargs, 2))
    t0 = time.perf_counter()
    _sync(chain(*sargs, chain_iters))
    device_ms = (time.perf_counter() - t0) / (chain_iters + 1) * 1e3

    # Client-visible PIPELINED latency (the headline ms_per_query): Q
    # queries answered in ONE dispatch -- the server's batched PIE (lax.map)
    # FUSED with the client's fully on-device decrypt to packed zero-mask
    # words (fhe.device_decrypt) -- then one 4*Q*N/32-byte fetch. This is
    # what a client streaming queries experiences per query; the ~40 ms
    # relay dispatch overhead amortizes over the batch. Query 0 is the real
    # query (its mask is validated below); the others are rotations so no
    # two map iterations are loop-invariant.
    from nested_hashing_psi_tpu.fhe.device_decrypt import DeviceDecryptor

    Q = 32
    L_ship = pie.ship_limbs or ctx.L
    sctx = ctx.context_for_limbs(L_ship) if L_ship < ctx.L else ctx
    ssk = ctx.shrink_key_to(sk, L_ship)
    dec = DeviceDecryptor(sctx)
    use_kernel = jax.default_backend() == "tpu"

    def pipeline(idx_b, minus_b, tbl, msk, rk, s_mont):
        def one(args):
            i, m = args
            out = batched_pie_forward(
                ctx, rk, i, m, tbl, msk, use_kernel=use_kernel,
                mul_limbs=pie.mul_limbs, ship_limbs=pie.ship_limbs,
            )
            lo, hi = dec._slots_impl(out.data, s_mont)
            anyz = ((lo == 0) & (hi == 0)).any(axis=0)  # (N,)
            bits = anyz.reshape(-1, 32).astype(jnp.uint32) << jnp.arange(
                32, dtype=jnp.uint32
            )
            return bits.sum(axis=1)  # packed (N/32,) words

        return jax.lax.map(one, (idx_b, minus_b))

    pipe = jax.jit(pipeline)
    idx_b = jnp.stack(
        [jnp.roll(idx_ct.data, q, axis=-1) for q in range(Q)]
    )
    minus_b = jnp.stack([minus_ct.data] * Q)
    pargs = (idx_b, minus_b, pie.table_pt, pie.mask_pt, rlk, ssk.s_mont)
    masks = np.asarray(pipe(*pargs))  # compile + correctness fetch
    # validate query 0 against the host-decrypted single run
    slots, _ = ctx.decrypt(out, sk)
    want0 = np.packbits(
        np.asarray(slots, dtype=object).__eq__(0).any(axis=0).astype(np.uint8),
        bitorder="little",
    ).view(np.uint32)
    assert np.array_equal(masks[0], want0), "pipelined mask mismatch"
    best_pipe = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(pipe(*pargs))
        best_pipe = min(best_pipe, (time.perf_counter() - t0) / Q * 1e3)

    counts = batched_pie_op_counts(H, D, P, ctx.L, ctx.n)
    modmuls = counts["ct_pt_modmuls"] + counts["approx_ntt_modmuls"]
    return {
        "config": "server=2^20 client=2048 (Parameters1.txt row 12)",
        "H": H,
        "D": D,
        "P": P,
        "limbs": ctx.L,
        "batch_slots": 2 * simple,
        "ms_per_query": round(best_pipe, 2),
        "pipeline_Q": Q,
        "ms_per_query_single": round(ms, 2),
        "ms_per_query_steady": round(steady_ms, 2),
        "ms_per_query_device": round(device_ms, 2),
        "depth_rows_per_sec": round(D / (device_ms / 1e3), 1),
        "modmul_gops": round(modmuls / (device_ms / 1e3) / 1e9, 2),
        "compile_s": round(compile_s, 1),
    }


def main():
    vmem_rate, jnp_hbm_rate, pallas_rate = bench_ntt()
    pie = bench_pie_online()
    roofline = HBM_BYTES_PER_SEC / (2 * N * 4)  # fused NTT: one read+write
    result = {
        "metric": "ntt_per_sec_per_chip_n16384",
        "value": round(pallas_rate, 1),
        "unit": "limb-transforms/s",
        "vs_baseline": round(pallas_rate / roofline, 4),
        "resident": "hbm",
        "hbm_batch": HBM_BATCH,
        "jnp_hbm": round(jnp_hbm_rate, 1),
        "vmem_resident": round(vmem_rate, 1),
        "pie_online": pie,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
