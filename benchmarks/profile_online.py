"""Attribute the batched-PIE online step's wall-clock to its components.

VERDICT round-2 weak #2: the full online step ran ~40x slower than its own
NTT kernel; nobody had measured where the time went. This script times each
stage of batched_pie_forward at the bench geometry (Parameters1.txt 2^20 row)
on the real TPU, with the chained-iteration + single-host-fetch methodology
(bench.py) that is honest through the async relay.

Components:
  pos_sum  -- fused Pallas position-sum kernel (ops/pie_kernels.py)
  hps_mul  -- one BFV HPS ct x ct at (D, 2, L, N)
  relin    -- one relinearization at (D, 3, L, N)
  ctxpt    -- one (D, 2, L, N) ct x pt (the masked-minus shape; the final
              mask multiply itself is folded into the table since round 4)
  full     -- the whole batched_pie_forward (flat basis)
  full_rescaled -- the production pipeline (rescaled mult basis)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
from nested_hashing_psi_tpu.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()  # env var alone is dead under sitecustomize

import numpy as np
import jax
import jax.numpy as jnp


def _sync(y):
    return int(np.asarray(jax.device_get(y.ravel()[0])))


def _ms(step, args, iters=20):
    """step(*args, token) -> array or pytree; chained through a token."""
    import jax

    leaf = lambda o: jax.tree_util.tree_leaves(o)[0]
    o = step(*args, jnp.uint32(0))
    _sync(leaf(o))
    t0 = time.perf_counter()
    for _ in range(iters):
        o = step(*args, leaf(o).ravel()[0])
    _sync(leaf(o))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from __graft_entry__ import _build_small_pie
    from nested_hashing_psi_tpu.fhe.bgv import Ciphertext
    from nested_hashing_psi_tpu.fhe.params import bfv_batched_client_limbs
    from nested_hashing_psi_tpu.pie.batched_fhe import (
        batched_pie_forward,
        position_sum,
    )
    from nested_hashing_psi_tpu.ops.modmath import add_mod, mont_mul

    H, D, P, simple = 2, 12, 12, 8022
    ring = 1 << 14
    t = (1 << 32) + (1 << 20) + (1 << 19) + 1
    L = bfv_batched_client_limbs(t.bit_length(), P, H)  # production default
    ctx, sk, rlk, pie, ops, idx_ct, minus_ct = _build_small_pie(
        ring=ring, limbs=L, H=H, P=P, D=D, simple=simple, t=t, scheme="bfv"
    )
    use_kernel = jax.default_backend() == "tpu"
    print(f"geometry H={H} D={D} P={P} L={ctx.L} n={ctx.n}", flush=True)

    def tok(x, token):
        return jax.lax.optimization_barrier((x, token))[0]

    @jax.jit
    def f_pos(idx, table, token):
        return position_sum(ctx, tok(idx, token), table, use_kernel=use_kernel)

    @jax.jit
    def f_full(idx, minus, table, mask, rk, token):
        return batched_pie_forward(
            ctx, rk, tok(idx, token), minus, table, mask, use_kernel=use_kernel
        ).data

    # the rescaled-mult pipeline (fhe.params.bfv_mul_limbs): mask-first,
    # operands modulus-switched to pie.mul_limbs, HPS+relin there, result
    # shipped at pie.ship_limbs
    @jax.jit
    def f_full_rescaled(idx, minus, table, mask, rk, token):
        return batched_pie_forward(
            ctx, rk, tok(idx, token), minus, table, mask,
            use_kernel=use_kernel,
            mul_limbs=pie.mul_limbs, ship_limbs=pie.ship_limbs,
        ).data

    ctx.mulconv  # build the HPS converter before tracing _hps_mul_impl
    ip0 = f_pos(idx_ct.data, pie.table_pt, jnp.uint32(0))
    ip0 = add_mod(ip0, minus_ct.data[None, None], ctx.p)
    a_d, b_d = ip0[0], ip0[1]  # (D, 2, L, N)

    @jax.jit
    def f_hps(a, b, token):
        return ctx._hps_mul_impl(
            Ciphertext(tok(a, token), "bfv", 1), Ciphertext(b, "bfv", 1)
        ).data

    d3 = f_hps(a_d, b_d, jnp.uint32(0))  # (D, 3, L, N)

    @jax.jit
    def f_relin(d, rk, token):
        return ctx._relinearize_impl(
            Ciphertext(tok(d, token), "bfv", 1), rk
        ).data

    @jax.jit
    def f_mask(x, mask, token):
        return mont_mul(tok(x, token), mask[:, None], ctx.p, ctx.pinv)

    ct2 = f_relin(d3, rlk, jnp.uint32(0))

    results = {}
    t0 = time.perf_counter()
    results["pos_sum"] = _ms(f_pos, (idx_ct.data, pie.table_pt))
    results["hps_mul"] = _ms(f_hps, (a_d, b_d))
    results["relin"] = _ms(f_relin, (d3, rlk))
    results["ctxpt"] = _ms(f_mask, (ct2, pie.mask_pt))
    results["full"] = _ms(f_full, (idx_ct.data, minus_ct.data, pie.table_pt,
                                   pie.mask_pt, rlk))
    if pie.mul_limbs:
        results["full_rescaled"] = _ms(
            f_full_rescaled,
            (idx_ct.data, minus_ct.data, pie.table_pt, pie.mask_pt, rlk),
        )
    total = time.perf_counter() - t0
    for k, v in results.items():
        print(f"{k:>8}: {v:8.2f} ms", flush=True)
    parts = sum(v for k, v in results.items() if k != "full")
    print(f"sum(parts) = {parts:.2f} ms vs full = {results['full']:.2f} ms "
          f"(wall {total:.0f}s)")


def hps_parts():
    """Attribute the HPS ct x ct itself: transforms vs base-conversion glue.
    Invoke with: python benchmarks/profile_online.py hps"""
    import jax.numpy as jnp

    from __graft_entry__ import _build_small_pie
    from nested_hashing_psi_tpu.fhe.bgv import Ciphertext, tensor_product
    from nested_hashing_psi_tpu.fhe.params import bfv_batched_client_limbs
    from nested_hashing_psi_tpu.pie.batched_fhe import position_sum
    from nested_hashing_psi_tpu.ops.modmath import add_mod

    H, D, P, simple = 2, 12, 12, 8022
    ring = 1 << 14
    t = (1 << 32) + (1 << 20) + (1 << 19) + 1
    L = bfv_batched_client_limbs(t.bit_length(), P, H)  # production default
    ctx, sk, rlk, pie, ops, idx_ct, minus_ct = _build_small_pie(
        ring=ring, limbs=L, H=H, P=P, D=D, simple=simple, t=t, scheme="bfv"
    )
    ctx.mulconv
    mc = ctx._mulconv
    use_kernel = jax.default_backend() == "tpu"
    ip0 = jax.jit(lambda i, tbl: position_sum(ctx, i, tbl, use_kernel=use_kernel))(
        idx_ct.data, pie.table_pt
    )
    ip0 = add_mod(ip0, minus_ct.data[None, None], ctx.p)
    a_d, b_d = ip0[0], ip0[1]  # (D, 2, L, N)
    ab = jnp.stack([a_d, b_d])

    plan_aux = mc.plan_aux
    p_aux = jnp.asarray(plan_aux.p_arr)
    pinv_aux = jnp.asarray(plan_aux.pinv_arr)
    r2_aux = jnp.asarray(plan_aux.r2_arr)

    def tok(x, token):
        return jax.lax.optimization_barrier((x, token))[0]

    @jax.jit
    def f_intt_q(x, token):          # (2, D, 2, L, N)
        return ctx._intt_fast(tok(x, token))

    @jax.jit
    def f_extend(x, token):          # coeffs -> aux residues (VPU only)
        return mc.extend_q_to_aux(tok(x, token))

    @jax.jit
    def f_ntt_aux(x, token):
        return ctx._ntt_fast_aux(tok(x, token))

    @jax.jit
    def f_tensor_both(eab, ab2, token):
        ea, eb = eab[0], eab[1]
        d_aux = tensor_product(tok(ea, token), eb, p_aux, pinv_aux, r2_aux)
        d_q = tensor_product(ab2[0], ab2[1], ctx.p, ctx.pinv, ctx.r2)
        return d_q, d_aux

    @jax.jit
    def f_scale_exact(d_q_c, d_aux_c, token):
        y = mc.scale_round(tok(d_q_c, token), d_aux_c)
        return mc.exact_to_q(y)

    coeffs = f_intt_q(ab, jnp.uint32(0))
    ext = f_extend(coeffs, jnp.uint32(0))
    eab = f_ntt_aux(ext, jnp.uint32(0))
    d_q, d_aux = f_tensor_both(eab, ab, jnp.uint32(0))
    d_q_c = ctx._intt_fast(d_q)
    d_aux_c = ctx._intt_fast_aux(d_aux)
    y_q = f_scale_exact(d_q_c, d_aux_c, jnp.uint32(0))

    @jax.jit
    def f_intt_dq(x, token):
        return ctx._intt_fast(tok(x, token))

    @jax.jit
    def f_intt_daux(x, token):
        return ctx._intt_fast_aux(tok(x, token))

    @jax.jit
    def f_ntt_final(x, token):
        return ctx._ntt_fast(tok(x, token))

    rows = {
        "intt_q(2xDx2xL)": (f_intt_q, (ab,)),
        "extend(VPU)": (f_extend, (coeffs,)),
        "ntt_aux(2xDx2xKA)": (f_ntt_aux, (ext,)),
        "tensor_both": (f_tensor_both, (eab, ab)),
        "intt_dq(Dx3xL)": (f_intt_dq, (d_q,)),
        "intt_daux(Dx3xKA)": (f_intt_daux, (d_aux,)),
        "scale+exact(VPU)": (f_scale_exact, (d_q_c, d_aux_c)),
        "ntt_final(Dx3xL)": (f_ntt_final, (y_q,)),
    }
    print(f"KA={mc.K+1} L={ctx.L} D={D}", flush=True)
    for name, (f, a) in rows.items():
        print(f"{name:>22}: {_ms(f, a):7.2f} ms", flush=True)


def capture_trace(outdir: str = "eval_results/trace_online"):
    """Capture a jax.profiler trace of the production online step + the
    on-device client decrypt (VERDICT r4 item 9) and print the device-time
    table aggregated from the trace events -- the cross-check for the
    op-count attribution in utils.profiling.batched_pie_op_counts.
    Invoke with: python benchmarks/profile_online.py trace"""
    import glob
    import gzip
    import json

    from __graft_entry__ import _build_small_pie
    from nested_hashing_psi_tpu.fhe.device_decrypt import DeviceDecryptor
    from nested_hashing_psi_tpu.fhe.params import bfv_batched_client_limbs
    from nested_hashing_psi_tpu.pie.batched_fhe import batched_pie_forward

    H, D, P, simple = 2, 12, 12, 8022
    t = (1 << 32) + (1 << 20) + (1 << 19) + 1
    L = bfv_batched_client_limbs(t.bit_length(), P, H)
    ctx, sk, rlk, pie, ops, idx_ct, minus_ct = _build_small_pie(
        ring=1 << 14, limbs=L, H=H, P=P, D=D, simple=simple, t=t, scheme="bfv"
    )
    use_kernel = jax.default_backend() == "tpu"
    L_ship = pie.ship_limbs or ctx.L
    sctx = ctx.context_for_limbs(L_ship) if L_ship < ctx.L else ctx
    ssk = ctx.shrink_key_to(sk, L_ship)
    dec = DeviceDecryptor(sctx)

    def tokd(x, token):
        return jax.lax.optimization_barrier((x, token))[0]

    @jax.jit
    def step(idx, minus, table, mask, rk, s_mont, token):
        out = batched_pie_forward(
            ctx, rk, tokd(idx, token), minus, table, mask,
            use_kernel=use_kernel,
            mul_limbs=pie.mul_limbs, ship_limbs=pie.ship_limbs,
        )
        lo, hi = dec._slots_impl(out.data, s_mont)
        return ((lo == 0) & (hi == 0)).any(axis=0)

    args = (idx_ct.data, minus_ct.data, pie.table_pt, pie.mask_pt, rlk,
            ssk.s_mont)
    o = step(*args, jnp.uint32(0))
    _sync(o)
    os.makedirs(outdir, exist_ok=True)
    with jax.profiler.trace(outdir):
        for _ in range(8):
            o = step(*args, o.ravel()[0].astype(jnp.uint32))
        _sync(o)
    print(f"trace written to {outdir}", flush=True)

    # aggregate device-side event durations from the perfetto trace
    files = sorted(glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not files:
        print("no trace.json.gz produced (profiler unsupported here?)")
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    durs: dict = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            durs[name] = durs.get(name, 0.0) + ev["dur"] / 1e3
    print(f"top device/trace events by total ms over 8 steps "
          f"({files[-1].split('/')[-1]}):")
    for name, ms in sorted(durs.items(), key=lambda kv: -kv[1])[:24]:
        print(f"  {ms:9.2f} ms  {name[:90]}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "hps":
        import jax.numpy as jnp

        hps_parts()
    elif len(sys.argv) > 1 and sys.argv[1] == "trace":
        capture_trace()
    else:
        main()
