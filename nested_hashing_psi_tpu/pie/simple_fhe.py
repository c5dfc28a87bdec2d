"""Single-position FHE PIE, batched across all outer-table positions.

Capability parity with the reference's FHEHIPPIE
(/root/reference/src/Common/Crypto/PrivateIndexedEqualityCheck/FHEHIPPIE.cpp:9-77):
for one inner cuckoo table, per inner hash fn h and bin b the server computes
EvalInnerProduct(idx_ct[h], pt(bin row || 1)) -- slot sum of the one-hot
index against the bin's items plus the trailing -elem term -- merges the
per-bin results into one ciphertext (slot b = bin b's value) and multiplies
by a random mask. Bin order is pre-shuffled (permVec2) and the per-position
hash-function output order is shuffled (permutationVector) to hide which
hash/bin matched.

TPU-first redesign:
 - ALL positions (the reference's per-thread FHEHIPPIECollections,
   SimpleFHEPSIServer.cpp:92-164) batch into one tensor pipeline: inputs
   (nPies, H, 2, L, N), table (nPies, H, B, L, N).
 - EvalSum is the batched rotation ladder (log2(n/2) automorphisms + one
   conjugation) applied to the whole (nPies, H, B) block at once.
 - EvalMerge needs NO rotations: the slot-sum leaves the inner product in
   every slot, so masking with the one-hot plaintext e_b and adding already
   places bin b's result in slot b (the reference rotates because it first
   isolates slot 0; this formulation is strictly cheaper).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from nested_hashing_psi_tpu.fhe.bgv import BGVContext, Ciphertext, RelinKey, SecretKey
from nested_hashing_psi_tpu.hashing.cuckoo import CuckooHashTable
from nested_hashing_psi_tpu.hashing.hierarchical import HierarchicalCuckooHashTable
from nested_hashing_psi_tpu.ops.modmath import modsum, mont_mul


class SimpleFHEPIE:
    """Batched engine over every (outer table, outer position) inner table."""

    def __init__(
        self,
        ctx: BGVContext,
        hct: HierarchicalCuckooHashTable,
        galois_keys: dict[int, RelinKey],
        mask_seed: int | None = None,
    ):
        if hct.server_stash_size != 0:
            raise ValueError("FHE PIE does not support a stash")
        self.ctx = ctx
        self.gks = galois_keys
        self.H = hct.n_cuckoo_hash_functions
        self.B = hct.max_items_per_position       # bins per hash fn
        self.P = hct.each_cuckoo_table_size       # row length
        if self.P + 1 > ctx.n:
            raise ValueError("inner table row does not fit in ring slots")

        rng = np.random.Generator(
            np.random.Philox(
                key=np.random.SeedSequence().entropy if mask_seed is None else mask_seed
            )
        )
        table = hct.table  # (S, O, H_t, B, P, 2)
        S, O = table.shape[0], table.shape[1]
        self.n_pies = S * O
        if table[..., 1].any():
            raise ValueError("FHE paths support items below 64 bits only")
        vals = table[..., 0].reshape(self.n_pies, self.H, self.B, self.P)

        # permVec2: shuffle bin order per (pie, hf)
        self.bin_perm = np.argsort(rng.random((self.n_pies, self.H, self.B)), axis=-1)
        vals = np.take_along_axis(vals, self.bin_perm[..., None], axis=2)

        # rows: (nPies, H, B, P+1) with trailing 1 for the -elem slot
        rows = np.concatenate(
            [vals.astype(object), np.ones((self.n_pies, self.H, self.B, 1), object)],
            axis=-1,
        )
        flat = rows.reshape(-1, self.P + 1)
        # encode in bounded slabs: a single program over all nPies*H*B polys
        # allocates the whole (rows, L, n) tensor twice on device (9.7 GB at
        # sweep row 0) and OOMs HBM. Tables beyond ~6 GB stay HOST-resident;
        # run()'s chunk loop uploads slices (same pattern as the batched PIE).
        table_bytes = flat.shape[0] * ctx.L * ctx.n * 4
        self.host_table = table_bytes > (6 << 30)
        slabs = []
        for s0 in range(0, flat.shape[0], 2048):
            pt = ctx.make_plaintext_mont(flat[s0 : s0 + 2048])
            slabs.append(np.asarray(pt) if self.host_table else pt)
        cat = np.concatenate if self.host_table else jnp.concatenate
        pt = slabs[0] if len(slabs) == 1 else cat(slabs, axis=0)
        self.table_pt = pt.reshape(self.n_pies, self.H, self.B, ctx.L, ctx.n)

        # one-hot slot selectors e_b (merge masks) and per-(pie,hf) random
        # masks over the first B slots
        eye = np.eye(self.B, dtype=np.int64)
        self.sel_pt = ctx.make_plaintext_mont(eye.astype(object))  # (B, L, n)
        mask_vals = rng.integers(1, ctx.t, size=(self.n_pies, self.H, self.B))
        self.mask_pt = ctx.make_plaintext_mont(
            mask_vals.reshape(-1, self.B).astype(object)
        ).reshape(self.n_pies, self.H, ctx.L, ctx.n)

        # permutationVector: shuffle hash-fn output order per pie
        self.hf_perm = np.argsort(rng.random((self.n_pies, self.H)), axis=-1)

        self._run = None

    # device-memory budget for one chunk's working set. The dominant
    # intermediate is NOT the (chunk, H, B, 2, L, N) product tensor but the
    # EvalSum ladder's key-switch gadget decompose, which fans that block
    # out by ~L digit planes -- budgeting the product alone OOM'd HBM at
    # sweep row 0 with the host-resident table.
    CHUNK_BYTES = 1 << 30

    def _pie_chunk(self) -> int:
        per_pie = (
            self.H * self.B * 2 * self.ctx.L * self.ctx.n * 4
            * (self.ctx.L + 2)
        )
        return max(1, min(self.n_pies, self.CHUNK_BYTES // per_pie))

    def run(self, index_cts: Ciphertext, pie_chunk: int | None = None) -> Ciphertext:
        """index_cts: (nPies, H, 2, L, N) -> results (nPies, H, 2, L, N)
        (hash-fn axis shuffled per pie; slot b of result = bin b).

        Executes in pie chunks: one jitted program over a fixed chunk shape,
        streamed over the position axis. At reference sweep geometries the
        all-positions product tensor (nPies, H, B, 2, L, N) exceeds HBM
        (e.g. 16.7 GB at Parameters1 row 0, ring 16384), so chunking is
        load-bearing, not just a latency knob; the last partial chunk is
        zero-padded to reuse the same executable."""
        if self._run is None:
            self._run = jax.jit(self._run_impl)
        # table/sel/mask plaintexts enter as jit ARGUMENTS: closing over
        # them would embed the packed table as a literal constant in the
        # lowered program (GBs at scale).
        c = (
            self._pie_chunk()
            if pie_chunk is None
            else max(1, min(pie_chunk, self.n_pies))
        )
        hf_perm = jnp.asarray(self.hf_perm)
        if c >= self.n_pies and not self.host_table:
            return self._run(
                index_cts, self.table_pt, self.sel_pt, self.mask_pt,
                hf_perm, self.gks,
            )
        outs = []
        for s in range(0, self.n_pies, c):
            e = min(s + c, self.n_pies)
            pad = c - (e - s)

            def slc(a):
                part = a[s:e]
                if pad:
                    part = jnp.concatenate(
                        [part, jnp.zeros((pad,) + part.shape[1:], part.dtype)],
                        axis=0,
                    )
                return part

            out = self._run(
                Ciphertext(slc(index_cts.data), index_cts.form, index_cts.scale),
                slc(self.table_pt),
                self.sel_pt,
                slc(self.mask_pt),
                slc(hf_perm),
                self.gks,
            )
            outs.append(out.data[: e - s])
            form, scale = out.form, out.scale
        return Ciphertext(jnp.concatenate(outs, axis=0), form, scale)

    def _run_impl(
        self, index_cts: Ciphertext, table_pt, sel_pt, mask_pt, hf_perm, gks
    ) -> Ciphertext:
        ctx = self.ctx
        idx = index_cts.data  # (nPies, H, 2, L, N)
        prod = mont_mul(
            idx[:, :, None], table_pt[:, :, :, None], ctx.p, ctx.pinv
        )  # (nPies, H, B, 2, L, N)
        summed = ctx.eval_sum_all_slots(
            Ciphertext(prod, ctx.default_form), gks
        ).data
        sel = mont_mul(summed, sel_pt[:, None], ctx.p, ctx.pinv)
        merged = modsum(sel, ctx.p, axis=2)  # (nPies, H, 2, L, N)
        masked = mont_mul(merged, mask_pt[:, :, None], ctx.p, ctx.pinv)
        return Ciphertext(
            jnp.take_along_axis(masked, hf_perm[:, :, None, None, None], axis=1),
            ctx.default_form,
        )


class SimpleFHEClientOps:
    """Client-side index construction and result extraction
    (reference SimpleFHEPSIClient.cpp:105-160, 242-266)."""

    def __init__(
        self,
        ctx: BGVContext,
        client_table: CuckooHashTable,
        n_simple_hf: int,
        n_cuckoo_hf: int,
        each_cuckoo_table_size: int,
        max_pp: int,
    ):
        self.ctx = ctx
        self.client_table = client_table
        self.n_simple_hf = n_simple_hf
        self.H = n_cuckoo_hf
        self.P = each_cuckoo_table_size
        self.max_pp = max_pp

    def _slot_items(self) -> np.ndarray:
        return self.client_table.table[:, 0, :, :].reshape(-1, 2)

    def build_index_vectors(self) -> np.ndarray:
        """-> (nPies, H, P+1) plain index vectors: one-hot(hash pos) || -elem;
        dummy positions get all-zero index and -1 (elem treated as 1)."""
        items = self._slot_items()
        n_pies = len(items)
        occupied = (items != 0).any(axis=1)
        out = np.zeros((n_pies, self.H, self.P + 1), dtype=object)
        out[:, :, self.P] = -1  # dummy: elem = 1
        hasher = self.client_table.hasher
        occ_idx = np.nonzero(occupied)[0]
        occ_items = items[occupied]
        vals = occ_items[:, 0].astype(object) + (occ_items[:, 1].astype(object) << 64)
        for h in range(self.H):
            pos = hasher.hash_index(occ_items, self.n_simple_hf + h, self.P)
            for row, p_, v in zip(occ_idx, pos, vals):
                out[row, h, p_] = 1
                out[row, h, self.P] = -int(v)
        return out

    # bound encryption transients: sk-encryption of a B-row batch peaks at
    # several (B, 2, L, N) tensors on device, and at sweep geometries the
    # device also holds the server's packed table (loopback runs share one
    # chip) -- chunk so each encrypt stays ~0.5 GB of working set.
    ENC_CHUNK_BYTES = 1 << 29

    def encrypt_query(self, sk: SecretKey) -> Ciphertext:
        vec = self.build_index_vectors()
        n_pies = vec.shape[0]
        rows = vec.reshape(n_pies * self.H, self.P + 1)
        per_row = 2 * self.ctx.L * self.ctx.n * 4
        chunk = max(1, min(len(rows), self.ENC_CHUNK_BYTES // per_row))
        parts = []
        for s in range(0, len(rows), chunk):
            e = min(s + chunk, len(rows))
            batch = rows[s:e]
            if e - s < chunk:  # pad: reuse the compiled encrypt program
                batch = np.concatenate(
                    [batch, np.zeros((chunk - (e - s), self.P + 1), object)]
                )
            pt = self.ctx.make_plaintext_rns(batch)
            parts.append(self.ctx.encrypt_sk(pt, sk).data[: e - s])
        data = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        return Ciphertext(
            data.reshape(n_pies, self.H, 2, self.ctx.L, self.ctx.n)
        )

    def extract_intersection(self, result_slots: np.ndarray) -> np.ndarray:
        """result_slots: (nPies, H, max_pp) decrypted bin values. A client
        position matches iff any (hf, bin) is 0."""
        from nested_hashing_psi_tpu.pie.batched_fhe import _zero_slots

        return self.extract_intersection_mask(_zero_slots(result_slots))

    def extract_intersection_mask(self, zero_mask: np.ndarray) -> np.ndarray:
        """Same extraction from a precomputed (nPies, H, max_pp) zero mask
        (the on-device decrypt path's artifact)."""
        matched = np.asarray(zero_mask, dtype=bool).any(axis=(1, 2))
        items = self._slot_items()
        occupied = (items != 0).any(axis=1)
        return items[matched & occupied]
