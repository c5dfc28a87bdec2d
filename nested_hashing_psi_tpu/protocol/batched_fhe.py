"""Batched FHE PSI protocol: the headline client/server pair.

Capability parity with the reference's BatchedFHEPSIClient/Server
(/root/reference/src/Client/FHE/BatchedFHEPSIClient.cpp,
 src/Server/FHE/BatchedFHEPSIServer.cpp):

 setup   client: hashing + scheme params (plaintext modulus by bit size,
                 depth by inner table size) + keygen + relin keys + client
                 cuckoo table ctor; ships scheme params and keys to server.
         server: receives params/keys; builds nested-table structure.
 offline client: inserts its set, builds + encrypts the batched index matrix
                 and minus-element ciphertext (one ciphertext per
                 (cuckoo hf, inner position) + 1).
         server: bulk-builds the nested cuckoo table and the packed
                 plaintext tensor (BatchedFHEPIE).
 online  client: ships the ciphertexts, receives maxPP result ciphertexts,
                 decrypts, extracts intersection (slot zero test).
         server: one jitted TPU pipeline (BatchedFHEPIE.run), ships results.

Wire format differences (deliberate): ciphertext batches travel as single
dense uint32 tensors instead of per-ciphertext serialized objects, and the
"crypto context" is just (ring_dim, t, num_limbs) -- both sides derive the
identical prime set deterministically (ops.primes.ntt_primes).
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from nested_hashing_psi_tpu.config import HashTableParams, PSIParams
from nested_hashing_psi_tpu.fhe.bfv import make_context
from nested_hashing_psi_tpu.fhe.bgv import Ciphertext, RelinKey
from nested_hashing_psi_tpu.fhe.params import (
    SchemeParams,
    default_num_limbs,
    leveled_default,
    plaintext_modulus_for_bit_size,
)
from nested_hashing_psi_tpu.hashing import (
    CuckooHashTable,
    HierarchicalCuckooHashTable,
    TabulationHashing,
)
from nested_hashing_psi_tpu.pie.batched_fhe import BatchedFHEClientOps, BatchedFHEPIE
from nested_hashing_psi_tpu.protocol.base import PSIClientBase, PSIServerBase
from nested_hashing_psi_tpu.protocol.channel import Channel

PROTOCOL_NAME = "BatchedFHE"


def _scheme_params(psi: PSIParams, ht: HashTableParams) -> SchemeParams:
    t = plaintext_modulus_for_bit_size(psi.bit_size)
    scheme = "bgv" if psi.bgv else "bfv"  # reference default is BFV
    # the BGV PIE runs leveled (one limb dropped per cross-hash mult) when
    # t fits device mod-t arithmetic -- the server constructs its PIE with
    # the same predicate
    leveled = leveled_default(scheme, t, ht.n_cuckoo_hash_functions)
    if scheme == "bfv":
        # the rescaled pipeline with folded masks needs fewer client limbs
        # than the mask-at-the-end model (fhe.params.bfv_batched_client_limbs)
        from nested_hashing_psi_tpu.fhe.params import bfv_batched_client_limbs

        auto = bfv_batched_client_limbs(
            t.bit_length(),
            ht.each_cuckoo_table_size,
            ht.n_cuckoo_hash_functions,
            ring_dim=psi.ring_dim,
        )
    else:
        auto = default_num_limbs(
            t.bit_length(),
            ht.n_cuckoo_hash_functions - 1,
            ht.each_cuckoo_table_size,
            scheme,
            leveled=leveled,
            ring_dim=psi.ring_dim,
        )
    limbs = psi.num_limbs or auto
    sp = SchemeParams(
        ring_dim=psi.ring_dim,
        plaintext_modulus=t,
        num_limbs=limbs,
        scheme=scheme,
    )
    # HEStd_128 bound for every tabled ring dim (1024..32768); small test
    # rings are outside the table and pass through
    sp.validate_security()
    return sp


class BatchedFHEPSIClient(PSIClientBase):
    def __init__(self, data, params: PSIParams, ht: HashTableParams, channel: Channel, **kw):
        super().__init__(data, params, channel, PROTOCOL_NAME, **kw)
        self.ht = ht

    def run_setup_phase(self) -> None:
        p, ht = self.params, self.ht
        if ht.batch_slots > p.ring_dim:
            raise ValueError(
                f"batch slots {ht.batch_slots} exceed ring dim {p.ring_dim}"
            )
        self.hasher = TabulationHashing(
            p.hash_seed, ht.n_simple_hash_functions + ht.n_cuckoo_hash_functions
        )
        self.ctx = make_context(_scheme_params(p, ht), seed=None)
        self.sk, self.pk = self.ctx.keygen()
        self.rlk = self.ctx.relin_keygen(self.sk)
        self.client_table = CuckooHashTable(
            self.hasher,
            each_table_size=ht.each_simple_table_size,
            n_hash_functions=ht.n_simple_hash_functions,
            starting_hash_id=0,
            max_stash_size=0,
            multi_table=ht.simple_multi_table,
            max_items_per_position=1,
            seed=p.item_seed ^ 0x5EED,
        )
        # context + keys to the server (cpp:217-247)
        sp = self.ctx.params
        self.channel.write_tensor(
            np.array(
                [sp.ring_dim, sp.plaintext_modulus, sp.num_limbs,
                 1 if sp.scheme == "bgv" else 0],
                np.uint64,
            )
        )
        self.channel.write_tensor(self.rlk.b_mont)
        self.channel.write_tensor(self.rlk.a_mont)

    def run_offline_phase(self) -> None:
        self.client_table.insert_all(self.client_set)
        self.client_ops = BatchedFHEClientOps(
            self.ctx,
            self.client_table,
            self.ht.n_simple_hash_functions,
            self.ht.n_cuckoo_hash_functions,
            self.ht.each_cuckoo_table_size,
        )
        self.idx_ct, self.minus_ct = self.client_ops.encrypt_query(self.sk)
        self.idx_ct.data.block_until_ready()  # offline phase owns this cost

    def _effective_chunks(self) -> int:
        """Largest divisor of the inner position count <= the requested
        stream_chunks (equal-width chunks keep the server on one jit)."""
        P = self.ht.each_cuckoo_table_size
        n = max(1, min(self.params.stream_chunks, P))
        while P % n:
            n -= 1
        return n

    def run_online_phase(self) -> None:
        if self.params.num_queries > 1:
            return self._run_online_many(self.params.num_queries)
        self.channel.write_tensor(self.minus_ct.data)
        n_chunks = self._effective_chunks()
        self.channel.write_tensor(np.array([n_chunks], np.uint64))
        if n_chunks == 1:
            self.channel.write_tensor(self.idx_ct.data)
        else:
            P = self.ht.each_cuckoo_table_size
            w = P // n_chunks
            for c in range(n_chunks):
                self.channel.write_tensor(self.idx_ct.data[:, c * w : (c + 1) * w])
        meta = self.channel.read_tensor()
        form = "bgv" if int(meta[0]) else "bfv"
        result = Ciphertext(
            jnp.asarray(self.channel.read_tensor()), form, int(meta[1])
        )
        # a leveled server ships fewer limbs; decrypt in the matching child
        # context with the shrunk key
        n_limbs = result.data.shape[-2]
        dctx = self.ctx.context_for_limbs(n_limbs)
        dsk = self.ctx.shrink_key_to(self.sk, n_limbs)
        if result.form == "bfv" and jax.default_backend() == "tpu":
            # fully on-device decrypt -> per-slot zero mask: fetches 16 KB
            # of booleans instead of the multi-MB phase tensor the host CRT
            # path needs (fhe.device_decrypt; bit-exact oracle-tested).
            # Noise readout needs the host path: only when asked (verbose).
            from nested_hashing_psi_tpu.fhe.device_decrypt import DeviceDecryptor

            dec = DeviceDecryptor(dctx)
            mask = np.asarray(
                dec.zero_mask(result.data, dsk.s_mont, length=self.ht.batch_slots)
            )
            self.noise_bits = None
            if self.params.verbose:
                _, self.noise_bits = dctx.decrypt(
                    result, dsk, length=self.ht.batch_slots
                )
            self.intersection_calculated = (
                self.client_ops.extract_intersection_mask(mask)
            )
        else:
            slots, noise = dctx.decrypt(result, dsk, length=self.ht.batch_slots)
            self.noise_bits = noise
            self.intersection_calculated = self.client_ops.extract_intersection(
                np.asarray(slots)
            )

    def _run_online_many(self, Q: int) -> None:
        """Multi-query transaction (--queries Q): Q query ciphertext sets in
        ONE exchange, answered by the server's single batched dispatch
        (BatchedFHEPIE.run_many). Framework extension for serving throughput
        -- per-query results are bit-identical to Q separate exchanges; the
        client verifies every query's zero mask agrees before extracting."""
        minus_b = jnp.stack([self.minus_ct.data] * Q)
        idx_b = jnp.stack([self.idx_ct.data] * Q)
        self.channel.write_tensor(minus_b)
        self.channel.write_tensor(idx_b)
        meta = self.channel.read_tensor()
        form = "bgv" if int(meta[0]) else "bfv"
        result = Ciphertext(
            jnp.asarray(self.channel.read_tensor()), form, int(meta[1])
        )  # (Q, D, 2, L', N)
        n_limbs = result.data.shape[-2]
        dctx = self.ctx.context_for_limbs(n_limbs)
        dsk = self.ctx.shrink_key_to(self.sk, n_limbs)
        if result.form == "bfv" and jax.default_backend() == "tpu":
            from nested_hashing_psi_tpu.fhe.device_decrypt import DeviceDecryptor

            dec = DeviceDecryptor(dctx)
            masks = np.asarray(
                dec.zero_mask(result.data, dsk.s_mont, length=self.ht.batch_slots)
            )  # (Q, D, batch)
            self.noise_bits = None
        else:
            slots, self.noise_bits = dctx.decrypt(
                result, dsk, length=self.ht.batch_slots
            )
            masks = np.asarray(slots, dtype=object) == 0
        per_q = masks.any(axis=1)  # (Q, batch)
        if not (per_q == per_q[0]).all():
            raise ValueError("multi-query results disagree across the batch")
        self.intersection_calculated = self.client_ops.extract_intersection_mask(
            per_q[0]
        )


class BatchedFHEPSIServer(PSIServerBase):
    def __init__(self, data, params: PSIParams, ht: HashTableParams, channel: Channel, **kw):
        super().__init__(data, params, channel, PROTOCOL_NAME, **kw)
        self.ht = ht

    def run_setup_phase(self) -> None:
        p, ht = self.params, self.ht
        self.hasher = TabulationHashing(
            p.hash_seed, ht.n_simple_hash_functions + ht.n_cuckoo_hash_functions
        )
        meta = self.channel.read_tensor()
        if meta.shape != (4,):
            raise ValueError(f"malformed scheme-params frame {meta.shape}")
        ring_dim, t, limbs, is_bgv = (int(v) for v in meta)
        # client-supplied parameters are untrusted: bound them before
        # building a context (fhe.params.validate_wire_scheme_params)
        from nested_hashing_psi_tpu.fhe.params import validate_wire_scheme_params

        sp = validate_wire_scheme_params(
            ring_dim, t, limbs, "bgv" if is_bgv else "bfv"
        )
        self.ctx = make_context(sp, seed=None)
        self.rlk = RelinKey(
            b_mont=jnp.asarray(self.channel.read_tensor()),
            a_mont=jnp.asarray(self.channel.read_tensor()),
        )
        self.server_table = HierarchicalCuckooHashTable.from_params(
            self.hasher, ht, seed=p.item_seed ^ 0x7A11
        )

    def run_offline_phase(self) -> None:
        begin = time.monotonic_ns()
        self.server_table.insert_all(self.server_set)
        ht, ctx = self.ht, self.ctx
        # large packed tables stay host-resident and the online step streams
        # position slices to the device (BatchedFHEPIE._run_host_table).
        # Threshold: the online combine stage's HPS transients peak at a few
        # GB on top of the table + index cts, and a 6.8 GB device-resident
        # table OOM'd the 16 GB HBM at the 2^24 x 128 sweep row -- so
        # anything past ~5 GB streams.
        table_bytes = (
            ht.n_cuckoo_hash_functions * ht.max_items_per_position
            * ht.each_cuckoo_table_size * ctx.L * ctx.n * 4
        )
        self.pie = BatchedFHEPIE(
            ctx,
            self.server_table,
            self.rlk,
            leveled=leveled_default(
                ctx.params.scheme, ctx.t, ht.n_cuckoo_hash_functions
            ),
            host_table=table_bytes > (5 << 30),
        )
        self.offline_computation_us = (time.monotonic_ns() - begin) // 1000

    def run_online_phase(self) -> None:
        minus_raw = self.channel.read_tensor()
        if minus_raw.ndim == 4:  # (Q, 2, L, N): multi-query transaction
            return self._run_online_many(minus_raw)
        minus = Ciphertext(jnp.asarray(minus_raw))
        n_chunks = int(self.channel.read_tensor()[0])
        P = self.ht.each_cuckoo_table_size
        # wire value is untrusted: a non-divisor would mis-slice the table
        # against the client's chunk widths; a huge value would block on
        # reads that never arrive
        if not (1 <= n_chunks <= P and P % n_chunks == 0):
            raise ValueError(
                f"invalid stream chunk count {n_chunks} from client "
                f"(must divide the inner position count {P})"
            )
        if n_chunks == 1:
            idx = Ciphertext(jnp.asarray(self.channel.read_tensor()))
            begin = time.monotonic_ns()
            result = self.pie.run(idx, minus)
        else:
            begin = time.monotonic_ns()
            # streamed path: position-sum each chunk as it arrives (async
            # dispatch overlaps the next chunk's network read)
            w = P // n_chunks

            def chunks():
                for c in range(n_chunks):
                    yield c * w, jnp.asarray(self.channel.read_tensor())

            result = self.pie.run_streamed(chunks(), minus)
        result.data.block_until_ready()
        self.online_computation_us = (time.monotonic_ns() - begin) // 1000
        self.channel.write_tensor(
            np.array([1 if result.form == "bgv" else 0, result.scale], np.uint64)
        )
        self.channel.write_tensor(result.data)
        if self.params.export_performance:
            self.export_measurements()

    def _run_online_many(self, minus_raw) -> None:
        """Serve a (Q, ...) multi-query transaction in one batched dispatch."""
        Q = minus_raw.shape[0]
        # resource-bound the untrusted batch size (one query's working set
        # times Q must stay schedulable)
        if not (2 <= Q <= 1024):
            raise ValueError(f"multi-query batch size {Q} outside [2, 1024]")
        idx_b = jnp.asarray(self.channel.read_tensor())
        if idx_b.ndim != 6 or idx_b.shape[0] != Q:
            raise ValueError(
                f"multi-query index tensor shape {idx_b.shape} does not "
                f"match batch size {Q}"
            )
        begin = time.monotonic_ns()
        out = self.pie.run_many(idx_b, jnp.asarray(minus_raw))
        out.block_until_ready()
        self.online_computation_us = (time.monotonic_ns() - begin) // 1000
        form = self.ctx.default_form  # combine_ip keeps the native form, scale 1
        self.channel.write_tensor(np.array([1 if form == "bgv" else 0, 1], np.uint64))
        self.channel.write_tensor(out)
        if self.params.export_performance:
            self.export_measurements()
