"""Simple (per-position) FHE PSI protocol.

Capability parity with the reference's SimpleFHEPSIClient/Server
(/root/reference/src/Client/FHE/SimpleFHEPSIClient.cpp,
 src/Server/FHE/SimpleFHEPSIServer.cpp): per client cuckoo position the
client sends nCuckooHF index ciphertexts (one-hot inner-hash index || -elem),
the server answers with nCuckooHF masked merged ciphertexts whose first
maxPP slots hold the per-bin randomized differences; a zero slot marks a hit.

Differences by design: all positions travel/batch as one dense tensor and
the server runs one jitted pipeline (SimpleFHEPIE) instead of per-position
PIEs on thread pools; Galois (EvalSum) keys ship as stacked tensors.
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
    plaintext_modulus_for_bit_size,
)
from nested_hashing_psi_tpu.hashing import (
    CuckooHashTable,
    HierarchicalCuckooHashTable,
    TabulationHashing,
)
from nested_hashing_psi_tpu.pie.simple_fhe import SimpleFHEClientOps, SimpleFHEPIE
from nested_hashing_psi_tpu.protocol.base import PSIClientBase, PSIServerBase
from nested_hashing_psi_tpu.protocol.channel import Channel

PROTOCOL_NAME = "SimpleFHE"


def _scheme_params(psi: PSIParams, ht: HashTableParams) -> SchemeParams:
    t = plaintext_modulus_for_bit_size(psi.bit_size)
    scheme = "bgv" if psi.bgv else "bfv"
    # no ct x ct; eval_sum models the rotation-ladder key-switch noise
    limbs = psi.num_limbs or default_num_limbs(
        t.bit_length(), 0, ht.each_cuckoo_table_size + 1, scheme,
        eval_sum=True, ring_dim=psi.ring_dim,
    )
    sp = SchemeParams(
        ring_dim=psi.ring_dim, plaintext_modulus=t, num_limbs=limbs, scheme=scheme
    )
    # HEStd_128 bound for every tabled ring dim (1024..32768)
    sp.validate_security()
    return sp


class SimpleFHEPSIClient(PSIClientBase):
    def __init__(self, data, params: PSIParams, ht: HashTableParams, channel: Channel, **kw):
        super().__init__(data, params, channel, PROTOCOL_NAME, **kw)
        self.ht = ht

    def run_setup_phase(self) -> None:
        p, ht = self.params, self.ht
        self.hasher = TabulationHashing(
            p.hash_seed, ht.n_simple_hash_functions + ht.n_cuckoo_hash_functions
        )
        self.ctx = make_context(_scheme_params(p, ht), seed=None)
        self.sk, self.pk = self.ctx.keygen()
        els = self.ctx.sum_ladder_elements()
        self.gks = self.ctx.galois_keygen(self.sk, els)
        self.client_table = CuckooHashTable(
            self.hasher,
            each_table_size=ht.each_simple_table_size,
            n_hash_functions=ht.n_simple_hash_functions,
            starting_hash_id=0,
            max_stash_size=0,
            multi_table=ht.simple_multi_table,
            max_items_per_position=1,
            seed=p.item_seed ^ 0x51E,
        )
        sp = self.ctx.params
        self.channel.write_tensor(
            np.array(
                [sp.ring_dim, sp.plaintext_modulus, sp.num_limbs,
                 1 if sp.scheme == "bgv" else 0],
                np.uint64,
            )
        )
        self.channel.write_tensor(np.array(els, np.int64))
        import jax.numpy as _jnp

        self.channel.write_tensor(_jnp.stack([self.gks[k].b_mont for k in els]))
        self.channel.write_tensor(_jnp.stack([self.gks[k].a_mont for k in els]))

    def run_offline_phase(self) -> None:
        self.client_table.insert_all(self.client_set)
        self.client_ops = SimpleFHEClientOps(
            self.ctx,
            self.client_table,
            self.ht.n_simple_hash_functions,
            self.ht.n_cuckoo_hash_functions,
            self.ht.each_cuckoo_table_size,
            self.ht.max_items_per_position,
        )
        self.idx_ct = self.client_ops.encrypt_query(self.sk)
        self.idx_ct.data.block_until_ready()

    def run_online_phase(self) -> None:
        self.channel.write_tensor(self.idx_ct.data)
        result = Ciphertext(
            jnp.asarray(self.channel.read_tensor()), self.ctx.default_form, 1
        )
        n_pies = result.data.shape[0]
        flat_data = result.data.reshape(-1, 2, self.ctx.L, self.ctx.n)
        # decrypt in bounded chunks: the iNTT + CRT transients of the whole
        # (nPies*H)-row stack would stack on top of the server's resident
        # table at sweep geometries (shared chip in loopback runs)
        chunk = max(1, (1 << 29) // (2 * self.ctx.L * self.ctx.n * 4))
        maxpp = self.ht.max_items_per_position
        if self.ctx.default_form == "bfv" and jax.default_backend() == "tpu":
            # fully on-device decrypt to the per-slot zero mask: the host
            # CRT path fetches the whole phase stack (~2.5 GB at row-0
            # geometry -- unusable through this sandbox's ~1 MB/s relay);
            # here each chunk ships only (rows, maxPP) booleans.
            from nested_hashing_psi_tpu.fhe.device_decrypt import DeviceDecryptor

            dec = DeviceDecryptor(self.ctx)
            parts = []
            for s in range(0, flat_data.shape[0], chunk):
                parts.append(
                    np.asarray(
                        dec.zero_mask(
                            flat_data[s : s + chunk], self.sk.s_mont,
                            length=maxpp,
                        )
                    )
                )
            zero = np.concatenate(parts, axis=0).reshape(
                n_pies, self.ht.n_cuckoo_hash_functions, maxpp
            )
            self.noise_bits = None
            self.intersection_calculated = (
                self.client_ops.extract_intersection_mask(zero)
            )
            return
        slot_parts, noise = [], 0.0
        for s in range(0, flat_data.shape[0], chunk):
            part = Ciphertext(
                flat_data[s : s + chunk], self.ctx.default_form, 1
            )
            sl, nz = self.ctx.decrypt(part, self.sk, length=maxpp)
            slot_parts.append(np.asarray(sl))
            noise = max(noise, nz)
        slots = np.concatenate(slot_parts, axis=0)
        self.noise_bits = noise
        slots = np.asarray(slots).reshape(
            n_pies, self.ht.n_cuckoo_hash_functions, maxpp
        )
        self.intersection_calculated = self.client_ops.extract_intersection(slots)


class SimpleFHEPSIServer(PSIServerBase):
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
        # peer-supplied parameters are untrusted: bound them before building
        # a context (fhe.params.validate_wire_scheme_params)
        from nested_hashing_psi_tpu.fhe.params import validate_wire_scheme_params

        sp = validate_wire_scheme_params(
            ring_dim, t, limbs, "bgv" if is_bgv else "bfv"
        )
        self.ctx = make_context(sp, seed=None)
        els = [int(k) for k in self.channel.read_tensor()]
        b = jnp.asarray(self.channel.read_tensor())
        a = jnp.asarray(self.channel.read_tensor())
        self.gks = {
            k: RelinKey(b_mont=b[i], a_mont=a[i]) for i, k in enumerate(els)
        }
        self.server_table = HierarchicalCuckooHashTable.from_params(
            self.hasher, ht, seed=p.item_seed ^ 0x7A12
        )

    def run_offline_phase(self) -> None:
        begin = time.monotonic_ns()
        self.server_table.insert_all(self.server_set)
        self.pie = SimpleFHEPIE(self.ctx, self.server_table, self.gks)
        self.offline_computation_us = (time.monotonic_ns() - begin) // 1000

    def run_online_phase(self) -> None:
        idx = Ciphertext(jnp.asarray(self.channel.read_tensor()))
        begin = time.monotonic_ns()
        result = self.pie.run(idx)
        result.data.block_until_ready()
        self.online_computation_us = (time.monotonic_ns() - begin) // 1000
        self.channel.write_tensor(result.data)
        if self.params.export_performance:
            self.export_measurements()
