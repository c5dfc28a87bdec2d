"""Nested (hierarchical) cuckoo structure as one dense tensor.

Capability parity with the reference's HierarchicalCuckooHashTable
(/root/reference/src/Common/Hashing/HierarchicalCuckooHashTable.cpp:55-87):
outer simple-hash table(s) over hash ids [0, nSimpleHF), each outer cell an
inner blocked cuckoo table over hash ids [nSimpleHF, nSimpleHF + nCuckooHF).

TPU-first redesign: instead of a vector-of-vectors of CuckooHashTable
objects inserted bin-by-bin under OpenMP, the whole structure is built in one
batched cuckoo pass where the outer cell index is simply part of the slot key.
The result is the dense tensor

    table[n_simple_tables, simple_size, n_cuckoo_tables, max_pp, cuckoo_size, 2]

which is already the layout the batched PIE's slot packing wants (the
reference separately transposes into `vectorizedHCT`, BatchedFHEHIPPIE.cpp:37-71).
"""

from __future__ import annotations

import numpy as np

from nested_hashing_psi_tpu.config import HashTableParams
from nested_hashing_psi_tpu.hashing.cuckoo import batched_cuckoo_insert
from nested_hashing_psi_tpu.hashing.tabulation import TabulationHashing


class HierarchicalCuckooHashTable:
    def __init__(
        self,
        hasher: TabulationHashing,
        each_simple_table_size: int,
        each_cuckoo_table_size: int,
        server_stash_size: int = 0,
        n_simple_hash_functions: int = 2,
        n_cuckoo_hash_functions: int = 2,
        simple_multi_table: bool = True,
        cuckoo_multi_table: bool = True,
        max_items_per_position: int = 1,
        seed: int = 0,
    ):
        self.hasher = hasher
        self.each_simple_table_size = each_simple_table_size
        self.each_cuckoo_table_size = each_cuckoo_table_size
        self.server_stash_size = server_stash_size
        self.n_simple_hash_functions = n_simple_hash_functions
        self.n_cuckoo_hash_functions = n_cuckoo_hash_functions
        self.simple_multi_table = simple_multi_table
        self.cuckoo_multi_table = cuckoo_multi_table
        self.max_items_per_position = max_items_per_position
        self.seed = seed
        self.n_simple_tables = n_simple_hash_functions if simple_multi_table else 1
        self.n_cuckoo_tables = n_cuckoo_hash_functions if cuckoo_multi_table else 1
        self.table = np.zeros(
            (
                self.n_simple_tables,
                each_simple_table_size,
                self.n_cuckoo_tables,
                max_items_per_position,
                each_cuckoo_table_size,
                2,
            ),
            dtype=np.uint64,
        )
        self.stash = np.zeros(
            (self.n_simple_tables, each_simple_table_size, server_stash_size, 2),
            dtype=np.uint64,
        )

    @classmethod
    def from_params(
        cls, hasher: TabulationHashing, ht: HashTableParams, seed: int = 0
    ) -> "HierarchicalCuckooHashTable":
        return cls(
            hasher,
            ht.each_simple_table_size,
            ht.each_cuckoo_table_size,
            ht.server_stash_size,
            ht.n_simple_hash_functions,
            ht.n_cuckoo_hash_functions,
            ht.simple_multi_table,
            ht.cuckoo_multi_table,
            ht.max_items_per_position,
            seed=seed,
        )

    def insert_all(self, items: np.ndarray) -> None:
        """Bulk-build the nested structure from (n, 2)-uint64 items."""
        s_size = self.each_simple_table_size
        if self.simple_multi_table:
            # Each item goes into every simple table (one per simple hash fn).
            outer_pos = np.stack(
                [
                    self.hasher.hash_index(items, h, s_size)
                    for h in range(self.n_simple_hash_functions)
                ],
                axis=0,
            )  # (nSimpleHF, n)
            outer_tbl = np.repeat(
                np.arange(self.n_simple_tables), len(items)
            )  # (nSimpleHF*n,)
            bin_ids = outer_tbl * s_size + outer_pos.reshape(-1)
            all_items = np.tile(items, (self.n_simple_hash_functions, 1))
        else:
            # Combined simple table: every simple hash fn maps into table 0
            # (reference: generateMultiHashSimpleHashTable, HashUtils.cpp:71-86).
            outer_pos = np.stack(
                [
                    self.hasher.hash_index(items, h, s_size)
                    for h in range(self.n_simple_hash_functions)
                ],
                axis=0,
            )
            bin_ids = outer_pos.reshape(-1)
            all_items = np.tile(items, (self.n_simple_hash_functions, 1))

        n_bins = self.n_simple_tables * s_size
        T, stash = batched_cuckoo_insert(
            all_items,
            bin_ids,
            n_bins=n_bins,
            hasher=self.hasher,
            starting_hash_id=self.n_simple_hash_functions,
            n_hash_functions=self.n_cuckoo_hash_functions,
            table_size=self.each_cuckoo_table_size,
            max_items_per_position=self.max_items_per_position,
            stash_size=self.server_stash_size,
            multi_table=self.cuckoo_multi_table,
            seed=self.seed,
        )
        self.table = T.reshape(
            self.n_simple_tables,
            s_size,
            self.n_cuckoo_tables,
            self.max_items_per_position,
            self.each_cuckoo_table_size,
            2,
        )
        self.stash = stash.reshape(
            self.n_simple_tables, s_size, self.server_stash_size, 2
        )
