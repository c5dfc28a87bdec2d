"""ctypes loader/builder for the native host kernels (native/nhpsi_native.cpp).

Compiles on first use with g++ (cached .so); every caller has a pure-Python
fallback, so a missing toolchain degrades performance, not capability.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "nhpsi_native.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "build", "libnhpsi_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def get_lib():
    """Returns the loaded library or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                os.makedirs(os.path.dirname(_SO), exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.ntt_mod_t.restype = ctypes.c_int
            lib.ntt_mod_t.argtypes = [
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_uint64,
                ctypes.c_uint64,
                ctypes.c_int,
            ]
            lib.cuckoo_insert_seq.restype = ctypes.c_int64
            lib.cuckoo_insert_seq.argtypes = [
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int,
                ctypes.c_int64,
                ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint64),
            ]
            _lib = lib
        except (OSError, subprocess.CalledProcessError):
            _lib = None
        return _lib


def _u64ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def ntt_mod_t(data: np.ndarray, t: int, psi: int, inverse: bool) -> np.ndarray | None:
    """Batched negacyclic NTT mod t (<= 63 bits). data: (batch, n) uint64.
    Returns transformed copy, or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None or t >= 1 << 63:
        return None
    out = np.ascontiguousarray(data, dtype=np.uint64).copy()
    batch, n = out.shape
    rc = lib.ntt_mod_t(_u64ptr(out), batch, n, t, psi, 1 if inverse else 0)
    if rc != 0:
        return None
    return out


def cuckoo_insert_seq(
    items: np.ndarray,
    hash_table: np.ndarray,
    starting_hash_id: int,
    n_hf: int,
    size: int,
    max_pp: int,
    multi_table: bool,
    stash_size: int,
    seed: int,
):
    """Reference-style sequential cuckoo insertion. Returns
    (table (n_tables, max_pp, size, 2), stash (stash_size, 2), n_failures)
    or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    items = np.ascontiguousarray(items, dtype=np.uint64)
    hash_table = np.ascontiguousarray(hash_table, dtype=np.uint64)
    n_tables = n_hf if multi_table else 1
    table = np.zeros((n_tables, max_pp, size, 2), dtype=np.uint64)
    stash = np.zeros((max(stash_size, 1), 2), dtype=np.uint64)
    failures = lib.cuckoo_insert_seq(
        _u64ptr(items),
        len(items),
        _u64ptr(hash_table),
        starting_hash_id,
        n_hf,
        size,
        max_pp,
        1 if multi_table else 0,
        stash_size,
        seed,
        _u64ptr(table),
        _u64ptr(stash),
    )
    return table, stash[:stash_size], int(failures)
