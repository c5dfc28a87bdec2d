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
            lib.phase_to_mt.restype = ctypes.c_double
            lib.phase_to_mt.argtypes = [
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.POINTER(ctypes.c_uint64),
                ctypes.c_uint64,
                ctypes.c_uint64,
                ctypes.c_int,
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


def phase_to_mt(
    phase: np.ndarray, q_primes: tuple[int, ...], t: int, scheme: str
) -> tuple[np.ndarray, float] | None:
    """Exact RNS phase -> message mod t via __int128 CRT (big-t decrypt,
    reference 40/48-bit moduli). phase: (..., L, n) uint64 residues.
    Returns ((..., n) uint64 messages, noise-fraction in [0, 0.5]) or None.
    """
    lib = get_lib()
    if lib is None or t >= 1 << 63 or not hasattr(lib, "phase_to_mt"):
        return None
    L = len(q_primes)
    q = 1
    for p in q_primes:
        q *= p
    ph = np.ascontiguousarray(phase, dtype=np.uint64)
    lead = ph.shape[:-2]
    n = ph.shape[-1]
    rows = int(np.prod(lead)) if lead else 1
    qp = np.array(q_primes, dtype=np.uint64)
    inv_qhat = np.array(
        [pow(q // p, -1, p) for p in q_primes], dtype=np.uint64
    )
    if scheme == "bfv":
        int_coef = np.array([t // p for p in q_primes], dtype=np.uint64)
        frac_fp = np.array(
            [((t % p) << 64) // p for p in q_primes], dtype=np.uint64
        )
        sub_coef = 0
    else:
        int_coef = np.array([(q // p) % t for p in q_primes], dtype=np.uint64)
        frac_fp = np.array([(1 << 64) // p for p in q_primes], dtype=np.uint64)
        sub_coef = q % t
    out = np.zeros((rows, n), dtype=np.uint64)
    dist = lib.phase_to_mt(
        _u64ptr(ph.reshape(rows, L, n)),
        rows,
        L,
        n,
        _u64ptr(qp),
        _u64ptr(inv_qhat),
        _u64ptr(int_coef),
        _u64ptr(frac_fp),
        sub_coef,
        t,
        1 if scheme == "bfv" else 0,
        _u64ptr(out),
    )
    return out.reshape(*lead, n), float(dist)


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
