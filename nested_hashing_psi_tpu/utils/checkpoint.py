"""Offline-artifact checkpointing.

The reference has no checkpoint/resume; its natural checkpoint structure is
the offline products (nested table + packed plaintexts, SURVEY.md section 5).
Here the server's expensive offline phase (2^24-item table build + batched
encode) persists to an .npz -- including the scheme parameters and the
relinearization key -- and a later process resumes straight into the online
phase with no out-of-band state.
"""

from __future__ import annotations

import numpy as np

# v3: table_pt carries the per-depth masks folded into hash function 0's
# plaintexts (pie.batched_fhe.combine_ip mask-folding note); v2 tables are
# unfolded and would decrypt to unmasked garbage under the v3 online step,
# so loads reject them.
FORMAT_VERSION = 3


def save_batched_pie(path: str, pie) -> None:
    """Persist a BatchedFHEPIE's offline products + scheme params + keys.

    Uncompressed on purpose: table_pt is NTT-domain residues (high-entropy,
    zlib gains ~nothing) and the flagship artifact is ~18 GB -- compressed
    save/load costs 10+ minutes of single-threaded zlib each way vs ~disk
    speed uncompressed. np.load reads both formats, so older compressed
    files stay loadable."""
    sp = pie.ctx.params
    np.savez(
        path,
        version=FORMAT_VERSION,
        table_pt=np.asarray(pie.table_pt),
        mask_pt=np.asarray(pie.mask_pt),
        # dims[5:] (appended within v3, absent in early-v3 files): the
        # resolved rescaled-pipeline bases and table residency -- a PIE saved
        # with explicit overrides (e.g. mul_limbs=0 disabling the rescale)
        # must NOT resume on the auto-derived pipeline.
        dims=np.array(
            [
                pie.H, pie.D, pie.P, pie.batch_slots, int(pie.leveled),
                -1 if pie.mul_limbs is None else pie.mul_limbs,
                -1 if pie.ship_limbs is None else pie.ship_limbs,
                int(pie.host_table),
            ],
            np.int64,
        ),
        scheme=np.array(
            [
                sp.ring_dim,
                sp.plaintext_modulus,
                sp.num_limbs,
                1 if sp.scheme == "bgv" else 0,
            ],
            np.uint64,
        ),
        rlk_b=np.asarray(pie.rlk.b_mont),
        rlk_a=np.asarray(pie.rlk.a_mont),
    )


def load_batched_pie(path: str, ctx=None, rlk=None):
    """Rebuild a runnable BatchedFHEPIE from a checkpoint (skips table build
    and encoding entirely). ctx/rlk default to the persisted scheme params
    and relinearization key, so resume needs nothing but the file."""
    import jax.numpy as jnp

    from nested_hashing_psi_tpu.pie.batched_fhe import BatchedFHEPIE

    z = np.load(path)
    version = int(z["version"])
    if version != FORMAT_VERSION:
        raise ValueError(
            f"unsupported checkpoint format version {version} "
            f"(this build reads version {FORMAT_VERSION}; v1 checkpoints "
            f"lack the embedded scheme params/relin key -- rebuild the "
            f"offline artifact with save_batched_pie)"
        )
    if ctx is None:
        from nested_hashing_psi_tpu.fhe.bfv import make_context
        from nested_hashing_psi_tpu.fhe.params import SchemeParams

        ring, t, limbs, is_bgv = (int(v) for v in z["scheme"])
        ctx = make_context(
            SchemeParams(
                ring_dim=ring,
                plaintext_modulus=t,
                num_limbs=limbs,
                scheme="bgv" if is_bgv else "bfv",
            ),
            seed=None,
        )
    if rlk is None:
        from nested_hashing_psi_tpu.fhe.bgv import RelinKey

        rlk = RelinKey(
            b_mont=jnp.asarray(z["rlk_b"]), a_mont=jnp.asarray(z["rlk_a"])
        )
    pie = BatchedFHEPIE.__new__(BatchedFHEPIE)
    pie.ctx = ctx
    pie.rlk = rlk
    dims = [int(v) for v in z["dims"]]
    pie.H, pie.D, pie.P, pie.batch_slots = dims[:4]
    pie.leveled = bool(dims[4]) if len(dims) > 4 else False
    table = z["table_pt"]
    if len(dims) > 7:
        pie.host_table = bool(dims[7])
    else:
        # beyond-HBM tables resume host-resident (streamed online path)
        pie.host_table = table.nbytes > (12 << 30)
    pie.table_pt = table if pie.host_table else jnp.asarray(table)
    pie.mask_pt = jnp.asarray(z["mask_pt"])
    pie._run = None
    pie._run_many = None
    if len(dims) > 6:
        # restore the exact saved pipeline bases (-1 encodes "resolved to
        # None"; 0 forces the disabled/flat path through _setup_mul_limbs)
        mul = 0 if dims[5] < 0 else dims[5]
        ship = None if dims[6] < 0 else dims[6]
        pie._setup_mul_limbs(mul, ship)
    else:
        pie._setup_mul_limbs(None, None)
    return pie
