"""Offline-artifact checkpointing.

The reference has no checkpoint/resume; its natural checkpoint structure is
the offline products (nested table + packed plaintexts, SURVEY.md section 5).
Here the server's expensive offline phase (2^24-item table build + batched
encode) persists to an .npz and resumes straight into the online phase.
"""

from __future__ import annotations

import numpy as np

FORMAT_VERSION = 1


def save_batched_pie(path: str, pie) -> None:
    """Persist a BatchedFHEPIE's offline products."""
    np.savez_compressed(
        path,
        version=FORMAT_VERSION,
        table_pt=np.asarray(pie.table_pt),
        mask_pt=np.asarray(pie.mask_pt),
        dims=np.array([pie.H, pie.D, pie.P, pie.batch_slots], np.int64),
    )


def load_batched_pie(path: str, ctx, rlk):
    """Rebuild a runnable BatchedFHEPIE from a checkpoint (skips table build
    and encoding entirely)."""
    import jax.numpy as jnp

    from nested_hashing_psi_tpu.pie.batched_fhe import BatchedFHEPIE

    z = np.load(path)
    assert int(z["version"]) == FORMAT_VERSION
    pie = BatchedFHEPIE.__new__(BatchedFHEPIE)
    pie.ctx = ctx
    pie.rlk = rlk
    pie.H, pie.D, pie.P, pie.batch_slots = (int(v) for v in z["dims"])
    pie.table_pt = jnp.asarray(z["table_pt"])
    pie.mask_pt = jnp.asarray(z["mask_pt"])
    pie._run = None
    return pie
