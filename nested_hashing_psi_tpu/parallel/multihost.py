"""Multi-host (multi-process) execution: DCN-spanning meshes.

The reference has no multi-node compute (its "distribution" is the 2-party
TCP split, SURVEY.md section 2.3); this module adds the scale-out plane the
TPU build needs for pod slices: `jax.distributed` initialization, global
meshes spanning processes, and helpers to build/collect globally-sharded
arrays from per-host data.

Axis placement follows the scaling-book recipe: the outermost mesh axis maps
to DCN (across hosts), inner axes ride ICI. For the batched PIE that means
bin depths (dp) across hosts -- embarrassingly parallel, one result-gather at
the end -- and limbs/ring (tp/sp) within a host.

On CPU (tests), each process exposes `--xla_force_host_platform_device_count`
virtual devices; `tests/test_multihost.py` runs 2 processes x 4 devices and
checks the sharded PIE step bit-exact against the single-process path.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator: str, num_processes: int, process_id: int
) -> None:
    """Initialize the JAX distributed runtime (idempotent).

    Must run before ANY backend-initializing JAX call (jax.devices etc.) --
    so this probes nothing and just swallows the already-initialized error.
    """
    if num_processes == 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already" in str(e).lower():
            return
        raise


def global_mesh(dp: int | None = None, tp: int = 1, axes=("dp", "tp")) -> Mesh:
    """Mesh over ALL processes' devices: dp outermost (DCN-friendly)."""
    devs = jax.devices()
    n = len(devs)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"mesh {dp}x{tp} != {n} devices")
    return Mesh(np.array(devs).reshape(dp, tp), axes)


def host_to_global(mesh: Mesh, spec: P, host_array: np.ndarray):
    """Build a globally-sharded jax.Array from an identical host copy on
    every process (each process donates only its addressable shards)."""
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(
        host_array.shape, sharding, lambda idx: host_array[idx]
    )


def global_to_host(arr) -> np.ndarray:
    """Gather a (possibly multi-host) sharded array to every host: re-shard
    fully replicated, then read the local copy."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    mesh = arr.sharding.mesh
    rep = jax.jit(
        lambda x: x, out_shardings=NamedSharding(mesh, P())
    )(arr)
    return np.asarray(rep.addressable_data(0))
