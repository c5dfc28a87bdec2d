"""Device-mesh sharding for the PIE pipelines (DP over bin depths, TP over
RNS limbs; SP over ring slots planned for the distributed NTT)."""

from nested_hashing_psi_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    pie_shardings,
    sharded_pie_step,
)
