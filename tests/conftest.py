"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Benchmarks (bench.py) run on the real TPU; tests run on CPU so that
multi-chip sharding paths can be exercised without TPU hardware.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
