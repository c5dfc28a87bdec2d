"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Benchmarks (bench.py) run on the real TPU; tests run on CPU so that
multi-chip sharding paths can be exercised without TPU hardware.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"

# Cache XLA compiles across tests/runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The environment's sitecustomize registers a TPU PJRT plugin at interpreter
# startup (before this conftest), so the env var alone is too late -- force
# the platform through jax.config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# ...and the compilation-cache dir, for the same sitecustomize reason.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ["JAX_COMPILATION_CACHE_DIR"],
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
