"""Persistent XLA compilation cache wiring.

This sandbox's interpreter registers the TPU plugin from sitecustomize at
startup, which imports jax's config module BEFORE any user code runs -- so
setting JAX_COMPILATION_CACHE_DIR in os.environ inside a script body never
reaches jax, and every process silently re-paid the full remote compile
(measured: ~45-60 s per protocol phase at sweep geometries; the cache
populated only from CPU pytest runs where conftest also re-updates config).
`jax.config.update` after import is the reliable path -- measured on the
axon TPU backend: an entry is written on first compile and a second process
compiles the same program in ~0.07 s vs 0.52 s (and minutes for the big PIE
programs).

Call enable_persistent_cache() in every entry point before the first jit
(CLI mains, bench drivers, the in-process runner).
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/jax")


def enable_persistent_cache(path: str | None = None) -> str:
    """Point jax at the on-disk executable cache (idempotent). Returns the
    cache path in effect."""
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    if jax.config.jax_compilation_cache_dir != path:
        jax.config.update("jax_compilation_cache_dir", path)
    return path
