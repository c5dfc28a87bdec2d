"""Command-line entry points mirroring the reference's ServerMain/ClientMain
(/root/reference/src/Server/ServerMain.cpp:19-63, src/Client/ClientMain.cpp:20-63):
flag-driven dispatch to one of the protocol pairs over TCP.

Usage:
    python -m nested_hashing_psi_tpu.cli server [flags]
    python -m nested_hashing_psi_tpu.cli client [flags]

Flags match the reference CLI surface (config.build_arg_parser), so rows of
Performance-Evaluation/Parameters1.txt replay verbatim.
"""

from __future__ import annotations

import dataclasses
import os
import sys

from nested_hashing_psi_tpu.config import build_arg_parser, params_from_args
from nested_hashing_psi_tpu.protocol.runner import run_client_tcp, run_server_tcp


def main(argv=None):
    # Honor JAX_PLATFORMS even when a sitecustomize pre-registered a backend.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    # Persistent executable cache: repeated sweep rows / protocol runs skip
    # the remote compile entirely (see utils.jaxcache for why the env var
    # alone is dead under this sandbox's sitecustomize).
    from nested_hashing_psi_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in ("server", "client"):
        print("usage: cli.py {server|client} [flags]", file=sys.stderr)
        return 2
    role = argv.pop(0)
    args = build_arg_parser().parse_args(argv)
    psi, ht = params_from_args(args)
    # Framework-extension env overrides (testing small rings).
    if os.environ.get("NHPSI_RING_DIM"):
        psi = dataclasses.replace(psi, ring_dim=int(os.environ["NHPSI_RING_DIM"]))
    if os.environ.get("NHPSI_NUM_LIMBS"):
        psi = dataclasses.replace(psi, num_limbs=int(os.environ["NHPSI_NUM_LIMBS"]))
    if role == "server":
        run_server_tcp(psi, ht)
        return 0
    _, ok = run_client_tcp(psi, ht)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
