"""Two-process socket test: the production CLI pair over localhost TCP
(the reference's real multi-process harness, scripts/runTest.sh style)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAGS = [
    "-F", "--batched", "-B", "16",
    "-S", "300", "-C", "12", "-I", "5",
    "-e", "32", "-E", "12", "-k", "2", "-K", "2", "-b", "4",
    "--port", "47113",
]


def test_cli_pair_over_tcp():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    env["NHPSI_RING_DIM"] = "128"   # small ring for test speed
    env["NHPSI_NUM_LIMBS"] = "8"
    server = subprocess.Popen(
        [sys.executable, "-m", "nested_hashing_psi_tpu.cli", "server"] + FLAGS,
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    try:
        client = subprocess.run(
            [sys.executable, "-m", "nested_hashing_psi_tpu.cli", "client"] + FLAGS,
            cwd=REPO,
            env=env,
            capture_output=True,
            text=True,
            timeout=850,
        )
        assert client.returncode == 0, client.stdout + client.stderr
        assert "Set matches!" in client.stdout
        server.wait(timeout=60)
    finally:
        if server.poll() is None:
            server.kill()
