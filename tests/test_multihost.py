"""Multi-host (2-process) sharded PIE test: the DCN-spanning mesh path.

Spawns two JAX processes (4 virtual CPU devices each) joined through
jax.distributed; each runs the batched-PIE online step over the global
8-device (dp=4, tp=2) mesh and checks bit-exactness vs the unsharded path
(tests/multihost_worker.py). This covers BASELINE.json's N-hosts scaling
config at the correctness level; benchmarks/scaling_report.py produces the
throughput table on real hardware.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_pie():
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
    assert "MULTIHOST_OK proc=0" in outs[0]
    assert "MULTIHOST_OK proc=1" in outs[1]
