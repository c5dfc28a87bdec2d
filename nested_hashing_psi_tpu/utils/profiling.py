"""Tracing/profiling utilities.

The reference's observability is manual chrono spans + byte counters
exported to CSV (/root/reference/src/Client/PSIClient.hpp:86-117). Here:
 - Span: nestable wall-clock spans collected into a flat report,
 - device_trace: context manager around jax.profiler for TPU traces,
 - op_counters: rough roofline accounting (bytes moved / modmuls) for the
   PIE pipelines, derived from static shapes.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class Span:
    name: str
    start_ns: int
    end_ns: int | None = None

    @property
    def duration_us(self) -> int:
        assert self.end_ns is not None
        return (self.end_ns - self.start_ns) // 1000


@dataclass
class Profiler:
    spans: list[Span] = field(default_factory=list)

    @contextlib.contextmanager
    def span(self, name: str):
        s = Span(name, time.monotonic_ns())
        try:
            yield s
        finally:
            s.end_ns = time.monotonic_ns()
            self.spans.append(s)

    def report(self) -> dict[str, int]:
        return {s.name: s.duration_us for s in self.spans}


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Wrap a region in a jax.profiler trace (viewable in TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def batched_pie_op_counts(H: int, D: int, P: int, L: int, N: int) -> dict[str, float]:
    """Static roofline accounting for one batched-PIE online step."""
    ct_pt_modmul = H * D * P * 2 * L * N
    relin_ntts = D * (H - 1) * (L + L * L)          # decompose iNTT + digit NTTs
    ntt_modmul = relin_ntts * (N // 2) * (N.bit_length() - 1) / N * N
    table_bytes = H * D * P * L * N * 4
    return {
        "ct_pt_modmuls": float(ct_pt_modmul),
        "relin_limb_ntts": float(relin_ntts),
        "approx_ntt_modmuls": float(ntt_modmul),
        "table_read_bytes": float(table_bytes),
    }
